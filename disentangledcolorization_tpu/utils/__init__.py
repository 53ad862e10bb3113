"""Color science, configuration, and host-side I/O utilities (L0/L5)."""

from . import cielab, color  # noqa: F401
