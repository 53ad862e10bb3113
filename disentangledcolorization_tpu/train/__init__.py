"""Training harness (L4): losses, optimizers, train state, jitted steps, checkpointing."""

from . import losses, optim, state, steps  # noqa: F401
