"""CLI entry points (L6): inference and training drivers with reference-compatible flags."""
