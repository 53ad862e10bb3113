"""Tools: torch checkpoint conversion, reference benchmarking."""
