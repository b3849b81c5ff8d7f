"""DataFrame-level operators (each a pure DataFrame -> DataFrame function)."""
