"""Column-level functions: the engine's scalar/vector function surface."""
