"""IO, caching, and profiling utilities."""
