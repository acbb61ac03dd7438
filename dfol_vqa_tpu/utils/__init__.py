"""Profiling and miscellaneous utilities."""
