"""Logging, tracking, profiling, cluster, RNG utilities."""
