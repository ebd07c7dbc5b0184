"""Device-mesh data parallelism."""
