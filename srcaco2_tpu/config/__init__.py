"""Config system: defaults -> per-net -> CLI overlay."""
