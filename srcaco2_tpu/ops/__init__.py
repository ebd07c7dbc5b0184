"""Device ops: resize, metrics, patches, PAM, pallas kernels."""
