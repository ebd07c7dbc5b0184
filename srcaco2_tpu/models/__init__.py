"""The 18-network SISR zoo (flax.linen)."""
