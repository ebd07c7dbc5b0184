"""Offline diagnosis: data checks, stats, parity."""
