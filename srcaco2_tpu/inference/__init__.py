"""Batch inference, noise studies, figures, serving."""
