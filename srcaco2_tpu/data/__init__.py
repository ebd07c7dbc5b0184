"""Data layer: folds, staging, device pipeline, builders."""
