"""Trainer engine: steps, schedules, evaluator, checkpoints."""
