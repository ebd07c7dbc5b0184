"""Batch inference over reconstruct-task experiment trees.

Reference analog: dlib/inference/inference_reconstruct.py — same walk /
re-evaluate / visualize flow as the SR variant. The shared machinery in
inference.super_res is task-aware (the reconstruct mapping happens in
data/dataset.load_dataset), so this module re-exports it under the
reconstruct entry points.
"""
from srcaco2_tpu.inference.super_res import (comparison_figure, load_exp,
                                             noise_study, reevaluate)

__all__ = ['load_exp', 'reevaluate', 'noise_study', 'comparison_figure']
