"""Observability + persistence utilities.

The reference has neither (SURVEY.md §5: ad-hoc CUDA-event timing in two
test files, no checkpointing); these are first-class here.
"""

from .checkpoint import restore_checkpoint, save_checkpoint
from .profiling import measure, roofline, trace

__all__ = [
    "measure",
    "roofline",
    "trace",
    "save_checkpoint",
    "restore_checkpoint",
]
