"""Evaluation: segmentation metrics + flagging-quality statistics.

Exports the same 10-function surface as the reference
(rfi_toolbox/evaluation/__init__.py:8-34), plus batched device variants.
"""

from .metrics import (
    compute_dice,
    compute_f1,
    compute_iou,
    compute_precision,
    compute_recall,
    confusion_counts,
    evaluate_segmentation,
    evaluate_segmentation_batch,
)
from .instances import evaluate_instance_model, match_instances
from .statistics import (
    compute_calcquality,
    compute_ffi,
    compute_mad,
    compute_statistics,
    print_statistics_comparison,
)

__all__ = [
    "compute_iou",
    "compute_precision",
    "compute_recall",
    "compute_f1",
    "compute_dice",
    "evaluate_segmentation",
    "evaluate_segmentation_batch",
    "confusion_counts",
    "compute_mad",
    "compute_statistics",
    "compute_ffi",
    "compute_calcquality",
    "print_statistics_comparison",
    "match_instances",
    "evaluate_instance_model",
]
