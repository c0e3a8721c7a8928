"""Segmentation metrics for RFI detection evaluation — TPU-native.

Standard binary segmentation metrics comparing predicted masks vs ground
truth. The core is a single jitted confusion-matrix reduction
(:func:`confusion_counts`); each metric is derived from those counts so
that one device pass serves all five metrics (the reference recomputes
logical_and/sum per metric, rfi_toolbox/evaluation/metrics.py:25-172).

Edge-case semantics match the reference exactly:
- IoU: union == 0 -> 1.0                      (metrics.py:42-43)
- precision: no predictions -> 1.0 if no GT RFI else 0.0 (metrics.py:70-77)
- recall: no GT RFI -> 1.0                    (metrics.py:101-102)
- f1: P + R == 0 -> 0.0                       (metrics.py:123-124)
- dice: 2TP+FP+FN == 0 -> 1.0                 (metrics.py:149-150)

Inputs may be numpy arrays, JAX arrays, or torch tensors (converted via
``__array__`` / ``.detach().cpu().numpy()``); any dtype is cast to bool.
Batched variants (`*_batch`) compute per-sample metrics for (N, ...) mask
stacks in one device call — this is the TPU-friendly entry point for
eval loops.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "confusion_counts",
    "compute_iou",
    "compute_precision",
    "compute_recall",
    "compute_f1",
    "compute_dice",
    "evaluate_segmentation",
    "evaluate_segmentation_batch",
]


def _to_bool_array(arr):
    """Convert torch tensor / numpy / jax array to a bool jnp array."""
    if hasattr(arr, "detach"):  # torch tensor, without importing torch
        arr = arr.detach().cpu().numpy()
    if isinstance(arr, (list, tuple)):
        arr = np.asarray(arr)
    return jnp.asarray(arr).astype(bool)


@jax.jit
def confusion_counts(pred, true):
    """TP/FP/FN/TN counts in one fused device reduction.

    Returns float32 counts (sums fit comfortably in f32 for realistic
    mask sizes; f64 is not enabled on TPU by default).
    """
    pred = pred.astype(bool)
    true = true.astype(bool)
    tp = jnp.sum(pred & true)
    fp = jnp.sum(pred & ~true)
    fn = jnp.sum(~pred & true)
    tn = pred.size - tp - fp - fn
    return (
        tp.astype(jnp.float32),
        fp.astype(jnp.float32),
        fn.astype(jnp.float32),
        tn.astype(jnp.float32),
    )


def _iou_from_counts(tp, fp, fn):
    union = tp + fp + fn
    return jnp.where(union == 0, 1.0, tp / jnp.maximum(union, 1.0))


def _precision_from_counts(tp, fp, fn):
    no_pred = (tp + fp) == 0
    abstain = jnp.where(fn == 0, 1.0, 0.0)
    return jnp.where(no_pred, abstain, tp / jnp.maximum(tp + fp, 1.0))


def _recall_from_counts(tp, fn):
    return jnp.where(tp + fn == 0, 1.0, tp / jnp.maximum(tp + fn, 1.0))


def _f1_from_counts(tp, fp, fn):
    p = _precision_from_counts(tp, fp, fn)
    r = _recall_from_counts(tp, fn)
    return jnp.where(p + r == 0, 0.0, 2.0 * p * r / jnp.maximum(p + r, 1e-30))


def _dice_from_counts(tp, fp, fn):
    denom = 2.0 * tp + fp + fn
    return jnp.where(denom == 0, 1.0, 2.0 * tp / jnp.maximum(denom, 1.0))


def compute_iou(pred, true):
    """Intersection over Union (Jaccard). union==0 -> 1.0."""
    tp, fp, fn, _ = confusion_counts(_to_bool_array(pred), _to_bool_array(true))
    return float(_iou_from_counts(tp, fp, fn))


def compute_precision(pred, true):
    """Precision = TP / (TP + FP).

    No predictions: 1.0 if ground truth is also empty (correct
    abstention), else 0.0 (failure to detect).
    """
    tp, fp, fn, _ = confusion_counts(_to_bool_array(pred), _to_bool_array(true))
    return float(_precision_from_counts(tp, fp, fn))


def compute_recall(pred, true):
    """Recall = TP / (TP + FN). No GT RFI -> 1.0."""
    tp, _, fn, _ = confusion_counts(_to_bool_array(pred), _to_bool_array(true))
    return float(_recall_from_counts(tp, fn))


def compute_f1(pred, true):
    """F1 = 2PR/(P+R); P+R==0 -> 0.0."""
    tp, fp, fn, _ = confusion_counts(_to_bool_array(pred), _to_bool_array(true))
    return float(_f1_from_counts(tp, fp, fn))


def compute_dice(pred, true):
    """Dice = 2TP/(2TP+FP+FN); empty/empty -> 1.0."""
    tp, fp, fn, _ = confusion_counts(_to_bool_array(pred), _to_bool_array(true))
    return float(_dice_from_counts(tp, fp, fn))


@jax.jit
def _all_metrics_device(pred, true):
    tp, fp, fn, _ = confusion_counts(pred, true)
    return {
        "iou": _iou_from_counts(tp, fp, fn),
        "precision": _precision_from_counts(tp, fp, fn),
        "recall": _recall_from_counts(tp, fn),
        "f1": _f1_from_counts(tp, fp, fn),
        "dice": _dice_from_counts(tp, fp, fn),
    }


def evaluate_segmentation(pred, true):
    """All five metrics in one device pass.

    Returns:
        dict with keys: 'iou', 'precision', 'recall', 'f1', 'dice'
        (python floats, same contract as the reference
        rfi_toolbox/evaluation/metrics.py:155-172).
    """
    out = _all_metrics_device(_to_bool_array(pred), _to_bool_array(true))
    return {k: float(v) for k, v in out.items()}


@partial(jax.jit, static_argnames=())
def _batch_metrics_device(pred, true):
    n = pred.shape[0]
    pred2 = pred.reshape(n, -1)
    true2 = true.reshape(n, -1)
    tp = jnp.sum(pred2 & true2, axis=1).astype(jnp.float32)
    fp = jnp.sum(pred2 & ~true2, axis=1).astype(jnp.float32)
    fn = jnp.sum(~pred2 & true2, axis=1).astype(jnp.float32)
    return {
        "iou": _iou_from_counts(tp, fp, fn),
        "precision": _precision_from_counts(tp, fp, fn),
        "recall": _recall_from_counts(tp, fn),
        "f1": _f1_from_counts(tp, fp, fn),
        "dice": _dice_from_counts(tp, fp, fn),
    }


def evaluate_segmentation_batch(pred, true):
    """Per-sample metrics for (N, ...) stacks, one device call.

    Returns a dict of float32 arrays of shape (N,). Use
    ``jax.tree.map(lambda a: a.mean(), out)`` for batch means — this is
    the TPU replacement for the reference's per-batch python loop
    (scripts/evaluate_model.py:41-56).
    """
    return _batch_metrics_device(_to_bool_array(pred), _to_bool_array(true))
