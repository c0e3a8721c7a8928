"""Golden-value parity tests for segmentation metrics.

The numpy oracles below re-state the *documented semantics* of the
reference (SURVEY.md §2.7) independently; the framework must match them.
"""

import numpy as np
import pytest

from rfi_toolbox_tpu.evaluation import (
    compute_dice,
    compute_f1,
    compute_iou,
    compute_precision,
    compute_recall,
    evaluate_segmentation,
    evaluate_segmentation_batch,
)


# --- numpy oracles (reference semantics, written from SURVEY.md §2.7) ---
def oracle_iou(pred, true):
    pred, true = pred.astype(bool), true.astype(bool)
    union = np.logical_or(pred, true).sum()
    if union == 0:
        return 1.0
    return np.logical_and(pred, true).sum() / union


def oracle_precision(pred, true):
    pred, true = pred.astype(bool), true.astype(bool)
    tp = np.logical_and(pred, true).sum()
    fp = np.logical_and(pred, ~true).sum()
    fn = np.logical_and(~pred, true).sum()
    if tp + fp == 0:
        return 1.0 if fn == 0 else 0.0
    return tp / (tp + fp)


def oracle_recall(pred, true):
    pred, true = pred.astype(bool), true.astype(bool)
    tp = np.logical_and(pred, true).sum()
    fn = np.logical_and(~pred, true).sum()
    if tp + fn == 0:
        return 1.0
    return tp / (tp + fn)


def oracle_f1(pred, true):
    p, r = oracle_precision(pred, true), oracle_recall(pred, true)
    if p + r == 0:
        return 0.0
    return 2 * p * r / (p + r)


def oracle_dice(pred, true):
    pred, true = pred.astype(bool), true.astype(bool)
    tp = np.logical_and(pred, true).sum()
    fp = np.logical_and(pred, ~true).sum()
    fn = np.logical_and(~pred, true).sum()
    if 2 * tp + fp + fn == 0:
        return 1.0
    return 2 * tp / (2 * tp + fp + fn)


CASES = [
    ("random", lambda r: (r.random((32, 32)) > 0.5, r.random((32, 32)) > 0.5)),
    ("both_empty", lambda r: (np.zeros((16, 16), bool), np.zeros((16, 16), bool))),
    ("pred_empty", lambda r: (np.zeros((16, 16), bool), r.random((16, 16)) > 0.7)),
    ("true_empty", lambda r: (r.random((16, 16)) > 0.7, np.zeros((16, 16), bool))),
    ("identical", lambda r: ((r.random((16, 16)) > 0.5,) * 2)),
    ("all_true", lambda r: (np.ones((8, 8), bool), np.ones((8, 8), bool))),
    ("sparse", lambda r: (r.random((64, 64)) > 0.99, r.random((64, 64)) > 0.99)),
]


@pytest.mark.parametrize("name,gen", CASES, ids=[c[0] for c in CASES])
def test_metric_parity(name, gen, rng):
    pred, true = gen(rng)
    pred, true = np.asarray(pred), np.asarray(true)
    assert compute_iou(pred, true) == pytest.approx(oracle_iou(pred, true), abs=1e-6)
    assert compute_precision(pred, true) == pytest.approx(
        oracle_precision(pred, true), abs=1e-6
    )
    assert compute_recall(pred, true) == pytest.approx(
        oracle_recall(pred, true), abs=1e-6
    )
    assert compute_f1(pred, true) == pytest.approx(oracle_f1(pred, true), abs=1e-6)
    assert compute_dice(pred, true) == pytest.approx(oracle_dice(pred, true), abs=1e-6)


def test_evaluate_segmentation_dict(rng):
    pred = rng.random((32, 32)) > 0.5
    true = rng.random((32, 32)) > 0.5
    out = evaluate_segmentation(pred, true)
    assert set(out) == {"iou", "precision", "recall", "f1", "dice"}
    assert out["iou"] == pytest.approx(oracle_iou(pred, true), abs=1e-6)
    assert out["dice"] == pytest.approx(oracle_dice(pred, true), abs=1e-6)
    assert all(isinstance(v, float) for v in out.values())


def test_accepts_int_and_float_masks(rng):
    pred = (rng.random((8, 8)) > 0.5).astype(np.uint8)
    true = (rng.random((8, 8)) > 0.5).astype(np.float32)
    out = evaluate_segmentation(pred, true)
    assert 0.0 <= out["iou"] <= 1.0


def test_batch_metrics_match_per_sample(rng):
    pred = rng.random((5, 16, 16)) > 0.6
    true = rng.random((5, 16, 16)) > 0.6
    # Make sample 2 an empty/empty edge case.
    pred[2] = False
    true[2] = False
    batch = evaluate_segmentation_batch(pred, true)
    for i in range(5):
        single = evaluate_segmentation(pred[i], true[i])
        for k in single:
            assert float(batch[k][i]) == pytest.approx(single[k], abs=1e-6), (k, i)
