"""Direct parity tests against the ACTUAL reference implementation.

Runs only where the reference checkout is mounted (skipped in CI).
These are the strongest parity guarantees: identical inputs through
both stacks, labels bit-matched (BASELINE config 2) and metrics within
1e-3.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "rfi_toolbox")),
    reason="reference checkout not available",
)

if os.path.isdir(REFERENCE):
    sys.path.insert(0, REFERENCE)
    os.environ["CI"] = "1"  # reference: force sequential (no Pool)


def _complex_waterfall(rng, c=256, t=256):
    base = rng.normal(1.0, 0.1, (1, 2, c, t))
    mask = np.zeros((1, 2, c, t), bool)
    base[:, :, 40:46, :] += 2e6
    mask[:, :, 40:46, :] = True
    base[:, :, :, 100:110] += 2e6
    mask[:, :, :, 100:110] = True
    phase = rng.uniform(0, 2 * np.pi, base.shape)
    return (base * np.exp(1j * phase)).astype(np.complex64), mask


def test_metrics_match_reference(rng):
    from rfi_toolbox.evaluation import evaluate_segmentation as ref_eval

    from rfi_toolbox_tpu.evaluation import evaluate_segmentation

    pred = rng.random((128, 128)) > 0.6
    true = rng.random((128, 128)) > 0.6
    ours = evaluate_segmentation(pred, true)
    ref = ref_eval(pred, true)
    for k in ref:
        assert ours[k] == pytest.approx(ref[k], abs=1e-6), k


def test_statistics_match_reference(rng):
    from rfi_toolbox.evaluation import compute_ffi as ref_ffi
    from rfi_toolbox.evaluation import compute_statistics as ref_stats

    from rfi_toolbox_tpu.evaluation import compute_ffi, compute_statistics

    x = rng.normal(1.0, 0.1, (256, 256)).astype(np.float32)
    x[50:60] += 100.0
    flags = np.zeros((256, 256), bool)
    flags[50:60] = True

    ours, ref = compute_statistics(x, flags), ref_stats(x, flags)
    for k in ("mean", "median", "std", "mad"):
        assert ours[k] == pytest.approx(ref[k], rel=1e-3), k
    assert ours["count"] == ref["count"]

    ours_ffi, ref_ffi_v = compute_ffi(x, flags), ref_ffi(x, flags)
    for k in ref_ffi_v:
        assert ours_ffi[k] == pytest.approx(ref_ffi_v[k], abs=1e-3), k


def _assert_calcquality_matches(ours, ref):
    for k in ("calcquality", "sensitivity", "mean_shift", "std_shift",
              "overflagging_penalty", "flagged_pct"):
        if np.isinf(ref[k]):
            assert np.isinf(ours[k]), k
        else:
            assert ours[k] == pytest.approx(ref[k], abs=1e-3), k
    for k, v in ref["components"].items():
        assert ours["components"][k] == pytest.approx(v, rel=1e-3), k


def test_calcquality_matches_reference(rng):
    """Direct parity vs reference statistics.py:100-193: non-degenerate
    (complex data, partial flags), explicit reference_data, and both
    degenerate branches (all-flagged, zero-variance reference)."""
    from rfi_toolbox.evaluation import compute_calcquality as ref_cq

    from rfi_toolbox_tpu.evaluation import compute_calcquality

    base = rng.normal(1.0, 0.1, (128, 128))
    base[20:30] += 50.0
    data = (base * np.exp(1j * rng.uniform(0, 2 * np.pi, base.shape))).astype(
        np.complex64
    )
    flags = np.zeros((128, 128), bool)
    flags[20:30] = True
    _assert_calcquality_matches(
        compute_calcquality(data, flags), ref_cq(data, flags)
    )

    # overflagging branch (>70% flagged) + explicit reference_data
    heavy = rng.random((128, 128)) < 0.8
    refdata = rng.normal(1.0, 0.1, (128, 128)).astype(np.float32)
    _assert_calcquality_matches(
        compute_calcquality(data, heavy, reference_data=refdata),
        ref_cq(data, heavy, reference_data=refdata),
    )

    # degenerate: everything flagged -> inf score
    all_flags = np.ones((128, 128), bool)
    _assert_calcquality_matches(
        compute_calcquality(np.abs(data), all_flags),
        ref_cq(np.abs(data), all_flags),
    )

    # degenerate: zero-variance reference (rstd < 1e-10) -> inf score
    const = np.full((64, 64), 3.0, np.float32)
    some = np.zeros((64, 64), bool)
    some[:4] = True
    _assert_calcquality_matches(
        compute_calcquality(const, some), ref_cq(const, some)
    )


def test_preprocessor_labels_bit_match_reference(rng):
    """BASELINE config 2: labels bit-matched to the reference on
    identical inputs (both stacks share numpy's global RNG for the
    shuffle when our seed is None)."""
    from rfi_toolbox.preprocessing import Preprocessor as RefPreprocessor

    from rfi_toolbox_tpu.preprocess import Preprocessor

    vis, mask = _complex_waterfall(rng)

    np.random.seed(1234)
    ref_ds = RefPreprocessor(vis.copy(), flags=mask.copy()).create_dataset(
        patch_size=128, use_custom_flags=True, num_workers=0,
        augmentation_rotations=4,
    )
    np.random.seed(1234)
    ours = Preprocessor(vis, flags=mask).create_dataset(
        patch_size=128, use_custom_flags=True, augmentation_rotations=4,
        seed=None, use_pallas=False,
    )

    ref_labels = np.asarray(ref_ds.labels)
    got_labels = np.asarray(ours.labels)
    np.testing.assert_array_equal(got_labels, ref_labels)

    ref_images = np.asarray(ref_ds.images)
    got_images = np.asarray(ours.images)
    assert got_images.shape == ref_images.shape
    np.testing.assert_allclose(got_images, ref_images, atol=2e-4)


def test_preprocessor_mad_flags_match_reference(rng):
    from rfi_toolbox.preprocessing.preprocessor import (
        _compute_mad_flag_single_patch,
    )

    from rfi_toolbox_tpu.preprocess import pipeline as P

    patches = rng.normal(1.0, 0.1, (4, 128, 128)).astype(np.float32)
    patches[0, 5:8] = 60.0
    patches[2, :, 40] = -30.0
    ours = np.asarray(P.mad_flag_patches(patches, 5.0))
    for i in range(4):
        ref = _compute_mad_flag_single_patch(patches[i], 5.0)
        np.testing.assert_array_equal(ours[i], ref, err_msg=f"patch {i}")


def test_real_data_stretch_path_matches_reference(rng):
    from rfi_toolbox.preprocessing import Preprocessor as RefPreprocessor

    from rfi_toolbox_tpu.preprocess import Preprocessor

    data = rng.uniform(1.0, 100.0, (1, 1, 256, 256)).astype(np.float32)

    np.random.seed(7)
    ref_ds = RefPreprocessor(data.copy()).create_dataset(
        patch_size=128, stretch="SQRT", use_custom_flags=False,
        normalize_before_stretch=True, num_workers=0,
        augmentation_rotations=4,
    )
    np.random.seed(7)
    ours = Preprocessor(data).create_dataset(
        patch_size=128, stretch="SQRT", use_custom_flags=False,
        normalize_before_stretch=True, augmentation_rotations=4,
        seed=None, use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(ours.labels),
                                  np.asarray(ref_ds.labels))
    np.testing.assert_allclose(np.asarray(ours.images),
                               np.asarray(ref_ds.images), atol=2e-4)


def test_torch_pt_dataset_interop(tmp_path, rng):
    """Our loader reads reference-written .pt batch files."""
    import torch

    from rfi_toolbox_tpu.data import ArrayDataset

    images = torch.from_numpy(rng.random((5, 16, 16, 3)).astype(np.float32))
    labels = torch.from_numpy(
        (rng.random((5, 16, 16)) > 0.5).astype(np.uint8)
    )
    torch.save({"images": images, "labels": labels, "metadata": {"a": 1}},
               tmp_path / "batch_000.pt")
    ds = ArrayDataset.load_from_disk(tmp_path / "batch_000.pt")
    np.testing.assert_array_equal(ds.images, images.numpy())
    assert ds.metadata["a"] == 1


def test_nonsquare_rotation_patchify_matches_reference(rng):
    """Non-square waterfalls with 4-way rotation exercise the
    group-interleaving path (transposed variants have swapped dims);
    patch order and labels must still match the reference exactly."""
    from rfi_toolbox.preprocessing import Preprocessor as RefPreprocessor

    from rfi_toolbox_tpu.preprocess import Preprocessor

    c, t = 256, 384
    base = rng.normal(1.0, 0.1, (1, 1, c, t))
    mask = np.zeros((1, 1, c, t), bool)
    base[:, :, 30:34, :] += 2e6
    mask[:, :, 30:34, :] = True
    vis = (base * np.exp(1j * rng.uniform(0, 2 * np.pi, base.shape))).astype(
        np.complex64
    )

    np.random.seed(77)
    ref_ds = RefPreprocessor(vis.copy(), flags=mask.copy()).create_dataset(
        patch_size=128, use_custom_flags=True, num_workers=0,
        augmentation_rotations=4,
    )
    np.random.seed(77)
    ours = Preprocessor(vis, flags=mask).create_dataset(
        patch_size=128, use_custom_flags=True, augmentation_rotations=4,
        seed=None, use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(ours.labels),
                                  np.asarray(ref_ds.labels))
    np.testing.assert_allclose(np.asarray(ours.images),
                               np.asarray(ref_ds.images), atol=2e-4)


def test_inference_mode_matches_reference(rng):
    """inference_mode (the flagging path's configuration): no blank
    removal, no shuffle, dummy zero labels — patch ORDER must be
    deterministic and identical to the reference's."""
    from rfi_toolbox.preprocessing import Preprocessor as RefPreprocessor

    from rfi_toolbox_tpu.preprocess import Preprocessor

    vis, _ = _complex_waterfall(rng)
    np.random.seed(5)
    ref_ds = RefPreprocessor(vis.copy()).create_dataset(
        patch_size=128, use_custom_flags=False, inference_mode=True,
        num_workers=0, augmentation_rotations=1,
    )
    np.random.seed(5)
    ours = Preprocessor(vis).create_dataset(
        patch_size=128, use_custom_flags=False, inference_mode=True,
        augmentation_rotations=1, seed=None, use_pallas=False,
    )
    assert np.asarray(ours.labels).sum() == 0
    np.testing.assert_array_equal(np.asarray(ours.labels),
                                  np.asarray(ref_ds.labels))
    np.testing.assert_allclose(np.asarray(ours.images),
                               np.asarray(ref_ds.images), atol=2e-4)


def test_log10_stretch_path_matches_reference(rng):
    from rfi_toolbox.preprocessing import Preprocessor as RefPreprocessor

    from rfi_toolbox_tpu.preprocess import Preprocessor

    data = rng.uniform(1.0, 100.0, (1, 1, 256, 256)).astype(np.float32)
    np.random.seed(11)
    ref_ds = RefPreprocessor(data.copy()).create_dataset(
        patch_size=128, stretch="LOG10", use_custom_flags=False,
        normalize_before_stretch=False, normalize_after_stretch=True,
        num_workers=0, augmentation_rotations=2,
    )
    np.random.seed(11)
    ours = Preprocessor(data).create_dataset(
        patch_size=128, stretch="LOG10", use_custom_flags=False,
        normalize_before_stretch=False, normalize_after_stretch=True,
        augmentation_rotations=2, seed=None, use_pallas=False,
    )
    np.testing.assert_array_equal(np.asarray(ours.labels),
                                  np.asarray(ref_ds.labels))
    np.testing.assert_allclose(np.asarray(ours.images),
                               np.asarray(ref_ds.images), atol=2e-4)
