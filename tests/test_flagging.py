"""Tests for the end-to-end MS flagging pipeline (config 5)."""

import numpy as np
import pytest

from rfi_toolbox_tpu.evaluation import evaluate_segmentation
from rfi_toolbox_tpu.io import (
    MSLoader,
    flag_measurement_set,
    flag_waterfalls,
    inject_synthetic_data,
    make_fake_ms,
)
from rfi_toolbox_tpu.preprocess import pipeline as P


def _rfi_ms(rng, nchan=128, ntime=128, n_ant=3):
    """FakeMS with an injected RFI stripe and known truth mask."""
    ms = make_fake_ms(num_antennas=n_ant, channels_per_spw=(nchan,),
                      num_times=ntime, seed=None)  # zero data
    n_bl = n_ant * (n_ant - 1) // 2
    base = rng.normal(1.0, 0.1, (n_bl, 4, nchan, ntime))
    truth = np.zeros((n_bl, 4, nchan, ntime), bool)
    base[:, :, 40:44, :] += 3e3
    truth[:, :, 40:44, :] = True
    base[:, :, :, 90:95] += 3e3
    truth[:, :, :, 90:95] = True
    vis = base * np.exp(1j * rng.uniform(0, 2 * np.pi, base.shape))
    out = inject_synthetic_data(ms, vis.astype(np.complex128))
    return out, truth


def test_unpatchify_roundtrip(rng):
    wf = rng.random((3, 200, 300)).astype(np.float32)
    patches = P.patchify_batch(wf, 128)
    back = np.asarray(P.unpatchify_batch(patches, 3, 200, 300))
    np.testing.assert_array_equal(back, wf)


def test_flag_waterfalls_mad(rng):
    base = rng.normal(1.0, 0.1, (2, 256, 256))
    truth = np.zeros((2, 256, 256), bool)
    base[:, 100:104, :] += 1e4
    truth[:, 100:104, :] = True
    vis = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))).astype(
        np.complex64
    )
    flags = np.asarray(flag_waterfalls(vis, method="mad", sigma=5.0))
    m = evaluate_segmentation(flags, truth)
    assert m["recall"] > 0.99
    assert m["precision"] > 0.5


def test_flag_waterfalls_model_predictor(rng):
    vis = (rng.normal(1.0, 0.1, (1, 256, 256))).astype(np.complex64)

    def fake_predictor(images):
        # flag where the log_amp channel is above its mean
        la = np.asarray(images)[..., 1]
        return la > la.mean()

    flags = np.asarray(
        flag_waterfalls(vis, method="model", predictor=fake_predictor)
    )
    assert flags.shape == (1, 256, 256)


def _fake_8ch_predictor(images):
    """Robust-scaled RFI pixels are huge outliers in every channel."""
    return np.abs(np.asarray(images)).max(-1) > 10.0


def test_coherent_images_channel_order():
    """_coherent_images must emit the training convention: pol0.re,
    pol0.im, pol1.re, pol1.im, ... (pretrained/README.md), with one
    scalar median/IQR per patch."""
    from rfi_toolbox_tpu.io.flagging import _coherent_images

    p = 16
    vis = np.zeros((1, 4, p, p), np.complex64)
    for k in range(4):
        vis[0, k] = (k + 1) - 1j * (k + 1)
    imgs = np.asarray(_coherent_images(vis, p))
    assert imgs.shape == (1, p, p, 8)
    means = imgs[0].mean(axis=(0, 1))
    want = np.array([1, -1, 2, -2, 3, -3, 4, -4], float)
    # scalar scaling preserves relative channel values exactly
    np.testing.assert_allclose(means / np.abs(means).max(),
                               want / np.abs(want).max(), rtol=1e-5)


def test_coherent_images_robust_scale_ignores_padding(rng):
    """Edge patches on non-patch-multiple waterfalls contain patchify
    zero-padding; the per-patch median/IQR must be computed over the
    VALID region only (with 50% padding, q25 of the polluted
    distribution pins toward 0 and the patch comes out over-spread)."""
    from rfi_toolbox_tpu.io.flagging import _coherent_images

    c, t, p = 96, 64, 64  # rows pad 96 -> 128: patch 1 is 50% padding
    base = rng.normal(10.0, 1.0, (1, 4, c, t))
    vis = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))
           ).astype(np.complex64)
    out = np.asarray(_coherent_images(vis, p))
    assert out.shape == (2, p, p, 8)
    for patch, valid_rows in ((0, p), (1, c - p)):
        v = out[patch, :valid_rows]
        iqr = np.percentile(v, 75) - np.percentile(v, 25)
        # each patch is scaled by its own valid-region IQR -> ~1
        assert abs(iqr - 1.0) < 0.05, (patch, iqr)
        assert abs(np.median(v)) < 0.05, (patch, np.median(v))


def test_flag_waterfalls_coherent(rng):
    base = rng.normal(1.0, 0.1, (2, 4, 128, 128))
    truth = np.zeros((2, 128, 128), bool)
    base[:, :, 40:44, :] += 3e3
    truth[:, 40:44, :] = True
    vis = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))).astype(
        np.complex64
    )
    from rfi_toolbox_tpu.io import flag_waterfalls_coherent

    flags = np.asarray(
        flag_waterfalls_coherent(vis, _fake_8ch_predictor, patch_size=128)
    )
    assert flags.shape == (2, 128, 128)
    m = evaluate_segmentation(flags, truth)
    assert m["recall"] > 0.99 and m["precision"] > 0.9

    with pytest.raises(ValueError, match="4-pol"):
        flag_waterfalls_coherent(vis[:, :3], _fake_8ch_predictor)


def test_flag_waterfalls_coherent_probability_predictor(rng):
    """A predictor returning sigmoid probabilities (not bools) must be
    thresholded, not binarized at >0 — background probs are small but
    nonzero, and >0 would flag the entire MS."""
    base = rng.normal(1.0, 0.1, (1, 4, 128, 128))
    truth = np.zeros((1, 128, 128), bool)
    base[:, :, 40:44, :] += 3e3
    truth[:, 40:44, :] = True
    vis = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))).astype(
        np.complex64
    )
    from rfi_toolbox_tpu.io import flag_waterfalls_coherent

    def prob_predictor(images):
        z = np.abs(np.asarray(images)).max(-1) - 10.0
        return 1.0 / (1.0 + np.exp(-z))  # background ~1e-4, never 0

    flags = np.asarray(
        flag_waterfalls_coherent(vis, prob_predictor, patch_size=128)
    )
    assert flags.mean() < 0.5  # >0-binarization would flag ~100%
    m = evaluate_segmentation(flags, truth)
    assert m["recall"] > 0.99 and m["precision"] > 0.9


def test_flag_measurement_set_model8(rng):
    """The coherent 8-channel model path flags the whole MS: one mask
    per time-frequency cell, identical across the 4 pols, and the bulk
    and streaming modes agree."""
    ms1, truth = _rfi_ms(rng, nchan=64, ntime=64)
    ms2 = ms1.copy()
    r = flag_measurement_set(ms1, method="model8",
                             predictor=_fake_8ch_predictor, patch_size=64)
    assert r["baselines"] == 3
    loader = MSLoader(ms1)
    loader.load()
    flags = loader.load_flags()
    loader.close()
    np.testing.assert_array_equal(flags[:, 0], flags[:, 1])  # shared mask
    m = evaluate_segmentation(flags, truth)
    assert m["recall"] > 0.95

    flag_measurement_set(ms2, method="model8",
                         predictor=_fake_8ch_predictor, patch_size=64,
                         streaming=True)
    l2 = MSLoader(ms2)
    l2.load()
    np.testing.assert_array_equal(flags, l2.load_flags())
    l2.close()


def test_flag_waterfalls_bad_method(rng):
    with pytest.raises(ValueError, match="method"):
        flag_waterfalls(np.zeros((1, 8, 8), np.complex64), method="nope")


def test_flag_measurement_set_roundtrip(rng):
    ms, truth = _rfi_ms(rng)
    result = flag_measurement_set(ms, method="mad", sigma=5.0, patch_size=128)
    assert result["baselines"] == 3
    assert 0.0 < result["flagged_fraction"] < 0.5

    loader = MSLoader(ms)
    loader.load()
    flags = loader.load_flags()
    m = evaluate_segmentation(flags, truth)
    assert m["recall"] > 0.95  # the injected stripes are caught


def test_flag_measurement_set_merge_existing(rng):
    ms, truth = _rfi_ms(rng)
    # pre-set one flag bit that MAD would never set
    loader = MSLoader(ms)
    pre = np.zeros((4, 128, 128), bool)
    pre[0, 0, 0] = True
    loader.save_baseline_flags(0, 1, pre)

    flag_measurement_set(ms, method="mad", sigma=5.0, merge_existing=True)
    back = loader.load_baseline_flags(0, 1)
    assert back[0, 0, 0]  # preserved by the merge

    flag_measurement_set(ms, method="mad", sigma=5.0, merge_existing=False)
    back = loader.load_baseline_flags(0, 1)
    assert not back[0, 0, 0]  # overwritten without merge


def test_flag_measurement_set_reports_failures(rng, monkeypatch):
    ms, _ = _rfi_ms(rng, nchan=32, ntime=32)
    from rfi_toolbox_tpu.io import ms_loader as ml

    orig = ml.MSLoader.load_baseline

    def flaky(self, ant1, ant2, **kw):
        if (ant1, ant2) == (0, 2):
            raise IOError("disk on fire")
        return orig(self, ant1, ant2, **kw)

    monkeypatch.setattr(ml.MSLoader, "load_baseline", flaky)
    result = flag_measurement_set(ms, method="mad", sigma=5.0, patch_size=32,
                                  streaming=True)
    assert result["baselines"] == 2
    assert result["failed"] == [
        {"baseline": (0, 2), "error": "disk on fire"}
    ]


def test_flag_measurement_set_streaming_matches_bulk(rng):
    """The out-of-core per-baseline path and the default bulk path must
    write identical FLAG columns."""
    ms1, _ = _rfi_ms(rng, nchan=64, ntime=64)
    ms2 = ms1.copy()

    r_bulk = flag_measurement_set(ms1, method="mad", sigma=5.0, patch_size=64)
    r_stream = flag_measurement_set(ms2, method="mad", sigma=5.0,
                                    patch_size=64, streaming=True)
    assert r_bulk["baselines"] == r_stream["baselines"] == 3

    for ms in (ms1, ms2):
        loader = MSLoader(ms)
        loader.load()
        flags = loader.load_flags()
        loader.close()
        if ms is ms1:
            bulk_flags = flags
    np.testing.assert_array_equal(bulk_flags, flags)


def test_flag_measurement_set_streaming_honors_mesh(rng):
    """streaming=True must forward the mesh to the per-baseline device
    calls (it used to be silently dropped) and still match the
    unsharded streaming result exactly."""
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 (virtual) devices")
    from rfi_toolbox_tpu.parallel import make_mesh

    ms1, _ = _rfi_ms(rng, nchan=64, ntime=64)
    ms2 = ms1.copy()
    mesh = make_mesh(shape=(4,), axis_names=("data",),
                     devices=jax.devices()[:4])
    flag_measurement_set(ms1, method="mad", sigma=5.0, patch_size=64,
                         streaming=True)
    flag_measurement_set(ms2, method="mad", sigma=5.0, patch_size=64,
                         streaming=True, mesh=mesh)
    l1, l2 = MSLoader(ms1), MSLoader(ms2)
    l1.load(); l2.load()
    np.testing.assert_array_equal(l1.load_flags(), l2.load_flags())


def test_flag_measurement_set_sharded_mesh(rng):
    """One observation's baselines x pols planes spread over the 8-chip
    virtual mesh; flags must equal the single-device result exactly."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    from rfi_toolbox_tpu.parallel import make_mesh

    ms1, _ = _rfi_ms(rng, nchan=64, ntime=64, n_ant=3)  # 3 bl x 4 pol = 12
    ms2 = ms1.copy()
    mesh = make_mesh(shape=(4,), axis_names=("data",),
                     devices=jax.devices()[:4])

    flag_measurement_set(ms1, method="mad", sigma=5.0, patch_size=64)
    flag_measurement_set(ms2, method="mad", sigma=5.0, patch_size=64,
                         mesh=mesh)
    l1, l2 = MSLoader(ms1), MSLoader(ms2)
    l1.load(); l2.load()
    np.testing.assert_array_equal(l1.load_flags(), l2.load_flags())


def test_flag_waterfalls_mesh_non_divisible(rng):
    """Plane counts that don't divide the mesh axis replicate instead
    of crashing (15 baselines on an 8-chip mesh is normal)."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ devices")
    from rfi_toolbox_tpu.parallel import make_mesh

    mesh = make_mesh(shape=(2,), axis_names=("data",),
                     devices=jax.devices()[:2])
    vis = (rng.normal(1.0, 0.1, (3, 64, 64))).astype(np.complex64)  # 3 % 2 != 0
    f_plain = np.asarray(flag_waterfalls(vis, method="mad", sigma=5.0,
                                         patch_size=64))
    f_mesh = np.asarray(flag_waterfalls(vis, method="mad", sigma=5.0,
                                        patch_size=64, mesh=mesh))
    np.testing.assert_array_equal(f_plain, f_mesh)


def test_flag_measurement_set_ragged_falls_back_to_streaming(rng, caplog):
    """An MS with a baseline missing integrations (antenna offline mid-
    observation) can't use the bulk layout; the default path must
    degrade to per-baseline streaming and still flag everything."""
    import logging

    ms, _ = _rfi_ms(rng, nchan=32, ntime=32)
    t0 = min(r["TIME"] for r in ms.rows)
    # baseline (0, 1) loses its last 8 integrations
    ms.rows = [
        r for r in ms.rows
        if not (r["ANTENNA1"] == 0 and r["ANTENNA2"] == 1
                and r["TIME"] >= t0 + 24)
    ]
    with caplog.at_level(logging.WARNING, logger="rfi_toolbox_tpu.io.flagging"):
        result = flag_measurement_set(ms, method="mad", sigma=5.0,
                                      patch_size=32)
    assert any("falling back" in r.message for r in caplog.records)
    assert result["baselines"] == 3  # ragged baseline still flagged
    assert result["failed"] == []
