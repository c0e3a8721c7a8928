"""Tests for the synthetic generators (events, samples, simulator)."""

import json

import jax
import numpy as np
import pytest
from jax import random

from rfi_toolbox_tpu.synth import (
    RFISimulator,
    SyntheticDataGenerator,
    generate_bandpass,
    make_sample_generator,
    params_to_event_list,
)
from rfi_toolbox_tpu.synth import events as E


def test_narrowband_persistent_profile():
    f, t, p = E.narrowband_persistent(random.key(0), 256, 64)
    f, t = np.asarray(f), np.asarray(t)
    assert f.shape == (256,) and t.shape == (64,)
    assert np.all(t == 1.0)  # persistent in time
    width = int(f.sum())
    assert 1 <= width <= 10
    # contiguous strip
    on = np.nonzero(f)[0]
    assert np.all(np.diff(on) == 1)


def test_broadband_persistent_profile():
    f, t, p = E.broadband_persistent(random.key(1), 64, 256)
    f, t = np.asarray(f), np.asarray(t)
    assert np.all(f == 1.0)
    assert 1 <= t.sum() <= 50


def test_intermittent_duty_cycle():
    f, t, p = E.narrowband_intermittent(random.key(2), 128, 1000)
    t = np.asarray(t)
    period = int(p["period"])
    duty = float(p["duty_cycle"])
    duration = int(period * duty)
    # first period block matches the duty cycle exactly
    np.testing.assert_array_equal(t[:period], np.arange(period) < duration)


def test_bandpass_rolloff():
    bp = np.asarray(generate_bandpass(100, 8))
    assert bp[0] == 0.0
    assert bp[50] == 1.0
    assert bp[-1] == 0.0
    np.testing.assert_allclose(bp[5], (5 / 10) ** 8, rtol=1e-5)
    np.testing.assert_allclose(bp, bp[::-1], atol=1e-6)  # symmetric


def _small_cfg_counts():
    return {
        "narrowband_persistent": {"count": 2},
        "broadband_persistent": {"count": 1},
        "narrowband_bursty": {"count": [1, 3]},
        "frequency_sweep": {"count": 1},
    }


def test_sample_generator_shapes_and_pols():
    fn = make_sample_generator(
        128, 96, noise_level=1.0, rfi_power_min=1000.0, rfi_power_max=10000.0,
        rfi_config=_small_cfg_counts(), num_polarizations=3, pol_corr=0.8,
    )
    wf, mask, params = fn(random.key(0))
    wf, mask = np.asarray(wf), np.asarray(mask)
    assert wf.shape == (3, 128, 96) and wf.dtype == np.complex64
    assert mask.shape == (3, 128, 96) and mask.dtype == bool
    # pol0/pol1 share the mask; pol2+ is clean
    np.testing.assert_array_equal(mask[0], mask[1])
    assert not mask[2].any()
    assert mask[0].any()
    # RFI pixels are ~6 orders of magnitude above the 1 mJy noise
    mag = np.abs(wf[0])
    assert np.median(mag[mask[0]]) > 1e5
    assert abs(np.median(mag[~mask[0]]) - 1.0) < 0.2


def test_sample_generator_reproducible():
    fn = make_sample_generator(64, 64, rfi_config=_small_cfg_counts())
    w1, m1, _ = fn(random.key(5))
    w2, m2, _ = fn(random.key(5))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    w3, _, _ = fn(random.key(6))
    assert not np.array_equal(np.asarray(w1), np.asarray(w3))


def test_params_to_event_list():
    fn = make_sample_generator(64, 64, rfi_config=_small_cfg_counts())
    _, _, params = fn(random.key(0))
    events = params_to_event_list(params)
    types = [e["type"] for e in events]
    assert types.count("narrowband_persistent") == 2
    assert types.count("broadband_persistent") == 1
    assert 1 <= types.count("narrowband_bursty") <= 3
    assert types.count("frequency_sweep") == 1
    for e in events:
        assert e["amplitude_mjy"] >= 1000.0 * 1000.0  # >= pmin in mJy


def test_sweep_masks_move_in_frequency():
    fn = make_sample_generator(
        256, 128,
        rfi_config={"frequency_sweep": {"count": 1}},
    )
    _, mask, params = fn(random.key(3))
    mask = np.asarray(mask[0])
    centers = [np.nonzero(mask[:, t])[0].mean() for t in range(0, 128, 16)
               if mask[:, t].any()]
    assert len(centers) > 4
    assert centers[-1] > centers[0]  # sweeps run from low to high band


class _NS(dict):
    """Minimal config stand-in with .get (DataConfig-compatible)."""
    __getattr__ = dict.__getitem__


def _gen_config(tmp_path, save_raw=False, n=3):
    return _NS(
        synthetic=_NS(
            num_samples=n,
            num_channels=128,
            num_times=128,
            noise_mjy=1.0,
            rfi_power_min=1000.0,
            rfi_power_max=10000.0,
            rfi_type_counts=_NS(
                narrowband_persistent=2, broadband_persistent=1, frequency_sweep=1
            ),
            generation_batch_size=2,
            num_polarizations=2,
            polarization_correlation=0.8,
        ),
        processing=_NS(
            save_raw=save_raw,
            patch_size=128,  # == image size -> no patching
            enable_augmentation=True,
            augmentation_rotations=2,
            stretch=None,
            normalize_before_stretch=False,
            normalize_after_stretch=False,
        ),
    )


@pytest.mark.slow
def test_generate_to_disk_preprocessed(tmp_path):
    cfg = _gen_config(tmp_path)
    out = SyntheticDataGenerator(cfg, seed=0).generate(tmp_path / "ds")
    outdir = tmp_path / "ds"
    meta = json.loads((outdir / "generation_metadata.json").read_text())
    assert meta["num_raw_samples"] == 3
    assert meta["ground_truth"] == "exact"
    batch_meta = json.loads((outdir / "exact_masks" / "metadata.json").read_text())
    assert batch_meta["format"] == "preprocessed"
    assert batch_meta["num_samples"] > 0
    rfi_params = json.loads((outdir / "rfi_parameters.json").read_text())
    assert len(rfi_params) == 3  # one event list per sample
    assert all(isinstance(ev, list) for ev in rfi_params)
    files = list((outdir / "exact_masks").glob("batch_*.npz"))
    assert files


def test_generate_to_disk_raw(tmp_path):
    cfg = _gen_config(tmp_path, save_raw=True)
    SyntheticDataGenerator(cfg, seed=0).generate(tmp_path / "raw")
    batch_meta = json.loads(
        (tmp_path / "raw" / "exact_masks" / "metadata.json").read_text()
    )
    assert batch_meta["format"] == "raw"
    assert batch_meta["image_shape"] == [128, 128]


# ---- coherent simulator --------------------------------------------------
def test_simulator_clean():
    sim = RFISimulator(time_bins=64, freq_bins=64, seed=0)
    tf, mask = sim.generate_clean_data()
    assert set(tf) == {"RR", "RL", "LR", "LL"}
    assert tf["RR"].shape == (64, 64) and tf["RR"].dtype == np.complex64
    assert not mask.any()
    # unit complex gaussian: |z| median ~ 1.18
    assert 0.9 < np.median(np.abs(tf["RR"])) < 1.5


@pytest.mark.slow
def test_simulator_rfi():
    sim = RFISimulator(time_bins=128, freq_bins=128, seed=1)
    tf, mask = sim.generate_rfi(baseline_frac=0.5)
    assert mask.any()
    assert mask.shape == (128, 128)
    # masked pixels must be above the detection floor in RR or LL
    rr = np.abs(tf["RR"])
    assert rr[mask].mean() > rr[~mask].mean()
    # cross-hands inherit RR structure: correlated magnitudes
    corr = np.corrcoef(np.abs(tf["RL"]).ravel(), rr.ravel())[0, 1]
    assert corr > 0.1


@pytest.mark.slow
def test_simulator_gibbs_ringing_runs():
    sim = RFISimulator(time_bins=64, freq_bins=64, seed=2)
    sim.gibbs_ringing = True
    tf, mask = sim.generate_rfi(baseline_frac=0.2)
    assert np.isfinite(tf["RR"]).all()


@pytest.mark.slow
def test_simulator_device_batch():
    sim = RFISimulator(time_bins=64, freq_bins=64, seed=3)
    keys = random.split(random.key(0), 2)
    tf, mask = jax.vmap(sim.generate_rfi_device)(keys)
    assert tf.shape == (2, 4, 64, 64)
    assert mask.shape == (2, 64, 64)
    assert np.asarray(mask).any(axis=(1, 2)).all()
