"""Golden regression tests: outputs locked against committed oracles
(tests/golden/oracles.npz, generated 2026-08-16 on the CPU jnp paths).
Any numeric drift in the pipeline, generator key derivations, or
metrics shows up here before it shows up in parity."""

from pathlib import Path

import numpy as np
import pytest

GOLDEN = Path(__file__).parent / "golden" / "oracles.npz"


@pytest.fixture(scope="module")
def golden():
    with np.load(GOLDEN) as z:
        return {k: z[k] for k in z.files}


def test_channels_golden(golden):
    from rfi_toolbox_tpu.preprocess import pipeline as P

    got = np.asarray(
        P.imagenet_normalize(P.extract_channels(golden["input_patches"]))
    )
    np.testing.assert_allclose(got, golden["channels"], atol=1e-6)


def test_mad_flags_golden(golden):
    from rfi_toolbox_tpu.preprocess import pipeline as P

    got = np.asarray(P.mad_flag_patches(golden["input_patches"], 5.0))
    np.testing.assert_array_equal(got, golden["mad_flags"])


def test_synth_generator_golden(golden):
    from jax import random

    from rfi_toolbox_tpu.synth import make_sample_generator

    fn = make_sample_generator(96, 96, rfi_config={
        "narrowband_persistent": {"count": 3},
        "frequency_sweep": {"count": 1}}, num_polarizations=2)
    wf, mask, _ = fn(random.key(42))
    np.testing.assert_allclose(np.asarray(wf).real, golden["synth_wf_real"],
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mask), golden["synth_mask"])


def test_metrics_golden(golden):
    from rfi_toolbox_tpu.evaluation import compute_ffi, evaluate_segmentation

    amp = np.abs(golden["input_patches"])
    m = evaluate_segmentation(golden["mad_flags"], amp > 1e4)
    got = np.array([m["iou"], m["precision"], m["recall"], m["f1"], m["dice"]])
    np.testing.assert_allclose(got, golden["metrics"], atol=1e-6)

    ffi = compute_ffi(golden["input_patches"][0], golden["mad_flags"][0])
    got = np.array([ffi["ffi"], ffi["mad_reduction"], ffi["std_reduction"],
                    ffi["flagged_fraction"]])
    np.testing.assert_allclose(got, golden["ffi"], atol=1e-5)
