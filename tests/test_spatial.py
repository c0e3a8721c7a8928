"""Tests for spatially-sharded preprocessing over the virtual mesh."""

import numpy as np
import pytest

import jax

from rfi_toolbox_tpu.parallel import make_mesh
from rfi_toolbox_tpu.parallel.spatial import preprocess_sharded, sharded_global_stats
from rfi_toolbox_tpu.preprocess import pipeline as P


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(axis_names=("data",))


def test_preprocess_sharded_matches_unsharded(mesh, rng):
    p = 16
    c = mesh.shape["data"] * p * 2  # 2 patch rows per shard
    t = p * 3
    base = rng.normal(1.0, 0.1, (2, c, t))
    base[:, 40:44, :] += 1e4
    wf = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))).astype(
        np.complex64
    )

    got = np.asarray(preprocess_sharded(jax.numpy.asarray(wf), mesh,
                                        patch_size=p))
    want = np.asarray(
        P.imagenet_normalize(
            P.extract_channels(P.patchify_batch(jax.numpy.asarray(wf), p))
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_preprocess_sharded_misaligned_pads(mesh, rng):
    """Channel counts that don't divide shards*patch pad instead of
    raising, and still bit-match the unsharded pipeline (round-3
    verdict #7: no alignment precondition on the caller)."""
    for c, t in ((100, 32), (17, 40), (16 * 3, 33)):
        base = rng.normal(1.0, 0.1, (2, c, t))
        wf = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))
              ).astype(np.complex64)
        got = np.asarray(preprocess_sharded(jax.numpy.asarray(wf), mesh,
                                            patch_size=16))
        want = np.asarray(
            P.imagenet_normalize(
                P.extract_channels(P.patchify_batch(jax.numpy.asarray(wf),
                                                    16))
            )
        )
        assert got.shape == want.shape, (c, t)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_flag_single_waterfall_channel_sharded(mesh, rng):
    """ONE large waterfall on the 8-virtual mesh: flag_waterfalls
    splits the channel axis into patch-aligned slabs so the whole
    slice participates, and the flags equal the meshless result
    exactly — including non-divisible C and padded T."""
    from rfi_toolbox_tpu.io import flag_waterfalls

    for c, t in ((16 * 8, 16 * 2), (100, 40), (16 * 3, 16)):
        base = rng.normal(1.0, 0.1, (1, c, t))
        base[:, min(c - 1, 40):min(c, 44), :] += 1e4
        wf = (base * np.exp(1j * rng.uniform(0, 6.28, base.shape))
              ).astype(np.complex64)
        plain = np.asarray(flag_waterfalls(wf, method="mad", sigma=5.0,
                                           patch_size=16))
        sharded = np.asarray(flag_waterfalls(wf, method="mad", sigma=5.0,
                                             patch_size=16, mesh=mesh))
        assert sharded.shape == (1, c, t)
        np.testing.assert_array_equal(plain, sharded, err_msg=f"{(c, t)}")


def test_sharded_global_stats_exact(mesh, rng):
    n = mesh.shape["data"] * 1000
    x = np.abs(rng.normal(5, 2, (n,))).astype(np.float32)
    got = sharded_global_stats(jax.numpy.asarray(x), mesh)
    assert got["mean"] == pytest.approx(float(x.mean()), rel=1e-5)
    assert got["std"] == pytest.approx(float(x.std()), rel=1e-4)
    assert got["median"] == pytest.approx(float(np.median(x)), rel=1e-6)
