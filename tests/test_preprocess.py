"""Parity tests for the preprocessing pipeline vs numpy oracles that
restate the reference semantics (SURVEY.md §2.2)."""

import numpy as np
import pytest

from rfi_toolbox_tpu.preprocess import DevicePreprocessor, Preprocessor, patchify
from rfi_toolbox_tpu.preprocess import pipeline as P


# ---- numpy oracles -------------------------------------------------------
def oracle_extract_complex(patch):
    amplitude = np.abs(patch)
    log_amp = np.log10(amplitude + 1e-10)
    phase = np.angle(patch)
    td = np.zeros_like(log_amp)
    fd = np.zeros_like(log_amp)
    td[1:, :] = np.diff(log_amp, axis=0)
    fd[:, 1:] = np.diff(log_amp, axis=1)
    grad = np.sqrt(td**2 + fd**2)
    lo, hi = np.nanmin(grad), np.nanmax(grad)
    grad_n = (grad - lo) / (hi - lo) if hi > lo else np.zeros_like(grad)
    log_n = np.clip((log_amp + 3.0) / 7.0, 0, 1)
    ph_n = (phase + np.pi) / (2 * np.pi)
    return np.stack([grad_n, log_n, ph_n], axis=-1)


def oracle_mad_flags(patch, sigma):
    p = np.abs(patch) if np.iscomplexobj(patch) else patch
    med = np.nanmedian(p)
    mad = np.nanmedian(np.abs(p - med))
    return (p > med + sigma * mad) | (p < med - sigma * mad)


def oracle_rotations(waterfall, n):
    out = [waterfall]
    if n >= 2:
        out.append(np.flip(waterfall, axis=0))
    if n >= 4:
        out.append(waterfall.T)
        out.append(np.flip(waterfall.T, axis=0))
    return out


def oracle_patch_list(waterfall, p):
    h, w = waterfall.shape
    ph = (p - h % p) % p if h >= p else p - h
    pw = (p - w % p) % p if w >= p else p - w
    x = np.pad(waterfall, ((0, ph), (0, pw)))
    out = []
    for i in range(x.shape[0] // p):
        for j in range(x.shape[1] // p):
            out.append(x[i * p : (i + 1) * p, j * p : (j + 1) * p])
    return out


# ---- unit parity ---------------------------------------------------------
def test_patchify_shape_and_content(rng):
    a = rng.random((256, 256)).astype(np.float32)
    out = np.asarray(patchify(a, (128, 128), 128))
    assert out.shape == (2, 2, 128, 128)
    np.testing.assert_array_equal(out[0, 1], a[:128, 128:])
    np.testing.assert_array_equal(out[1, 0], a[128:, :128])


def test_patchify_overlapping(rng):
    a = rng.random((64, 64)).astype(np.float32)
    out = np.asarray(patchify(a, (32, 32), 16))
    assert out.shape == (3, 3, 32, 32)
    np.testing.assert_array_equal(out[1, 1], a[16:48, 16:48])


def test_patchify_batch_order_matches_reference(rng):
    wf = rng.random((200, 300)).astype(np.float32)
    got = np.asarray(P.patchify_batch(wf[None], 128))
    want = oracle_patch_list(wf, 128)
    assert got.shape[0] == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_extract_channels_complex_parity(rng):
    amp = rng.uniform(0.5, 2000.0, (2, 64, 64))
    phase = rng.uniform(0, 2 * np.pi, (2, 64, 64))
    patches = (amp * np.exp(1j * phase)).astype(np.complex64)
    got = np.asarray(P.extract_channels(patches))
    for i in range(2):
        want = oracle_extract_complex(patches[i])
        np.testing.assert_allclose(got[i], want, atol=2e-5)


def test_extract_channels_real_fallback(rng):
    patches = rng.uniform(0.1, 10.0, (2, 32, 32)).astype(np.float32)
    got = np.asarray(P.extract_channels(patches))
    assert got.shape == (2, 32, 32, 3)
    np.testing.assert_array_equal(got[..., 2], 0.0)  # zero phase channel
    assert got[..., 1].min() >= -1e-6 and got[..., 1].max() <= 1 + 1e-6


def test_mad_flags_parity(rng):
    patches = rng.normal(1.0, 0.1, (3, 64, 64)).astype(np.float32)
    patches[0, 10:12, :] = 50.0  # RFI
    patches[1, :, 5] = -30.0
    got = np.asarray(P.mad_flag_patches(patches, 5.0))
    for i in range(3):
        np.testing.assert_array_equal(got[i], oracle_mad_flags(patches[i], 5.0))


def test_mad_flags_complex(rng):
    base = rng.normal(1.0, 0.1, (1, 32, 32))
    base[0, 4, :] = 100.0
    patches = (base * np.exp(1j * rng.uniform(0, 2 * np.pi, base.shape))).astype(
        np.complex64
    )
    got = np.asarray(P.mad_flag_patches(patches, 5.0))
    np.testing.assert_array_equal(got[0], oracle_mad_flags(patches[0], 5.0))


def test_rotations_order(rng):
    wf = rng.random((4, 6)).astype(np.float32)
    ga, gb = P.apply_rotations(wf[None], 4)
    want = oracle_rotations(wf, 4)
    np.testing.assert_array_equal(np.asarray(ga[0, 0]), want[0])
    np.testing.assert_array_equal(np.asarray(ga[0, 1]), want[1])
    np.testing.assert_array_equal(np.asarray(gb[0, 0]), want[2])
    np.testing.assert_array_equal(np.asarray(gb[0, 1]), want[3])


def test_stretch_sqrt_parity(rng):
    patches = rng.uniform(0.0, 100.0, (2, 16, 16)).astype(np.float32)
    got = np.asarray(P.apply_stretch(patches, "SQRT"))
    np.testing.assert_allclose(got, np.sqrt(np.abs(patches)), rtol=1e-6)


def test_stretch_log10_replaces_inf(rng):
    patches = rng.uniform(1.0, 10.0, (1, 16, 16)).astype(np.float32)
    patches[0, 0, 0] = 0.0  # log10(0) = -inf
    got = np.asarray(P.apply_stretch(patches, "LOG10"))
    assert np.isfinite(got).all()
    # -inf replaced by MAD of finite values
    finite = np.log10(patches[0].ravel()[1:])
    med = np.median(finite)
    mad = np.median(np.abs(finite - med))
    assert got[0, 0, 0] == pytest.approx(mad, rel=1e-3)


# ---- end-to-end Preprocessor --------------------------------------------
def _make_complex_waterfall(rng, c=256, t=256, npol=2):
    base = rng.normal(1.0, 0.1, (1, npol, c, t))
    mask = np.zeros((1, npol, c, t), bool)
    base[:, 0, 40:44, :] = 500.0
    mask[:, 0, 40:44, :] = True
    phase = rng.uniform(0, 2 * np.pi, base.shape)
    return (base * np.exp(1j * phase)).astype(np.complex64), mask


def test_create_dataset_shapes_and_alignment(rng):
    vis, mask = _make_complex_waterfall(rng)
    pre = Preprocessor(vis, flags=mask)
    ds = pre.create_dataset(patch_size=128, use_custom_flags=True, seed=0)
    n = len(ds)
    assert ds.images.shape == (n, 128, 128, 3)
    assert ds.labels.shape == (n, 128, 128)
    assert ds.images.dtype == np.float32 and ds.labels.dtype == np.uint8
    # blank removal: every patch must contain flags
    assert all(ds.labels[i].any() for i in range(n))
    # label alignment: flagged pixels must coincide with high log_amp
    la = ds.images[..., 1]  # log_amp channel (ImageNet-normalized)
    flagged_mean = la[ds.labels > 0].mean()
    clean_mean = la[ds.labels == 0].mean()
    assert flagged_mean > clean_mean + 0.5


def test_create_dataset_inference_mode_preserves_order(rng):
    vis, mask = _make_complex_waterfall(rng, c=256, t=256, npol=1)
    pre = Preprocessor(vis)
    ds = pre.create_dataset(
        patch_size=128,
        inference_mode=True,
        enable_augmentation=False,
    )
    # 1 pol, no aug: 2x2 grid of patches in row-major order, all kept
    assert len(ds) == 4
    assert ds.labels.sum() == 0  # dummy zero flags
    # first patch top-left: compare against direct channel extraction
    want = np.asarray(P.extract_channels(np.asarray(vis[0, 0, :128, :128])[None]))[0]
    want = (want - P.IMAGENET_MEAN) / P.IMAGENET_STD
    np.testing.assert_allclose(ds.images[0], want, atol=1e-5)


def test_create_dataset_full_waterfall_skip_patchify(rng):
    vis, mask = _make_complex_waterfall(rng, c=100, t=100, npol=1)
    ds = Preprocessor(vis, flags=mask).create_dataset(
        patch_size=128, use_custom_flags=True, seed=0
    )
    # 4 rotations of a single full waterfall, all containing RFI
    assert len(ds) == 4
    assert ds.images.shape[1:] == (100, 100, 3)


def test_create_dataset_mad_fallback_when_no_custom_flags(rng):
    vis, _ = _make_complex_waterfall(rng, npol=1)
    ds = Preprocessor(vis).create_dataset(
        patch_size=128, use_custom_flags=False, flag_sigma=5, seed=0
    )
    assert len(ds) > 0
    assert ds.labels.max() == 1  # MAD found the injected RFI


def test_create_dataset_num_patches_truncation(rng):
    vis, mask = _make_complex_waterfall(rng)
    ds = Preprocessor(vis, flags=mask).create_dataset(
        patch_size=128, num_patches=2, seed=0
    )
    assert len(ds) == 2


def test_create_dataset_static_num_patches(rng):
    """Device-side static selection: same kept SET as the host path when
    counts line up, cyclic flagged repeats on deficit, truncation on
    surplus — all without any data-dependent host readback."""
    vis, mask = _make_complex_waterfall(rng)  # 2 pol -> 32 patches, 8 flagged
    host = Preprocessor(vis, flags=mask).create_dataset(
        patch_size=128, use_custom_flags=True, seed=0
    )
    n_flagged = len(host)

    # exact count: identical patch SET (order differs: np vs jax shuffle)
    ds = Preprocessor(vis, flags=mask).create_dataset(
        patch_size=128, use_custom_flags=True, seed=0,
        static_num_patches=n_flagged,
    )
    assert len(ds) == n_flagged
    assert all(ds.labels[i].any() for i in range(len(ds)))

    def rows(d):
        return np.unique(np.asarray(d.images).reshape(len(d), -1), axis=0)

    # atol: the fused static path (static_prep.py) lowers the whole
    # chain as ONE program and rounds atan2 differently by ~5e-7
    np.testing.assert_allclose(rows(ds), rows(host), atol=1e-6)

    # deficit: flagged patches repeat cyclically, every output flagged
    ds_up = Preprocessor(vis, flags=mask).create_dataset(
        patch_size=128, use_custom_flags=True, seed=0,
        static_num_patches=n_flagged + 5,
    )
    assert len(ds_up) == n_flagged + 5
    assert all(ds_up.labels[i].any() for i in range(len(ds_up)))
    # only flagged patches appear, duplicated to fill the deficit
    np.testing.assert_allclose(rows(ds_up), rows(host), atol=1e-6)

    # surplus: truncation to the requested static count
    ds_dn = Preprocessor(vis, flags=mask).create_dataset(
        patch_size=128, use_custom_flags=True, seed=0,
        static_num_patches=max(n_flagged - 2, 1),
    )
    assert len(ds_dn) == max(n_flagged - 2, 1)
    assert all(ds_dn.labels[i].any() for i in range(len(ds_dn)))

    # no flagged patches at all: falls back to cycling every patch
    ds_none = Preprocessor(vis, flags=np.zeros_like(mask)).create_dataset(
        patch_size=128, use_custom_flags=True, seed=0,
        static_num_patches=6,
    )
    assert len(ds_none) == 6
    assert ds_none.labels.sum() == 0

    with pytest.raises(ValueError, match="mutually exclusive"):
        Preprocessor(vis, flags=mask).create_dataset(
            patch_size=128, seed=0, static_num_patches=4, num_patches=2
        )


def test_real_data_normalize_and_stretch_path(rng):
    data = rng.uniform(1.0, 100.0, (1, 1, 256, 256)).astype(np.float32)
    ds = Preprocessor(data).create_dataset(
        patch_size=128,
        stretch="SQRT",
        use_custom_flags=False,
        normalize_before_stretch=True,
        seed=0,
    )
    assert ds.images.shape[1:] == (128, 128, 3)


def test_device_preprocessor_raw_patches(rng):
    vis, mask = _make_complex_waterfall(rng)
    dp = DevicePreprocessor(vis, flags=mask)
    raw, masks = dp.create_raw_patches(patch_size=128, seed=0)
    assert raw.dtype == np.complex64
    assert raw.shape[1:] == (128, 128)
    assert masks.dtype == bool
    assert all(m.any() for m in masks)  # blank removal applied


def test_device_preprocessor_rejects_real():
    with pytest.raises(ValueError, match="complex"):
        DevicePreprocessor(np.zeros((1, 1, 8, 8), np.float32))


def test_real_input_use_pallas_routes_to_jnp_extraction(rng):
    """The Pallas extraction kernels implement the COMPLEX channel
    semantics only; real input with use_pallas=True must take the jnp
    real fallback (min-max log amp + zero phase). Before the guard,
    this call invoked the kernel with a zero imaginary plane — wrong
    phase/log channels on TPU, a crash here on CPU. Custom flags keep
    the (real-correct, TPU-only) MAD kernel out of the way."""
    data = rng.uniform(1.0, 100.0, (1, 1, 256, 256)).astype(np.float32)
    flags = data > 50.0
    kwargs = dict(patch_size=128, use_custom_flags=True, seed=0)
    got = Preprocessor(data, flags=flags).create_dataset(
        use_pallas=True, **kwargs)
    want = Preprocessor(data, flags=flags).create_dataset(
        use_pallas=False, **kwargs)
    np.testing.assert_array_equal(np.asarray(got.images),
                                  np.asarray(want.images))
    # real fallback: zero phase channel -> ImageNet affine of 0
    np.testing.assert_allclose(
        np.asarray(got.images)[..., 2], (0.0 - 0.406) / 0.225, atol=1e-6)


def test_real_input_use_pallas_static_path(rng):
    """Same guard on the fused static path (static_num_patches)."""
    data = rng.uniform(1.0, 100.0, (1, 1, 256, 256)).astype(np.float32)
    flags = data > 50.0
    kwargs = dict(patch_size=128, use_custom_flags=True, seed=0,
                  static_num_patches=4)
    got = Preprocessor(data, flags=flags).create_dataset(
        use_pallas=True, **kwargs)
    want = Preprocessor(data, flags=flags).create_dataset(
        use_pallas=False, **kwargs)
    np.testing.assert_array_equal(np.asarray(got.images),
                                  np.asarray(want.images))
