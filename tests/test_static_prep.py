"""Exact-parity tests for the fused virtual-augmentation static prep
(preprocess/static_prep.py) against the materialized pipeline.

The fused path must produce identical labels and identical images (up
to one-program jit-fusion rounding of atan2, ~5e-7 on the phase
channel) to running the materialized chain (augment -> patchify ->
flags -> static select -> gather -> extract), because it uses the same
virtual index order and per-patch statistics are flip/transpose
invariant.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.preprocess import Preprocessor
from rfi_toolbox_tpu.preprocess import pipeline as P
from rfi_toolbox_tpu.preprocess import preprocessor as PP
from rfi_toolbox_tpu.preprocess.static_prep import (
    make_static_prep_fn,
    variant_remap,
)


def _materialized_static(flat, flag_flat, patch_size, k, rotations, key,
                         flags_mode="custom", flag_sigma=5.0,
                         stretch=None, nb=True, na=False):
    """The pre-fusion static path, phase by phase (the old
    create_dataset static branch), as the parity oracle."""
    patches, _ = PP._augment_and_patchify(flat, patch_size, rotations, True)
    if not jnp.iscomplexobj(patches):
        if nb:
            patches = P.normalize_by_median(patches)
        if stretch:
            patches = P.apply_stretch(patches, stretch)
        if na:
            patches = P.normalize_by_median(patches)
    if flags_mode == "custom":
        fp, _ = PP._augment_and_patchify(
            flag_flat.astype(jnp.float32), patch_size, rotations, True)
        fp = fp > 0
    else:
        fp = P.mad_flag_patches(patches, flag_sigma)
    keep = P.static_select_flagged(fp, k, key)
    patches = jnp.take(patches, keep, axis=0)
    fp = jnp.take(fp, keep, axis=0)
    images = P.imagenet_normalize(P.extract_channels(patches))
    return np.asarray(images), np.asarray(fp)


def _rfi_waterfall(rng, m=2, h=96, w=96, complex_=True):
    base = rng.normal(1.0, 0.1, (m, h, w))
    mask = np.zeros((m, h, w), bool)
    for i in range(m):
        c = rng.integers(8, w - 8)
        base[i, :, c:c + 2] += 50.0
        mask[i, :, c:c + 2] = True
        t = rng.integers(8, h - 8)
        base[i, t:t + 3, :] += 30.0
        mask[i, t:t + 3, :] = True
    if complex_:
        phase = rng.uniform(0, 2 * np.pi, (m, h, w))
        data = (base * np.exp(1j * phase)).astype(np.complex64)
    else:
        data = base.astype(np.float32)
    return jnp.asarray(data), jnp.asarray(mask)


@pytest.mark.parametrize("rotations", [1, 2, 4])
@pytest.mark.parametrize("extract", ["gathered", "base"])
def test_fused_matches_materialized_complex_custom(rotations, extract):
    rng = np.random.default_rng(0)
    flat, mask = _rfi_waterfall(rng, m=2, h=96, w=96)
    k, p = 10, 32
    key = jax.random.key(7)
    fn = make_static_prep_fn(p, k, rotations, flags_mode="custom",
                             extract=extract)
    images, labels, _, _ = fn(flat, mask, key)
    ref_img, ref_fp = _materialized_static(flat, mask, p, k, rotations, key)
    # images: atol for jit-fusion rounding of atan2 (one-program
    # lowering rounds the phase channel differently at ~5e-7)
    np.testing.assert_allclose(np.asarray(images), ref_img, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(labels).astype(bool), ref_fp)


@pytest.mark.parametrize("extract", ["gathered", "base"])
def test_fused_matches_materialized_nonsquare_grid(extract):
    # nh=2, nw=3 exercises the transposed-variant remap on a
    # non-square patch grid
    rng = np.random.default_rng(1)
    flat, mask = _rfi_waterfall(rng, m=1, h=64, w=96)
    k, p = 8, 32
    key = jax.random.key(3)
    fn = make_static_prep_fn(p, k, 4, flags_mode="custom", extract=extract)
    images, labels, _, _ = fn(flat, mask, key)
    ref_img, ref_fp = _materialized_static(flat, mask, p, k, 4, key)
    # images: atol for jit-fusion rounding of atan2 (one-program
    # lowering rounds the phase channel differently at ~5e-7)
    np.testing.assert_allclose(np.asarray(images), ref_img, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(labels).astype(bool), ref_fp)


def test_fused_auto_extract_base_when_k_exceeds_base_count():
    """'auto' must take the extract-before-gather path when K > base
    patches (the headline regime: K ~ 3.75x base) and stay bit-faithful
    to the materialized path; return_patches=False skips the complex
    patch gather entirely."""
    rng = np.random.default_rng(9)
    flat, mask = _rfi_waterfall(rng, m=1, h=96, w=96)  # 9 base patches
    k, p = 30, 32                                      # k > 9 -> 'base'
    key = jax.random.key(13)
    fn = make_static_prep_fn(p, k, 4, flags_mode="custom",
                             return_patches=False)
    images, labels, patches, _ = fn(flat, mask, key)
    assert patches is None
    ref_img, ref_fp = _materialized_static(flat, mask, p, k, 4, key)
    np.testing.assert_allclose(np.asarray(images), ref_img, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(labels).astype(bool), ref_fp)


def test_fused_matches_materialized_mad_branch():
    rng = np.random.default_rng(2)
    flat, _ = _rfi_waterfall(rng, m=1, h=96, w=96)
    k, p = 6, 32
    key = jax.random.key(11)
    fn = make_static_prep_fn(p, k, 4, flags_mode="mad", flag_sigma=5.0)
    images, labels, _, _ = fn(flat, flat, key)
    ref_img, ref_fp = _materialized_static(
        flat, None, p, k, 4, key, flags_mode="mad")
    # images: atol for jit-fusion rounding of atan2 (one-program
    # lowering rounds the phase channel differently at ~5e-7)
    np.testing.assert_allclose(np.asarray(images), ref_img, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(labels).astype(bool), ref_fp)


def test_fused_matches_materialized_real_stretch():
    rng = np.random.default_rng(3)
    flat, mask = _rfi_waterfall(rng, m=1, h=96, w=96, complex_=False)
    k, p = 6, 32
    key = jax.random.key(5)
    fn = make_static_prep_fn(p, k, 4, flags_mode="mad", flag_sigma=4.0,
                             stretch="SQRT")
    images, labels, _, _ = fn(flat, flat, key)
    ref_img, ref_fp = _materialized_static(
        flat, None, p, k, 4, key, flags_mode="mad", flag_sigma=4.0,
        stretch="SQRT")
    # images: atol for jit-fusion rounding of atan2 (one-program
    # lowering rounds the phase channel differently at ~5e-7)
    np.testing.assert_allclose(np.asarray(images), ref_img, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(labels).astype(bool), ref_fp)


def test_create_dataset_routes_static_to_fused_path(monkeypatch):
    """create_dataset with static_num_patches on an exact grid must use
    the fused path (and produce the documented static semantics)."""
    import rfi_toolbox_tpu.preprocess.static_prep as SP

    calls = []
    orig = SP.make_static_prep_fn

    def spy(*a, **kw):
        calls.append((a, kw))
        return orig(*a, **kw)

    monkeypatch.setattr(SP, "make_static_prep_fn", spy)
    rng = np.random.default_rng(4)
    flat, mask = _rfi_waterfall(rng, m=2, h=96, w=96)
    ds = Preprocessor(
        np.asarray(flat)[:, None], flags=np.asarray(mask)[:, None]
    ).create_dataset(patch_size=32, use_custom_flags=True, seed=0,
                     static_num_patches=12)
    assert len(calls) == 1
    assert len(ds) == 12
    assert all(ds.labels[i].any() for i in range(len(ds)))


def test_create_dataset_env_extract_override(monkeypatch):
    """RFI_STATIC_EXTRACT routes the static path's extraction mode
    (bench.py's preflight sets it to 'planes' when the Pallas epilogue
    program compiles); outputs must match the default routing."""
    rng = np.random.default_rng(4)
    flat, mask = _rfi_waterfall(rng, m=2, h=96, w=96)
    wf = np.asarray(flat)[:, None]
    fl = np.asarray(mask)[:, None]
    ds_default = Preprocessor(wf, flags=fl).create_dataset(
        patch_size=32, use_custom_flags=True, seed=0, static_num_patches=12)
    monkeypatch.setenv("RFI_STATIC_EXTRACT", "planes")
    ds_planes = Preprocessor(wf, flags=fl).create_dataset(
        patch_size=32, use_custom_flags=True, seed=0, static_num_patches=12)
    # gradient channel: extract-on-base vs extract-on-gathered round
    # FMA chains differently (~1.5e-6, the documented static-path class)
    np.testing.assert_allclose(np.asarray(ds_planes.images),
                               np.asarray(ds_default.images), atol=5e-6)
    np.testing.assert_array_equal(np.asarray(ds_planes.labels),
                                  np.asarray(ds_default.labels))


def test_create_dataset_padded_grid_falls_back(monkeypatch):
    """Non-multiple waterfall dims must take the materialized path
    (padding does not commute with flips)."""
    import rfi_toolbox_tpu.preprocess.static_prep as SP

    def boom(*a, **kw):
        raise AssertionError("fused path used on a padded grid")

    monkeypatch.setattr(SP, "make_static_prep_fn", boom)
    rng = np.random.default_rng(5)
    flat, mask = _rfi_waterfall(rng, m=1, h=100, w=96)
    ds = Preprocessor(
        np.asarray(flat)[:, None], flags=np.asarray(mask)[:, None]
    ).create_dataset(patch_size=32, use_custom_flags=True, seed=0,
                     static_num_patches=8)
    assert len(ds) == 8


def test_variant_remap_reconstructs_materialized_patches():
    """Pure index identity: remapped+transformed base patches equal the
    materialized augmented patchify for a non-square grid."""
    rng = np.random.default_rng(6)
    p, nh, nw = 8, 3, 2
    flat = jnp.asarray(rng.normal(size=(2, nh * p, nw * p)), jnp.float32)
    patches, _ = PP._augment_and_patchify(flat, p, 4, True)
    base = P.patchify_batch(flat, p)
    remap = variant_remap(nh, nw, 4)
    kpp = nh * nw
    recon = []
    for wf in range(2):
        for v in range(4):
            for pv in range(kpp):
                b = base[wf * kpp + remap[v, pv]]
                if v >= 2:
                    b = b.T
                if v in (1, 3):
                    b = b[::-1, :]
                recon.append(b)
    np.testing.assert_array_equal(
        np.asarray(jnp.stack(recon)), np.asarray(patches))
