"""Fused static-shape preprocessing with VIRTUAL rotation augmentation.

The materialized pipeline (preprocessor.create_dataset) builds the
4-way rotation augmentation by stacking flipped/transposed copies of
every waterfall and patchifying all of them — on the headline shapes
that is ~2.5 GB of HBM layout traffic per iteration, measured at
22.3 ms of the 55.8 ms standalone prep cost (runs/
prep_phase_breakdown.json), even though only K of the 4x patches are
ever consumed downstream.

This module exploits two exact identities to do the same work on the
BASE patches only:

1. **Augmentation commutes with patchify.** When the waterfall is an
   exact multiple of the patch size, each patch of a flipped/transposed
   waterfall IS a flipped/transposed base patch at a remapped grid
   index (``variant_remap``):

       flip(W)  patch (i,j)  = flipud(base (nh-1-i, j))
       T(W)     patch (i,j)  = (base (j, i)).T
       flipT(W) patch (i,j)  = flipud((base (j, nw-1-i)).T)

2. **Per-patch statistics are flip/transpose invariant.** The MAD
   median/threshold, the any-flag reduction, ``normalize_by_median``
   and ``apply_stretch`` all reduce or map over the whole patch, so
   computing them on the base patch and transforming afterwards is
   bit-identical to computing them on the transformed patch.

So the fused path patchifies ONCE (M base patches), computes flags on
the base patches (4x fewer MAD selections), builds the 4x-augmented
any-flag vector by pure index remap, runs the static device-side
selection (:func:`pipeline.static_select_flagged` semantics) in the
SAME virtual index order as the materialized path, gathers only the K
selected base patches, and applies the flip/transpose AFTER the gather
(K patches instead of 4x-all). Everything is one jitted program — the
materialized path's per-stage dispatches and intermediates disappear.

Output parity with the materialized ``static_num_patches`` path is
EXACT (same kept indices, same order, same bits) and asserted in
tests/test_static_prep.py. Falls back are the caller's job: the fused
path requires an exact patch grid (no padding — padding does not
commute with flips) and patchified input (see
``Preprocessor.create_dataset``).
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import pipeline as P

__all__ = ["variant_remap", "make_static_prep_fn"]

# variants in reference order [orig, flipud, T, flipud.T]
# (preprocessor.py:429-446)
_N_VARIANTS = {1: 1, 2: 2, 4: 4}


@lru_cache(maxsize=None)
def variant_remap(nh, nw, rotations):
    """(R, nh*nw) int32 base-patch index for each virtual variant patch.

    Row r maps the row-major patch index within variant r's orientation
    to the base (un-augmented) patch index. Transposed variants use the
    transposed grid (nw, nh); the patch count per variant is identical.
    """
    if rotations not in _N_VARIANTS:
        raise ValueError(f"rotations must be 1, 2, or 4, got {rotations}")
    i, j = np.divmod(np.arange(nh * nw), nw)
    rows = [i * nw + j]
    if rotations >= 2:
        rows.append((nh - 1 - i) * nw + j)
    if rotations == 4:
        ti, tj = np.divmod(np.arange(nw * nh), nh)
        rows.append(tj * nw + ti)
        rows.append(tj * nw + (nw - 1 - ti))
    return np.stack(rows).astype(np.int32)


def _transform_by_variant(x, v):
    """Apply variant v's flip/transpose to square patches (K, p, p)."""
    is_t = (v >= 2)[:, None, None]
    is_f = ((v == 1) | (v == 3))[:, None, None]
    x = jnp.where(is_t, jnp.swapaxes(x, -1, -2), x)
    return jnp.where(is_f, jnp.flip(x, axis=-2), x)


def _transform_by_variant_nhwc(x, v):
    """Variant flip/transpose over the H/W axes of (K, p, p, C) images."""
    is_t = (v >= 2)[:, None, None, None]
    is_f = ((v == 1) | (v == 3))[:, None, None, None]
    x = jnp.where(is_t, jnp.swapaxes(x, 1, 2), x)
    return jnp.where(is_f, jnp.flip(x, axis=1), x)


# gradient plane per variant [orig, flipud, T, flipud.T] — see
# pipeline.extract_channel_planes (variants orig and T share g[0])
_VARIANT_GRAD_PLANE = np.array([0, 1, 0, 2], dtype=np.int32)


@lru_cache(maxsize=None)
def make_static_prep_fn(
    patch_size,
    k,
    rotations=4,
    flags_mode="custom",
    flag_sigma=5.0,
    use_pallas=False,
    stretch=None,
    normalize_before_stretch=True,
    normalize_after_stretch=False,
    extract="auto",
    return_patches=True,
):
    """Build the fused one-program static preprocess.

    Args:
        patch_size: square patch edge; waterfall dims must be exact
            multiples (caller-checked).
        k: static output patch count (static_select_flagged semantics).
        rotations: 1, 2, or 4 virtual augmentation variants.
        flags_mode: 'custom' (per-pixel flags passed in) or 'mad'
            (sigma-threshold computed on the base patches).
        use_pallas: use the Pallas TPU kernels for MAD + extraction.
        stretch / normalize_*: the real-input steps 3-5 (applied to
            base patches — per-patch ops are flip/T invariant; skipped
            wholesale for complex input, matching preprocessor.py:284-313).
        extract: where channel extraction runs. 'gathered' = after the
            gather, on the K selected patches (the original path);
            'base' = per BASE patch: with use_pallas the gather-fused
            kernel (:func:`..ops.fused_gather_extract` — scalar-
            prefetched indices drive the block DMA, so neither the
            selected complex patches nor the channel planes are ever
            materialized in HBM), otherwise
            :func:`pipeline.extract_channel_planes` + a plane gather
            (bit-equal output, ~K/M less transcendental work when
            augmentation duplicates patches); 'auto' picks 'base'
            whenever K exceeds the base-patch count (at the headline
            shapes K ~ 3.75 M).
        return_patches: also gather + transform the complex/raw patches
            (third return value). The training pipeline consumes only
            images/labels; skipping the patch gather saves the largest
            intermediate in the program. When False the third return is
            None.

    Returns:
        jitted ``fn(flat, flag_flat, key) -> (images, labels, patches,
        flag_patches)`` over (M, H, W) waterfalls; ``flag_flat`` is
        ignored (pass the data again) when flags_mode='mad'.
    """
    if extract not in ("auto", "base", "gathered", "planes"):
        raise ValueError(f"unknown extract mode {extract!r}")

    @jax.jit
    def fn(flat, flag_flat, key):
        m, h, w = flat.shape
        nh, nw = h // patch_size, w // patch_size
        kpp = nh * nw
        r = _N_VARIANTS[rotations]
        remap = jnp.asarray(variant_remap(nh, nw, rotations))

        base = P.patchify_batch(flat, patch_size)            # (m*kpp, p, p)

        # steps 3-5: real input only (reference order — flags see the
        # processed values)
        if not jnp.iscomplexobj(base):
            if normalize_before_stretch:
                base = P.normalize_by_median(base)
            if stretch:
                base = P.apply_stretch(base, stretch)
            if normalize_after_stretch:
                base = P.normalize_by_median(base)

        if flags_mode == "custom":
            # nonzero test, not astype(uint8): truncation would silently
            # unflag fractional float flags; bool keeps the 1-byte-lane
            # traffic win of the layout pass
            base_f = P.patchify_batch(flag_flat != 0, patch_size)
        elif flags_mode == "mad":
            if use_pallas:
                from ..ops import mad_flag_patches_pallas

                base_f = mad_flag_patches_pallas(base, float(flag_sigma))
            else:
                base_f = P.mad_flag_patches(base, float(flag_sigma))
        else:
            raise ValueError(f"unknown flags_mode {flags_mode!r}")

        # virtual 4x any-flag vector, materialized-path index order:
        # index = (wf*r + v)*kpp + p_v
        base_any = jnp.any(base_f.reshape(m, kpp, -1), axis=-1)  # (m, kpp)
        has = jnp.take(base_any, remap, axis=1).reshape(m * r * kpp)

        keep = P.static_select_from_has(has, k, key)

        v = (keep // kpp) % r
        wf_i = keep // (r * kpp)
        base_idx = wf_i * kpp + jnp.take(remap, v * kpp + (keep % kpp))

        flag_patches = _transform_by_variant(
            jnp.take(base_f, base_idx, axis=0), v)
        patches = (
            _transform_by_variant(jnp.take(base, base_idx, axis=0), v)
            if return_patches else None
        )

        n_base = base.shape[0]
        extract_base = (extract in ("base", "planes")) or (
            extract == "auto" and r > 1 and k > n_base
        )
        # The Pallas extraction kernels implement the COMPLEX channel
        # semantics only (fixed log window + phase); real input must
        # take the jnp path for the reference's real fallback (min-max
        # log amp + zero phase, preprocessor.py:608-644).
        pallas_extract = use_pallas and jnp.iscomplexobj(base)
        if extract_base:
            pidx = jnp.take(jnp.asarray(_VARIANT_GRAD_PLANE[:r]), v)
            if pallas_extract and extract == "planes":
                # extraction amortized on the M base patches, then the
                # WHOLE epilogue (plane gather + stack select +
                # flip/transpose) in one pure-DMA Pallas pass
                from ..ops import (
                    fused_extract_channel_planes,
                    fused_plane_gather_transform,
                )

                planes = fused_extract_channel_planes(base)
                g, lp, ph = fused_plane_gather_transform(
                    planes, base_idx, pidx, v
                )
                images = jnp.stack([g, lp, ph], axis=-1)
                return (images, flag_patches.astype(jnp.uint8), patches,
                        flag_patches)
            if pallas_extract:
                # gather fused into the kernel's block index map: the
                # planes are never materialized in HBM
                from ..ops import fused_gather_extract

                g, lp, ph = fused_gather_extract(base, base_idx, pidx)
                img = jnp.stack([g, lp, ph], axis=-1)
            else:
                grad3, logp, phase = P.extract_channel_planes(base)
                g = jnp.take(
                    grad3.reshape(3 * n_base, patch_size, patch_size),
                    pidx * n_base + base_idx, axis=0,
                )
                img = jnp.stack(
                    [g, jnp.take(logp, base_idx, axis=0),
                     jnp.take(phase, base_idx, axis=0)], axis=-1,
                )
            images = _transform_by_variant_nhwc(img, v)
        else:
            src = patches if patches is not None else _transform_by_variant(
                jnp.take(base, base_idx, axis=0), v)
            if pallas_extract:
                from ..ops import fused_extract_channels

                images = fused_extract_channels(src)
            else:
                images = P.imagenet_normalize(P.extract_channels(src))
        return images, flag_patches.astype(jnp.uint8), patches, flag_patches

    return fn
