"""Fused 3-channel patch extraction — Pallas TPU kernel.

The hottest loop of the reference is per-patch channel extraction in
python (preprocessor.py:367-377 calling :562-606): |z| -> log10 ->
forward-difference gradient -> per-patch min/max normalization -> fixed
log window -> phase -> ImageNet normalization. The jnp pipeline already
fuses most of this; the Pallas kernel goes further and does the WHOLE
chain — including the per-patch min/max reduction and the ImageNet
affine — in one VMEM-resident pass per 128x128 patch, with no
intermediate HBM traffic.

Input is complex split into (real, imag) float32 planes (Mosaic has no
complex dtype); outputs are three (N, H, W) planes stacked to NHWC by a
single XLA transpose at the end (a trailing dim of 3 would break lane
tiling inside the kernel).

A jnp reference implementation with identical math lives in
:func:`rfi_toolbox_tpu.preprocess.pipeline.extract_channels`; parity is
tested to 2e-5.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..preprocess.pipeline import IMAGENET_MEAN, IMAGENET_STD, LOG_MAX, LOG_MIN

__all__ = [
    "fused_extract_channels",
    "fused_extract_channel_planes",
    "fused_gather_extract",
    "fused_plane_gather_transform",
]

# atan(t)/t as a polynomial in s = t^2 on t in [0, 1] (Chebyshev fit,
# max abs error 2.1e-9) — Mosaic has no atan/atan2 lowering, so the
# kernel evaluates the quadrant-corrected polynomial on the VPU.
_ATAN_COEFFS = (
    1.0, -0.33333297, 0.19998542, -0.1426439, 0.1095345,
    -0.08407879, 0.05804045, -0.03126451, 0.01096244, -0.00180449,
)


def _atan2(y, x):
    """Elementwise atan2 with numpy angle() semantics (atan2(0, 0) = 0,
    atan2(0, -1) = pi), built from the [0, 1] polynomial via the
    min/max identity and quadrant corrections."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    t = jnp.minimum(ax, ay) / jnp.maximum(hi, 1e-30)
    s = t * t
    p = jnp.float32(_ATAN_COEFFS[-1])
    for c in _ATAN_COEFFS[-2::-1]:
        p = p * s + jnp.float32(c)
    r = t * p
    half_pi = jnp.float32(jnp.pi / 2)
    r = jnp.where(ay > ax, half_pi - r, r)
    r = jnp.where(x < 0, jnp.float32(jnp.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _kernel(re_ref, im_ref, grad_ref, amp_ref, phase_ref):
    # A block of B patches per program: amortizes grid overhead while
    # keeping every intermediate in VMEM.
    re = re_ref[:]
    im = im_ref[:]

    amplitude = jnp.sqrt(re * re + im * im)
    log_amp = jnp.log10(amplitude + 1e-10)

    # np.diff semantics: first row/col of each derivative is zero
    # (preprocessor.py:581-585) — duplicating the edge row/col into the
    # shifted operand makes those entries cancel exactly.
    h = log_amp.shape[1]
    shifted_r = jnp.concatenate([log_amp[:, :1], log_amp[:, : h - 1]], axis=1)
    td = log_amp - shifted_r
    shifted_c = jnp.concatenate(
        [log_amp[:, :, :1], log_amp[:, :, :-1]], axis=2
    )
    fd = log_amp - shifted_c
    gradient = jnp.sqrt(td * td + fd * fd)

    # per-patch min/max normalization (VMEM-resident reductions;
    # axis-by-axis — multi-axis keepdims reductions lower via an
    # unsupported vector reshape in Mosaic)
    lo = jnp.min(jnp.min(gradient, axis=2, keepdims=True), axis=1,
                 keepdims=True)
    hi = jnp.max(jnp.max(gradient, axis=2, keepdims=True), axis=1,
                 keepdims=True)
    span = hi - lo
    grad_norm = jnp.where(
        span > 0, (gradient - lo) / jnp.where(span > 0, span, 1.0), 0.0
    )

    log_norm = jnp.clip((log_amp - LOG_MIN) / (LOG_MAX - LOG_MIN), 0.0, 1.0)
    phase = _atan2(im, re)
    phase_norm = (phase + jnp.pi) / (2.0 * jnp.pi)

    # ImageNet affine folded in per channel
    grad_ref[:] = (grad_norm - IMAGENET_MEAN[0]) / IMAGENET_STD[0]
    amp_ref[:] = (log_norm - IMAGENET_MEAN[1]) / IMAGENET_STD[1]
    phase_ref[:] = (phase_norm - IMAGENET_MEAN[2]) / IMAGENET_STD[2]


def _minmax_norm(x):
    """Per-patch min/max normalization, axis-by-axis (Mosaic rejects
    multi-axis keepdims reductions)."""
    lo = jnp.min(jnp.min(x, axis=2, keepdims=True), axis=1, keepdims=True)
    hi = jnp.max(jnp.max(x, axis=2, keepdims=True), axis=1, keepdims=True)
    span = hi - lo
    return jnp.where(span > 0, (x - lo) / jnp.where(span > 0, span, 1.0), 0.0)


def _planes_kernel(re_ref, im_ref, g0_ref, g1_ref, g2_ref, amp_ref,
                   phase_ref):
    """Variant-aware extraction on BASE patches: three gradient planes
    (fwd/fwd, down/fwd, fwd/down edge zeroing — one per rotation
    variant, see pipeline.extract_channel_planes) + log-amp + phase,
    all in one VMEM-resident pass."""
    re = re_ref[:]
    im = im_ref[:]

    amplitude = jnp.sqrt(re * re + im * im)
    log_amp = jnp.log10(amplitude + 1e-10)

    h = log_amp.shape[1]
    # fwd: zero first row/col (duplicate-edge trick); down: zero last
    # row/col. Signs differ from np.diff but every use squares them.
    shifted_r = jnp.concatenate([log_amp[:, :1], log_amp[:, : h - 1]], axis=1)
    td_fwd = log_amp - shifted_r
    shifted_rd = jnp.concatenate([log_amp[:, 1:], log_amp[:, h - 1:]], axis=1)
    td_down = log_amp - shifted_rd
    shifted_c = jnp.concatenate(
        [log_amp[:, :, :1], log_amp[:, :, :-1]], axis=2
    )
    fd_fwd = log_amp - shifted_c
    shifted_cd = jnp.concatenate(
        [log_amp[:, :, 1:], log_amp[:, :, -1:]], axis=2
    )
    fd_down = log_amp - shifted_cd

    mean0 = jnp.float32(IMAGENET_MEAN[0])
    std0 = jnp.float32(IMAGENET_STD[0])
    g0_ref[:] = (_minmax_norm(jnp.sqrt(td_fwd * td_fwd + fd_fwd * fd_fwd))
                 - mean0) / std0
    g1_ref[:] = (_minmax_norm(jnp.sqrt(td_down * td_down + fd_fwd * fd_fwd))
                 - mean0) / std0
    g2_ref[:] = (_minmax_norm(jnp.sqrt(td_fwd * td_fwd + fd_down * fd_down))
                 - mean0) / std0

    log_norm = jnp.clip((log_amp - LOG_MIN) / (LOG_MAX - LOG_MIN), 0.0, 1.0)
    amp_ref[:] = (log_norm - IMAGENET_MEAN[1]) / IMAGENET_STD[1]
    phase = _atan2(im, re)
    phase_ref[:] = ((phase + jnp.pi) / (2.0 * jnp.pi)
                    - IMAGENET_MEAN[2]) / IMAGENET_STD[2]


@partial(jax.jit, static_argnames=("interpret", "block"))
def fused_extract_channel_planes(patches, interpret=False, block=8):
    """(N, H, W) complex64 base patches -> the five ImageNet-normalized
    channel planes of :func:`..preprocess.pipeline.extract_channel_planes`:
    ``(grad3 (3, N, H, W), log_amp (N, H, W), phase (N, H, W))``.

    Used by the virtual-augmentation static path to extract once per
    BASE patch instead of once per gathered (augmentation-duplicated)
    patch; jnp reference parity is tested in tests/test_ops.py.
    """
    if jnp.iscomplexobj(patches):
        re = jnp.real(patches).astype(jnp.float32)
        im = jnp.imag(patches).astype(jnp.float32)
    else:
        re = patches.astype(jnp.float32)
        im = jnp.zeros_like(re)

    n, h, w = re.shape
    # ~14 f32 intermediates live per 128^2 patch; block 32 was measured
    # to blow the 16 MB scoped-VMEM stack (26.09M) on v5e
    block = min(block, 16)
    block = min(block, n) or 1
    pad = (-n) % block
    if pad:
        re = jnp.concatenate([re, jnp.ones((pad, h, w), re.dtype)], axis=0)
        im = jnp.concatenate([im, jnp.zeros((pad, h, w), im.dtype)], axis=0)
    m = re.shape[0]

    spec = pl.BlockSpec(
        (block, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((m, h, w), jnp.float32)

    g0, g1, g2, amp, phase = pl.pallas_call(
        _planes_kernel,
        grid=(m // block,),
        in_specs=[spec, spec],
        out_specs=(spec,) * 5,
        out_shape=(out_shape,) * 5,
        interpret=interpret,
    )(re, im)
    grad3 = jnp.stack([g0, g1, g2])
    if pad:
        return grad3[:, :n], amp[:n], phase[:n]
    return grad3, amp, phase


def _gather_kernel(idx_ref, pidx_ref, re_ref, im_ref, g_ref, amp_ref,
                   phase_ref):
    """Gather-fused extraction: the scalar-prefetched ``idx_ref`` drives
    the input BlockSpec's index map (each grid step DMAs exactly the
    selected base patch from HBM), so the selected patches are never
    materialized as a separate gather pass. ``pidx_ref`` picks the
    gradient edge-zeroing variant per output patch (see
    pipeline.extract_channel_planes: 0 = fwd/fwd for variants id and T,
    1 = down/fwd for flipud, 2 = fwd/down for flipud.T); the arithmetic
    is operation-identical to ``_planes_kernel`` (outputs match a
    plane gather to ~1e-6 — XLA contracts mul+add chains into FMAs
    differently per program, the same rounding class the static-path
    parity tests already carry)."""
    re = re_ref[:]
    im = im_ref[:]

    amplitude = jnp.sqrt(re * re + im * im)
    log_amp = jnp.log10(amplitude + 1e-10)

    h = log_amp.shape[1]
    shifted_r = jnp.concatenate([log_amp[:, :1], log_amp[:, : h - 1]], axis=1)
    td_fwd = log_amp - shifted_r
    shifted_rd = jnp.concatenate([log_amp[:, 1:], log_amp[:, h - 1:]], axis=1)
    td_down = log_amp - shifted_rd
    shifted_c = jnp.concatenate(
        [log_amp[:, :, :1], log_amp[:, :, :-1]], axis=2
    )
    fd_fwd = log_amp - shifted_c
    shifted_cd = jnp.concatenate(
        [log_amp[:, :, 1:], log_amp[:, :, -1:]], axis=2
    )
    fd_down = log_amp - shifted_cd

    v = pidx_ref[pl.program_id(0)]
    td = jnp.where(v == 1, td_down, td_fwd)
    fd = jnp.where(v == 2, fd_down, fd_fwd)
    gradient = jnp.sqrt(td * td + fd * fd)

    g_ref[:] = (_minmax_norm(gradient)
                - jnp.float32(IMAGENET_MEAN[0])) / jnp.float32(IMAGENET_STD[0])
    log_norm = jnp.clip((log_amp - LOG_MIN) / (LOG_MAX - LOG_MIN), 0.0, 1.0)
    amp_ref[:] = (log_norm - IMAGENET_MEAN[1]) / IMAGENET_STD[1]
    phase = _atan2(im, re)
    phase_ref[:] = ((phase + jnp.pi) / (2.0 * jnp.pi)
                    - IMAGENET_MEAN[2]) / IMAGENET_STD[2]


def _variant_transform_block(x, v):
    """In-kernel flip/transpose of a (1, h, w) square block by variant
    id v in [orig, flipud, T, flipud.T] — identical semantics to
    static_prep._transform_by_variant (transpose first, then flip the
    row axis).

    The row flip is an MXU matmul against the anti-identity J
    (J @ X reverses rows): Mosaic's TC kernel lowering has no ``rev``
    primitive (measured 2026-08-20 — "Unimplemented primitive ... rev"),
    and a 128x128x128 f32 matmul is ~2 MFLOP, noise next to the tile's
    HBM traffic. J is exact (0/1 entries), so the product is bit-exact
    row reversal."""
    import jax.lax as lax

    x = jnp.where(v >= 2, jnp.swapaxes(x, 1, 2), x)
    h = x.shape[1]
    anti = (lax.broadcasted_iota(jnp.int32, (h, h), 0)
            + lax.broadcasted_iota(jnp.int32, (h, h), 1) == h - 1)
    flipped = jax.lax.dot_general(
        anti.astype(x.dtype), x[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[None]
    return jnp.where((v == 1) | (v == 3), flipped, x)


@partial(jax.jit, static_argnames=("interpret",))
def fused_gather_extract(patches, base_idx, pidx, interpret=False):
    """Gather + variant-aware 3-channel extraction in ONE Pallas pass.

    The virtual-augmentation static path (preprocess/static_prep.py)
    selects K patches across the rotation variants of M base patches.
    Extract-on-base (``fused_extract_channel_planes``) avoids the ~K/M
    duplicate transcendental work but pays for it in HBM layout
    traffic: it writes 5 full plane sets for every base patch and then
    re-reads 3 planes per selected patch through an XLA gather. This
    kernel instead prefetches ``base_idx`` as scalars and lets each
    grid step DMA exactly the selected base patch, computing the
    extraction chain directly into the K output slots — the planes are
    never materialized and the gather disappears into the block index
    map. Values match ``fused_extract_channel_planes`` followed by the
    plane gather to ~1e-6 (same operations per element; FMA
    contraction differs per program).

    Args:
        patches: (M, H, W) complex64 (or float32, zero imag) BASE
            patches.
        base_idx: (K,) int32 base-patch index per output patch.
        pidx: (K,) int32 gradient-variant selector per output patch
            (0 = fwd/fwd, 1 = down/fwd, 2 = fwd/down).
        interpret: run the Pallas interpreter (CPU testing).

    Returns:
        (grad, log_amp, phase) each (K, H, W) float32, ImageNet-
        normalized, in the untransformed base orientation (the caller
        applies the flip/transpose epilogue).
    """
    if jnp.iscomplexobj(patches):
        re = jnp.real(patches).astype(jnp.float32)
        im = jnp.imag(patches).astype(jnp.float32)
    else:
        re = patches.astype(jnp.float32)
        im = jnp.zeros_like(re)

    _, h, w = re.shape
    k = base_idx.shape[0]
    base_idx = base_idx.astype(jnp.int32)
    pidx = pidx.astype(jnp.int32)

    in_spec = pl.BlockSpec(
        (1, h, w), lambda i, idx, pv: (idx[i], 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, h, w), lambda i, idx, pv: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((k, h, w), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(k,),
        in_specs=[in_spec, in_spec],
        out_specs=(out_spec,) * 3,
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape,) * 3,
        interpret=interpret,
    )(base_idx, pidx, re, im)


def _plane_gather_tf_kernel(gidx_ref, lidx_ref, vidx_ref, grad_ref,
                            logp_ref, phase_ref, g_ref, a_ref, p_ref):
    """Pure-DMA epilogue: the scalar-prefetched indices drive the input
    BlockSpecs (each grid step DMAs exactly the selected plane tiles),
    and the variant flip/transpose happens on the tile in VMEM before
    write-back. No transcendentals — this kernel exists because XLA
    lowers the equivalent gather + where-chain epilogue as multiple
    materialized passes over the (K, p, p) arrays."""
    v = vidx_ref[pl.program_id(0)]
    g_ref[:] = _variant_transform_block(grad_ref[:], v)
    a_ref[:] = _variant_transform_block(logp_ref[:], v)
    p_ref[:] = _variant_transform_block(phase_ref[:], v)


@partial(jax.jit, static_argnames=("interpret",))
def fused_plane_gather_transform(planes, base_idx, pidx, variant,
                                 interpret=False):
    """Gather the selected channel planes AND apply the variant
    flip/transpose in ONE Pallas pass.

    Consumes :func:`fused_extract_channel_planes` output (extraction
    amortized over the M base patches), gathers the K selected patches'
    planes by scalar-prefetched indices and transforms each tile in
    VMEM — the whole static-path epilogue (plane gather, stack select,
    flip/transpose) becomes one kernel whose cost is the unavoidable
    HBM read+write of the K output patches.

    Args:
        planes: (grad3 (3, M, h, w), log_amp (M, h, w), phase (M, h, w)).
        base_idx: (K,) int32 base-patch index per output patch.
        pidx: (K,) int32 gradient-plane selector (_VARIANT_GRAD_PLANE).
        variant: (K,) int32 variant id [orig, flipud, T, flipud.T].

    Returns:
        (grad, log_amp, phase) each (K, h, w) float32 in the variant's
        orientation; the caller stacks to NHWC.
    """
    grad3, logp, phase = planes
    _, m, h, w = grad3.shape
    if h != w:
        raise ValueError("in-kernel variant transform requires square patches")
    k = base_idx.shape[0]
    base_idx = base_idx.astype(jnp.int32)
    gidx = pidx.astype(jnp.int32) * m + base_idx
    variant = variant.astype(jnp.int32)
    gflat = grad3.reshape(3 * m, h, w)

    gspec = pl.BlockSpec(
        (1, h, w), lambda i, gi, li, vi: (gi[i], 0, 0),
        memory_space=pltpu.VMEM,
    )
    lspec = pl.BlockSpec(
        (1, h, w), lambda i, gi, li, vi: (li[i], 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec(
        (1, h, w), lambda i, gi, li, vi: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((k, h, w), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(k,),
        in_specs=[gspec, lspec, lspec],
        out_specs=(out_spec,) * 3,
    )
    return pl.pallas_call(
        _plane_gather_tf_kernel,
        grid_spec=grid_spec,
        out_shape=(out_shape,) * 3,
        interpret=interpret,
    )(gidx, base_idx, variant, gflat,
      logp.astype(jnp.float32), phase.astype(jnp.float32))


@partial(jax.jit, static_argnames=("interpret", "block"))
def fused_extract_channels(patches, interpret=False, block=8):
    """(N, H, W) complex64 -> (N, H, W, 3) float32, ImageNet-normalized.

    ``block`` patches per grid program; every intermediate lives in VMEM
    (8 x 128 x 128 x ~6 f32 buffers ~= 3 MB, well under the 16 MB VMEM).

    Args:
        patches: complex64 (or float32, treated as zero-imag) patches.
        interpret: run the Pallas interpreter (CPU testing).
        block: patches per grid program (N is padded to a multiple).
    """
    if jnp.iscomplexobj(patches):
        re = jnp.real(patches).astype(jnp.float32)
        im = jnp.imag(patches).astype(jnp.float32)
    else:
        re = patches.astype(jnp.float32)
        im = jnp.zeros_like(re)

    n, h, w = re.shape
    block = min(block, n) or 1
    pad = (-n) % block
    if pad:
        re = jnp.concatenate([re, jnp.ones((pad, h, w), re.dtype)], axis=0)
        im = jnp.concatenate([im, jnp.zeros((pad, h, w), im.dtype)], axis=0)
    m = re.shape[0]

    spec = pl.BlockSpec(
        (block, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((m, h, w), jnp.float32)

    grad, amp, phase = pl.pallas_call(
        _kernel,
        grid=(m // block,),
        in_specs=[spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(re, im)
    out = jnp.stack([grad, amp, phase], axis=-1)
    return out[:n] if pad else out
