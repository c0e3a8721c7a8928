"""Pure functional waterfall->patch preprocessing pipeline (jnp).

This module is the semantic reference implementation of the pipeline:
every transform is a pure, statically-shaped, jittable function over
*batched* device arrays. The reference implements the same pipeline as
python loops over lists of numpy arrays with multiprocessing
(rfi_toolbox/preprocessing/preprocessor.py:198-783); here a whole batch
of waterfalls flows through one XLA program, and the only host-side
work is index bookkeeping for the data-dependent steps (blank-patch
removal, shuffling, truncation) so device shapes stay static.

Semantics parity notes (file:line cite the reference):
- rotations: {id, flipud, T, flipud.T} — NOT true rot90s
  (preprocessor.py:413-446); ordering per waterfall is
  [orig, flip, T, flipT].
- patchify: pad with zeros up to multiples of patch_size, row-major
  (channel-blocks outer, time-blocks inner) (preprocessor.py:46-111).
- MAD flags: magnitude -> |x - median| > sigma*MAD, two-sided
  (preprocessor.py:114-136).
- complex 3-channel extraction: gradient(forward-diff of log10|z|,
  min-max per patch), log_amp clipped to the fixed physical window
  [-3, 4] -> [0, 1], phase mapped from [-pi, pi] to [0, 1]
  (preprocessor.py:562-606).
- real fallback: [gradient, min-max log_amp, zeros]
  (preprocessor.py:608-644).
- ImageNet/SAM2 normalization: mean [.485,.456,.406], std
  [.229,.224,.225] (preprocessor.py:765-783).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "patchify",
    "patchify_batch",
    "unpatchify_batch",
    "apply_rotations",
    "extract_channels",
    "extract_channel_planes",
    "imagenet_normalize",
    "mad_flag_patches",
    "static_select_flagged",
    "static_select_from_has",
    "normalize_by_median",
    "apply_stretch",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "LOG_MIN",
    "LOG_MAX",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

# Fixed physical log10-amplitude window: log10(1 mJy noise) .. log10(10^4 Jy)
LOG_MIN = -3.0
LOG_MAX = 4.0


def _pad_to_multiple(x, patch_size):
    """Zero-pad trailing 2 dims up to multiples of patch_size (and at
    least patch_size). Matches preprocessor.py:80-101."""
    h, w = x.shape[-2], x.shape[-1]
    ph = (-h) % patch_size if h >= patch_size else patch_size - h
    pw = (-w) % patch_size if w >= patch_size else patch_size - w
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, ph), (0, pw)]
    return jnp.pad(x, pad, mode="constant", constant_values=0)


def patchify(array, patch_shape, step):
    """2D -> (n_h, n_w, patch_h, patch_w) patch grid.

    API-parity helper for the reference ``patchify`` (preprocessor.py:22-42,
    a torch.unfold wrapper). Non-overlapping steps use a pure
    reshape/transpose; overlapping steps gather strided windows.
    """
    patch_h, patch_w = patch_shape
    array = jnp.asarray(array)
    h, w = array.shape
    n_h = (h - patch_h) // step + 1
    n_w = (w - patch_w) // step + 1
    if step == patch_h == patch_w:
        trimmed = array[: n_h * patch_h, : n_w * patch_w]
        out = trimmed.reshape(n_h, patch_h, n_w, patch_w).transpose(0, 2, 1, 3)
        return out
    row_idx = (jnp.arange(n_h) * step)[:, None] + jnp.arange(patch_h)[None, :]
    col_idx = (jnp.arange(n_w) * step)[:, None] + jnp.arange(patch_w)[None, :]
    return array[row_idx[:, None, :, None], col_idx[None, :, None, :]]


@partial(jax.jit, static_argnames=("patch_size",))
def patchify_batch(waterfalls, patch_size):
    """(B, H, W) -> (B * n_h * n_w, patch, patch), zero-padded.

    Patch order within each waterfall is row-major (channel blocks
    outer), matching the reference's i/j loops (preprocessor.py:105-109).
    """
    x = _pad_to_multiple(waterfalls, patch_size)
    b, h, w = x.shape
    nh, nw = h // patch_size, w // patch_size
    x = x.reshape(b, nh, patch_size, nw, patch_size)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b * nh * nw, patch_size, patch_size)


@partial(jax.jit, static_argnames=("num_waterfalls", "height", "width"))
def unpatchify_batch(patches, num_waterfalls, height, width):
    """Inverse of :func:`patchify_batch`: (B*n_h*n_w, p, p) row-major
    patches -> (B, height, width), cropping the zero padding.

    The reference keeps only ``original_shapes`` metadata and provides
    no reconstruction helper (SURVEY.md §3.5) — this closes that gap so
    inference round trips waterfall -> patches -> masks -> waterfall.
    """
    p = patches.shape[-1]
    nh = -(-height // p)
    nw = -(-width // p)
    x = patches.reshape(num_waterfalls, nh, nw, p, p)
    x = x.transpose(0, 1, 3, 2, 4).reshape(num_waterfalls, nh * p, nw * p)
    return x[:, :height, :width]


def apply_rotations(data, num_rotations):
    """N-way "rotation" augmentation over a batch of 2D waterfalls.

    Args:
        data: (B, H, W) array (B = flattened baselines x pols).
        num_rotations: 1, 2, or 4.

    Returns:
        (group_a, group_b):
          group_a: (B, r_a, H, W) with r_a = 1 or 2 -> [orig(, flipud)]
          group_b: (B, 2, W, H) -> [T, flipud(T)] when num_rotations == 4,
                   else None.
    The split exists because transposed waterfalls have swapped dims;
    square inputs can simply concatenate the groups. Per-waterfall
    ordering [orig, flip, T, flipT] matches preprocessor.py:429-446.
    """
    if num_rotations not in (1, 2, 4):
        raise ValueError(f"num_rotations must be 1, 2, or 4, got {num_rotations}")
    variants_a = [data]
    if num_rotations >= 2:
        variants_a.append(jnp.flip(data, axis=-2))
    group_a = jnp.stack(variants_a, axis=1)
    group_b = None
    if num_rotations == 4:
        t = jnp.swapaxes(data, -1, -2)
        group_b = jnp.stack([t, jnp.flip(t, axis=-2)], axis=1)
    return group_a, group_b


@jax.jit
def _nanminmax_normalize(x):
    """Per-patch min-max normalization over trailing 2 dims; constant
    patches map to zeros (preprocessor.py:596-600)."""
    lo = jnp.nanmin(x, axis=(-2, -1), keepdims=True)
    hi = jnp.nanmax(x, axis=(-2, -1), keepdims=True)
    span = hi - lo
    return jnp.where(span > 0, (x - lo) / jnp.where(span > 0, span, 1.0), 0.0)


@jax.jit
def extract_channels(patches):
    """Batched 3-channel extraction: (N, H, W) -> (N, H, W, 3) float32.

    Complex input -> [gradient, log_amp(fixed window), phase]
    (preprocessor.py:562-606). Real input -> [gradient, min-max
    log_amp, zeros] (preprocessor.py:608-644).
    """
    is_complex = jnp.iscomplexobj(patches)
    amplitude = jnp.abs(patches).astype(jnp.float32)
    log_amp = jnp.log10(amplitude + 1e-10)

    # Forward differences with a zero first row/col (np.diff semantics,
    # preprocessor.py:581-585).
    time_deriv = jnp.pad(jnp.diff(log_amp, axis=-2), ((0, 0), (1, 0), (0, 0)))
    freq_deriv = jnp.pad(jnp.diff(log_amp, axis=-1), ((0, 0), (0, 0), (1, 0)))
    gradient = jnp.sqrt(time_deriv**2 + freq_deriv**2)
    gradient_norm = _nanminmax_normalize(gradient)

    if is_complex:
        phase = jnp.angle(patches).astype(jnp.float32)
        log_amp_norm = jnp.clip((log_amp - LOG_MIN) / (LOG_MAX - LOG_MIN), 0.0, 1.0)
        phase_norm = (phase + jnp.pi) / (2.0 * jnp.pi)
    else:
        log_amp_norm = _nanminmax_normalize(log_amp)
        phase_norm = jnp.zeros_like(log_amp)

    return jnp.stack([gradient_norm, log_amp_norm, phase_norm], axis=-1)


@jax.jit
def extract_channel_planes(patches):
    """Variant-aware channel planes on BASE patches: everything
    :func:`extract_channels` needs for all four rotation variants,
    computed ONCE per base patch and already ImageNet-normalized.

    The virtual-augmentation static path (static_prep) selects K
    patches across the {id, flipud, T, flipud.T} variants of M base
    patches; with 4-way augmentation K is typically ~4x M, so running
    the transcendental extraction chain AFTER the gather does ~4x the
    work. Everything in :func:`extract_channels` commutes with the
    flip/transpose EXCEPT the gradient's np.diff edge zeroing — the
    forward difference of a flipped patch is the opposite-edge-zeroed
    difference of the base patch, flipped. Since the gradient squares
    the differences (sign-free) and min/max reductions are order-exact,
    three gradient planes cover all four variants BIT-exactly:

      g[0] = sqrt(td_fwd^2 + fd_fwd^2)   variants id and T
      g[1] = sqrt(td_down^2 + fd_fwd^2)  variant flipud
      g[2] = sqrt(td_fwd^2 + fd_down^2)  variant flipud.T

    where td/fd are the time/freq forward differences zero-padded at
    the leading (fwd) or trailing (down) edge. The caller gathers the
    right plane per selected patch and applies the flip/transpose to
    the OUTPUT (preprocess/static_prep.py), giving images identical to
    transform-then-extract.

    Returns:
        (grad3, log_amp, phase): (3, N, H, W), (N, H, W), (N, H, W)
        float32, each already through its channel's ImageNet affine.
        Real input gets the min-max log_amp + zeros phase of
        :func:`extract_channels`'s real fallback.
    """
    is_complex = jnp.iscomplexobj(patches)
    amplitude = jnp.abs(patches).astype(jnp.float32)
    log_amp = jnp.log10(amplitude + 1e-10)

    d_t = jnp.diff(log_amp, axis=-2)
    d_f = jnp.diff(log_amp, axis=-1)
    td_fwd = jnp.pad(d_t, ((0, 0), (1, 0), (0, 0)))
    td_down = jnp.pad(d_t, ((0, 0), (0, 1), (0, 0)))
    fd_fwd = jnp.pad(d_f, ((0, 0), (0, 0), (1, 0)))
    fd_down = jnp.pad(d_f, ((0, 0), (0, 0), (0, 1)))
    grad3 = jnp.stack(
        [
            jnp.sqrt(td_fwd**2 + fd_fwd**2),
            jnp.sqrt(td_down**2 + fd_fwd**2),
            jnp.sqrt(td_fwd**2 + fd_down**2),
        ]
    )
    grad3 = _nanminmax_normalize(grad3)

    if is_complex:
        log_norm = jnp.clip((log_amp - LOG_MIN) / (LOG_MAX - LOG_MIN), 0.0, 1.0)
        phase = jnp.angle(patches).astype(jnp.float32)
        phase_norm = (phase + jnp.pi) / (2.0 * jnp.pi)
    else:
        log_norm = _nanminmax_normalize(log_amp)
        phase_norm = jnp.zeros_like(log_amp)

    grad3 = (grad3 - IMAGENET_MEAN[0]) / IMAGENET_STD[0]
    log_norm = (log_norm - IMAGENET_MEAN[1]) / IMAGENET_STD[1]
    phase_norm = (phase_norm - IMAGENET_MEAN[2]) / IMAGENET_STD[2]
    return grad3, log_norm, phase_norm


@jax.jit
def imagenet_normalize(images):
    """SAM2/ImageNet per-channel normalization of (..., 3) images."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (images - mean) / std


@partial(jax.jit, static_argnames=())
def mad_flag_patches(patches, sigma):
    """Per-patch two-sided MAD threshold flags.

    (N, H, W) -> (N, H, W) bool; complex input uses magnitude
    (preprocessor.py:114-136). NaNs are ignored in the median/MAD
    (nan_policy='omit') and never flagged.
    """
    mag = jnp.abs(patches).astype(jnp.float32) if jnp.iscomplexobj(patches) else patches
    n = mag.shape[0]
    flat = mag.reshape(n, -1)
    median = jnp.nanmedian(flat, axis=1, keepdims=True)
    mad = jnp.nanmedian(jnp.abs(flat - median), axis=1, keepdims=True)
    upper = median + mad * sigma
    lower = median - mad * sigma
    flags = (flat > upper) | (flat < lower)
    return flags.reshape(mag.shape)


@partial(jax.jit, static_argnames=("k",))
def static_select_flagged(flag_patches, k, key):
    """Device-side blank-patch removal with a STATIC output count.

    The reference removes blank patches by data-dependent boolean
    indexing (preprocessor.py:338-367), which on an accelerator forces a
    host readback of the per-patch any-flag vector every pipeline
    iteration — on a remote TPU that blocking round trip is the single
    host sync in the steady-state training pipeline. This variant keeps
    the whole step on device by fixing the kept-patch count ``k`` at
    trace time:

    - flagged patches are selected first (stable original order);
    - if fewer than ``k`` patches are flagged, the flagged set is
      repeated cyclically to fill (the padding semantics of
      ``create_dataset(pad_to_multiple=...)``);
    - if none are flagged, all patches cycle (the reference's
      "keeping all patches" fallback, warning elided — emitting it
      would require the very host sync this path removes);
    - if more than ``k`` are flagged, the surplus is dropped (the
      semantics of ``num_patches`` truncation).

    Returns (k,) int32 patch indices, shuffled with ``key``.
    """
    has = jnp.any(flag_patches, axis=tuple(range(1, flag_patches.ndim)))
    return static_select_from_has(has, k, key)


@partial(jax.jit, static_argnames=("k",))
def static_select_from_has(has, k, key):
    """Core of :func:`static_select_flagged` on a precomputed (N,) bool
    any-flag vector (the virtual-augmentation path builds ``has`` by
    index remap without materializing the augmented patches —
    :mod:`rfi_toolbox_tpu.preprocess.static_prep`)."""
    n = has.shape[0]
    order = jnp.argsort(jnp.where(has, 0, 1), stable=True)
    n_f = has.sum()
    denom = jnp.maximum(jnp.where(n_f > 0, n_f, n), 1)
    kept = jnp.take(order, jnp.arange(k) % denom)
    return jax.random.permutation(key, kept)


@jax.jit
def normalize_by_median(patches):
    """Divide each patch by its nanmedian if the median is > 0
    (preprocessor.py:646-670). Complex input -> magnitude first."""
    mag = jnp.abs(patches).astype(jnp.float32) if jnp.iscomplexobj(patches) else patches
    n = mag.shape[0]
    med = jnp.nanmedian(mag.reshape(n, -1), axis=1).reshape(n, 1, 1)
    return jnp.where(med > 0, mag / jnp.where(med > 0, med, 1.0), mag)


@partial(jax.jit, static_argnames=("stretch",))
def apply_stretch(patches, stretch):
    """SQRT or LOG10 stretch of |patches|, with infinities replaced by
    the per-patch MAD of finite values (preprocessor.py:672-706)."""
    mag = jnp.abs(patches).astype(jnp.float32)
    if stretch == "SQRT":
        out = jnp.sqrt(mag)
    elif stretch == "LOG10":
        out = jnp.log10(mag)
    else:
        raise ValueError(f"Invalid stretch '{stretch}'. Use 'SQRT' or 'LOG10'")
    n = out.shape[0]
    flat = out.reshape(n, -1)
    finite = jnp.isfinite(flat)
    # MAD over finite entries (static-shape masked median; all-infinite
    # patches fall back to 0, matching reference :701-702).
    inf_masked = jnp.where(finite, flat, jnp.inf)
    count = jnp.sum(finite, axis=1)
    sorted_vals = jnp.sort(inf_masked, axis=1)
    safe = jnp.maximum(count, 1)
    idx_lo = jnp.maximum((safe - 1) // 2, 0)
    idx_hi = safe // 2
    med = 0.5 * (
        jnp.take_along_axis(sorted_vals, idx_lo[:, None], axis=1)
        + jnp.take_along_axis(sorted_vals, idx_hi[:, None], axis=1)
    )
    absdev = jnp.where(finite, jnp.abs(flat - med), jnp.inf)
    sorted_dev = jnp.sort(absdev, axis=1)
    mad = 0.5 * (
        jnp.take_along_axis(sorted_dev, idx_lo[:, None], axis=1)
        + jnp.take_along_axis(sorted_dev, idx_hi[:, None], axis=1)
    )
    fill = jnp.where(count[:, None] > 0, mad, 0.0)
    flat = jnp.where(jnp.isinf(flat), fill, flat)
    return flat.reshape(out.shape)
