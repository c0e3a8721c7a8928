"""Spatially-sharded preprocessing of large waterfalls.

The reference holds whole observations in RAM and tiles them on one
machine (SURVEY.md §5, "long-context"). The TPU-native equivalent
shards a big (channels x times) waterfall ACROSS THE MESH on the
channel axis with ``shard_map``: because the preprocessing stencil is
only the 1-pixel forward-difference gradient and MAD is per-patch,
shard boundaries aligned to patch_size multiples need NO halo exchange
— every device preprocesses its channel slab independently and the
patch results concatenate exactly.

Global (cross-shard) statistics do need communication:
:func:`sharded_global_stats` computes mean/std with ``psum`` and an
exact global median via bit-level binary search with psum'd counts —
the distributed counterpart of the radix-select MAD kernel.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..preprocess import pipeline as PP

__all__ = ["preprocess_sharded", "sharded_global_stats"]


def preprocess_sharded(waterfalls, mesh, patch_size=128, axis="data"):
    """Patchify + 3-channel extraction with the channel axis sharded.

    Args:
        waterfalls: (M, C, T) complex/real; C must be divisible by
            (mesh[axis] * patch_size) so shard boundaries align with the
            patch grid (halo-free).
        mesh: jax.sharding.Mesh.

    Returns:
        (N, patch, patch, 3) images, bit-matching the unsharded
        ``imagenet_normalize(extract_channels(patchify_batch(...)))``
        in canonical (waterfall, row, col) patch order. Channel counts
        that don't divide shards*patch_size are zero-padded up (the
        same padding patchify itself applies) and the padding-only
        patch rows are dropped before returning — no alignment
        precondition on the caller.
    """
    m, c, t = waterfalls.shape
    n_shards = mesh.shape[axis]
    # pad the channel axis so every shard holds a whole number of patch
    # rows; rows beyond the unsharded patch grid are dropped after
    rows = max(1, -(-c // patch_size))
    rows_p = -(-rows // n_shards) * n_shards
    pad_c = rows_p * patch_size - c
    if pad_c:
        waterfalls = jnp.pad(waterfalls, ((0, 0), (0, pad_c), (0, 0)))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(None, axis, None),
        out_specs=P(axis),
        check_vma=False,
    )
    def _shard_fn(wf_slab):
        patches = PP.patchify_batch(wf_slab, patch_size)
        return PP.imagenet_normalize(PP.extract_channels(patches))

    images = _shard_fn(waterfalls)
    # reorder (shard, waterfall, row_in_shard, col) -> canonical and
    # crop the padded patch rows
    rows_per_shard = rows_p // n_shards
    cols = max(1, -(-t // patch_size))
    img = images.reshape(n_shards, m, rows_per_shard, cols, patch_size,
                         patch_size, 3)
    img = jnp.transpose(img, (1, 0, 2, 3, 4, 5, 6))
    img = img.reshape(m, rows_p, cols, patch_size, patch_size, 3)
    return img[:, :rows].reshape(m * rows * cols, patch_size,
                                 patch_size, 3)


def sharded_global_stats(values, mesh, axis="data", median_iters=32):
    """Global mean/std/median over an array sharded on its first axis.

    mean/std ride one ``psum`` each; the median is exact via bit-level
    binary search on the IEEE pattern of non-negative float32 values
    with a psum'd below-count per step — O(32) tiny collectives instead
    of a global sort.
    """
    @partial(shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(),
             check_vma=False)
    def _stats(local):
        flat = local.reshape(-1)
        n = jax.lax.psum(jnp.float32(flat.size), axis)
        total = jax.lax.psum(jnp.sum(flat), axis)
        mean = total / n
        var = jax.lax.psum(jnp.sum((flat - mean) ** 2), axis) / n

        bits = jax.lax.bitcast_convert_type(flat, jnp.uint32)
        k = (n.astype(jnp.int32) - 1) // 2  # lower median rank

        def body(b, prefix):
            cand = prefix | (jnp.uint32(1) << (31 - b).astype(jnp.uint32))
            below = jax.lax.psum(
                jnp.sum((bits < cand).astype(jnp.int32)), axis
            )
            return jnp.where(below <= k, cand, prefix)

        p_lo = jax.lax.fori_loop(0, median_iters, body, jnp.uint32(0))
        k_hi = n.astype(jnp.int32) // 2

        def body_hi(b, prefix):
            cand = prefix | (jnp.uint32(1) << (31 - b).astype(jnp.uint32))
            below = jax.lax.psum(
                jnp.sum((bits < cand).astype(jnp.int32)), axis
            )
            return jnp.where(below <= k_hi, cand, prefix)

        p_hi = jax.lax.fori_loop(0, median_iters, body_hi, jnp.uint32(0))
        median = 0.5 * (
            jax.lax.bitcast_convert_type(p_lo, jnp.float32)
            + jax.lax.bitcast_convert_type(p_hi, jnp.float32)
        )
        return mean, jnp.sqrt(var), median

    sharding = NamedSharding(mesh, P(axis))
    values = jax.device_put(values, sharding)
    mean, std, median = _stats(values)
    return {"mean": float(mean), "std": float(std), "median": float(median)}
