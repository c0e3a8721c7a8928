"""Prototype experiments for cutting prep's device cost (round 4).

prep_phase_breakdown.json: aug+patchify(complex) 22.3 ms +
fused_channels 18.5 ms dominate the 55.8 ms standalone prep. Candidates:

  A. one-jit: the existing materialized chain compiled as ONE program
     (XLA fuses the flip/stack/transpose layout chain instead of
     materializing each dispatch).
  B. virtual-aug: patchify ONCE (512 base patches), build the virtual
     4x-augmented flag vector by index remap (any-flag is flip/T
     invariant), static-select, gather K BASE patches, apply the
     per-patch flip/T AFTER the gather (K patches, not 2048).
  C. fused_channels block-size ladder (DMA pipelining).
  D. jnp extract_channels under jit vs the Pallas kernel.

Each timed with hard host-readback fences, median of 3 reps x 6 iters.
    python runs/fused_prep_experiments.py 2>&1 | tee runs/fused_prep_experiments.log
"""

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.ops import fused_extract_channels
from rfi_toolbox_tpu.preprocess import preprocessor as PP
from rfi_toolbox_tpu.preprocess import pipeline as P
from rfi_toolbox_tpu.synth import make_sample_generator
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B, C, T, PATCH = 8, 1024, 1024, 128
K = 1920

sample_fn = make_sample_generator(
    C, T, noise_level=1.0, rfi_power_min=1000.0, rfi_power_max=10000.0,
    rfi_config={
        "narrowband_persistent": {"count": 20},
        "broadband_persistent": {"count": 5},
        "narrowband_bursty": {"count": 20},
        "broadband_bursty": {"count": 5},
        "frequency_sweep": {"count": 1},
    },
    num_polarizations=1,
)
batch_gen = jax.jit(jax.vmap(sample_fn))


def _sync(x):
    leaf = jnp.asarray(x)
    if jnp.iscomplexobj(leaf):
        leaf = leaf.real
    return np.asarray(leaf.reshape(-1)[0])


# ---------------------------------------------------------------- A: one-jit
@partial(jax.jit, static_argnames=("k",))
def prep_onejit(wf, mask, key, k):
    flat = wf.reshape(-1, C, T).astype(jnp.complex64)
    patches, _ = PP._augment_and_patchify(flat, PATCH, 4, True)
    mflat = mask.reshape(-1, C, T).astype(jnp.float32)
    fp, _ = PP._augment_and_patchify(mflat, PATCH, 4, True)
    fp = fp > 0
    keep = P.static_select_flagged(fp, k, key)
    patches = jnp.take(patches, keep, axis=0)
    fp = jnp.take(fp, keep, axis=0)
    images = fused_extract_channels(patches)
    return images, fp.astype(jnp.uint8)


# ------------------------------------------------------------ B: virtual aug
def _variant_remap(nh, nw):
    """(4, nh*nw) int32: base patch index for each virtual-variant patch
    index, variants [orig, flip, T, flipT] (preprocessor.py:429-446).

    flip(W) patch (i,j)    = flipud(base patch (nh-1-i, j))
    T(W) patch (i,j)       = (base patch (j, i)).T          [grid (nw, nh)]
    flip(T(W)) patch (i,j) = flipud((base patch (j, nw-1-i)).T)
    """
    i, j = np.divmod(np.arange(nh * nw), nw)
    orig = i * nw + j
    flip = (nh - 1 - i) * nw + j
    # transposed grid is (nw, nh): virtual index p = i*nh + j, i<nw, j<nh
    ti, tj = np.divmod(np.arange(nw * nh), nh)
    t = tj * nw + ti
    flipt = tj * nw + (nw - 1 - ti)
    return np.stack([orig, flip, t, flipt]).astype(np.int32)


@partial(jax.jit, static_argnames=("k",))
def prep_virtual(wf, mask, key, k):
    m = wf.shape[0] * wf.shape[1]
    flat = wf.reshape(m, C, T).astype(jnp.complex64)
    mflat = mask.reshape(m, C, T)
    nh, nw = C // PATCH, T // PATCH
    kpp = nh * nw
    base = P.patchify_batch(flat, PATCH)                     # (m*kpp, p, p)
    base_f = P.patchify_batch(mflat.astype(jnp.float32), PATCH) > 0

    base_any = jnp.any(base_f.reshape(m, kpp, -1), axis=-1)  # (m, kpp)
    remap = jnp.asarray(_variant_remap(nh, nw))              # (4, kpp)
    # virtual index = (wf*4 + v)*kpp + p  -> has[(wf, v, p)]
    has = jnp.take(base_any, remap, axis=1)                  # (m, 4, kpp)
    has = has.reshape(m * 4 * kpp)

    order = jnp.argsort(jnp.where(has, 0, 1), stable=True)
    n_f = has.sum()
    denom = jnp.maximum(jnp.where(n_f > 0, n_f, has.shape[0]), 1)
    kept = jnp.take(order, jnp.arange(k) % denom)
    kept = jax.random.permutation(key, kept)

    v = (kept // kpp) % 4
    wf_i = kept // (4 * kpp)
    base_idx = wf_i * kpp + jnp.take(remap, (v * kpp) + (kept % kpp))

    px = jnp.take(base, base_idx, axis=0)                    # (k, p, p)
    fx = jnp.take(base_f, base_idx, axis=0)
    is_t = (v >= 2)[:, None, None]
    is_f = ((v == 1) | (v == 3))[:, None, None]
    px = jnp.where(is_t, jnp.swapaxes(px, 1, 2), px)
    px = jnp.where(is_f, px[:, ::-1, :], px)
    fx = jnp.where(is_t, jnp.swapaxes(fx, 1, 2), fx)
    fx = jnp.where(is_f, fx[:, ::-1, :], fx)
    images = fused_extract_channels(px)
    return images, fx.astype(jnp.uint8)


# -------------------------------------------------------------- C/D variants
@jax.jit
def extract_jnp(patches):
    return P.imagenet_normalize(P.extract_channels(patches))


def timed(fn, iters=6, reps=3):
    vals = []
    for r in range(reps):
        t0 = time.perf_counter()
        for i in range(iters):
            out = fn(1000 * r + i)
        _sync(jax.tree.leaves(out)[0])
        vals.append((time.perf_counter() - t0) / iters)
    return float(np.median(vals)) * 1e3


def main():
    wf, mask, _ = batch_gen(jax.random.split(jax.random.key(0), B))
    _sync(wf)

    results = {}

    # existing multi-dispatch baseline (phases 2-6 of the breakdown)
    def baseline(i):
        key = jax.random.key(i)
        flat = wf.reshape(-1, C, T).astype(jnp.complex64)
        patches, _ = PP._augment_and_patchify(flat, PATCH, 4, True)
        mflat = mask.reshape(-1, C, T).astype(jnp.float32)
        fp, _ = PP._augment_and_patchify(mflat, PATCH, 4, True)
        fp = fp > 0
        keep = P.static_select_flagged(fp, K, key)
        p = jnp.take(patches, keep, axis=0)
        f = jnp.take(fp, keep, axis=0)
        return fused_extract_channels(p), f.astype(jnp.uint8)

    _sync(jax.tree.leaves(baseline(0))[0])
    results["baseline_multidispatch_ms"] = round(timed(baseline), 2)
    print("baseline:", results["baseline_multidispatch_ms"], "ms", flush=True)

    imgs0, lbl0 = prep_onejit(wf, mask, jax.random.key(5), K)
    a = np.sort(np.asarray(jnp.sum(imgs0.reshape(K, -1), axis=1)))
    results["onejit_ms"] = round(
        timed(lambda i: prep_onejit(wf, mask, jax.random.key(i), K)), 2)
    print("one-jit:", results["onejit_ms"], "ms", flush=True)
    del imgs0, lbl0

    imgs1, lbl1 = prep_virtual(wf, mask, jax.random.key(5), K)
    b = np.sort(np.asarray(jnp.sum(imgs1.reshape(K, -1), axis=1)))
    results["virtual_ms"] = round(
        timed(lambda i: prep_virtual(wf, mask, jax.random.key(i), K)), 2)
    print("virtual-aug:", results["virtual_ms"], "ms", flush=True)
    del imgs1, lbl1

    # parity: one-jit (same ops as production) vs virtual-aug — compare
    # SORTED per-patch sums (same kept multiset; permutation orders
    # differ because the virtual path permutes virtual indices)
    results["virtual_parity_maxdiff"] = float(np.max(np.abs(a - b)))
    print("parity maxdiff (sorted patch sums):",
          results["virtual_parity_maxdiff"], flush=True)

    # C: fused kernel block ladder on a device-resident K-patch array
    flat = wf.reshape(-1, C, T).astype(jnp.complex64)
    patches, _ = PP._augment_and_patchify(flat, PATCH, 4, True)
    px = patches[:K]
    _sync(px)
    for blk in (4, 8, 16, 32):
        f = jax.jit(lambda x, b=blk: fused_extract_channels(x, block=b))
        _sync(f(px))
        results[f"fused_channels_block{blk}_ms"] = round(
            timed(lambda i, f=f: f(px)), 2)
        print(f"fused block={blk}:",
              results[f"fused_channels_block{blk}_ms"], "ms", flush=True)

    _sync(extract_jnp(px))
    results["extract_jnp_ms"] = round(timed(lambda i: extract_jnp(px)), 2)
    print("jnp extract:", results["extract_jnp_ms"], "ms", flush=True)

    print(json.dumps(results), flush=True)
    (Path(__file__).parent / "fused_prep_experiments.json").write_text(
        json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
