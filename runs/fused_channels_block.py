"""fused_extract_channels block-size ladder on the headline shape
(K=1920 patches of 128^2 complex64). The kernel processes `block`
patches per grid program; more patches per step amortize DMA issue at
the cost of VMEM. Also times the jnp/XLA extraction for reference.

Staged warmups with a fence after each compile (back-to-back cold
dispatch of the whole chain OOMs the remote backend — CLAUDE.md).
    python runs/fused_channels_block.py 2>&1 | tee runs/fused_channels_block.log
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.ops import fused_extract_channels
from rfi_toolbox_tpu.preprocess import pipeline as P
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

K, H = 1920, 128


def _sync(x):
    return np.asarray(jnp.asarray(x).reshape(-1)[0])


def timed(fn, iters=8, reps=3):
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        _sync(out)
        vals.append((time.perf_counter() - t0) / iters)
    return float(np.median(vals)) * 1e3


def main():
    # complex must be BUILT inside jit: eager ops that materialize a
    # python complex constant hit the axon backend's unimplemented
    # complex host->device transfer (CLAUDE.md)
    @jax.jit
    def make_px(key):
        re = jax.random.normal(key, (K, H, H), jnp.float32)
        im = jax.random.normal(jax.random.fold_in(key, 1), (K, H, H),
                               jnp.float32)
        return (re + 1j * im).astype(jnp.complex64)

    px = make_px(jax.random.key(0))
    _sync(jnp.abs(px))

    results = {}
    for blk in (4, 8, 16, 32, 64):
        f = jax.jit(lambda x, b=blk: fused_extract_channels(x, block=b))
        _sync(f(px))  # compile + fence before timing
        results[f"pallas_block{blk}_ms"] = round(timed(lambda: f(px)), 2)
        print(f"block={blk}: {results[f'pallas_block{blk}_ms']} ms",
              flush=True)

    g = jax.jit(lambda x: P.imagenet_normalize(P.extract_channels(x)))
    _sync(g(px))
    results["xla_jnp_ms"] = round(timed(lambda: g(px)), 2)
    print("jnp/XLA:", results["xla_jnp_ms"], "ms", flush=True)

    print(json.dumps(results), flush=True)
    (Path(__file__).parent / "fused_channels_block.json").write_text(
        json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
