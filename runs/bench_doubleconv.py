"""Fused DoubleConv (Pallas) vs XLA at the UNet decoder-stage shapes
(round-3 VERDICT #9). Amortized timing: 20 chained calls per window,
5 windows, median — single-call timing over the remote tunnel measures
round trips, not device work (BASELINE.md round-3 methodology).

    python runs/bench_doubleconv.py 2>&1 | tee runs/bench_doubleconv.log
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import flax.linen as nn
import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.ops.fused_doubleconv import double_conv_gn_relu

# (batch, H, W, Ci, Co): the decoder-stage shapes of the f=32 flagship
# (dec1 128^2 runs whole-image only at Ci>=128 VMEM budget; the fused
# kernel targets 64^2-and-below per the verdict) plus the f=16 serving
# tier's stages.
SHAPES = [
    (64, 64, 64, 32, 32),
    (64, 64, 64, 64, 64),
    (64, 32, 32, 128, 128),
    (64, 32, 32, 64, 64),
    (64, 16, 16, 128, 128),
]


def _sync(x):
    np.asarray(jax.numpy.asarray(x)[(0,) * x.ndim])


def xla_double_conv(x, w1, g1, b1, w2, g2, b2, num_groups):
    for w, g, b in ((w1, g1, b1), (w2, g2, b2)):
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        xg = x.reshape(x.shape[0], -1, num_groups,
                       x.shape[-1] // num_groups)
        mu = xg.mean(axis=(1, 3), keepdims=True)
        var = ((xg - mu) ** 2).mean(axis=(1, 3), keepdims=True)
        xn = ((xg - mu) * jax.lax.rsqrt(var + 1e-6)).reshape(x.shape)
        x = jnp.maximum(xn * g + b, 0.0)
    return x


def bench_one(n, h, w, ci, co):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, ci)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, ci, co)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.1, (3, 3, co, co)).astype(np.float32))
    g1 = jnp.ones((co,), jnp.float32)
    b1 = jnp.zeros((co,), jnp.float32)
    g2 = jnp.ones((co,), jnp.float32)
    b2 = jnp.zeros((co,), jnp.float32)

    fused = jax.jit(lambda x: double_conv_gn_relu(
        x, w1, g1, b1, w2, g2, b2, num_groups=8))
    ref = jax.jit(lambda x: xla_double_conv(
        x, w1, g1, b1, w2, g2, b2, num_groups=8))

    # numerics sanity on device
    a, b = fused(x), ref(x)
    err = float(jnp.max(jnp.abs(a - b)))

    out = {}
    for name, fn in (("xla", ref), ("fused", fused)):
        y = fn(x)
        _sync(y)
        windows = []
        for _ in range(5):
            t0 = time.perf_counter()
            y = x
            for _ in range(20):
                y = fn(y[..., :ci] if y.shape[-1] != ci else y)
            _sync(y)
            windows.append((time.perf_counter() - t0) / 20 * 1e3)
        out[name + "_ms"] = round(float(np.median(windows)), 3)
    out["maxerr"] = err
    out["fused_vs_xla"] = round(out["xla_ms"] / out["fused_ms"], 3)
    print(f"({n},{h},{w},{ci}->{co}): xla {out['xla_ms']} ms, "
          f"fused {out['fused_ms']} ms, ratio {out['fused_vs_xla']}x, "
          f"maxerr {err:.2e}", flush=True)
    return out


def main():
    results = {}
    for shape in SHAPES:
        key = "x".join(map(str, shape))
        results[key] = bench_one(*shape)
    out = Path(__file__).parent / "bench_doubleconv.json"
    out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
