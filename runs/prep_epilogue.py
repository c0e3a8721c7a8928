"""Epilogue variants of the extract-on-base static prep: after the
planes kernel, the program gathers the selected planes, stacks to NHWC
and applies the per-patch flip/transpose. The where-chain transform on
the stacked (K, p, p, 3) array materializes a transpose + flip of every
image with the channel axis minor; variant B does the identical
permutation per PLANE (K, p, p — lane-friendly 128x128 tiles) before
the stack. Bit-equal outputs (stack commutes with pixel permutations);
this measures which layout XLA lowers faster at the headline shapes.

    python runs/prep_epilogue.py 2>&1 | tee runs/prep_epilogue.log
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.preprocess.static_prep import (
    _VARIANT_GRAD_PLANE,
    _transform_by_variant,
    _transform_by_variant_nhwc,
    variant_remap,
)
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B, C, PATCH, K = 8, 1024, 128, 1920


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _sync(x):
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def timed(fn, *args, iters=8, reps=3):
    for attempt in range(12):
        try:
            out = fn(*args)
            _sync(out)
            break
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            transient = ("RESOURCE_EXHAUSTED" in msg or "500" in msg
                         or "UNAVAILABLE" in msg)
            if not transient:
                raise  # deterministic failure — don't mask it by retrying
            log(f"compile attempt {attempt + 1} failed "
                f"({msg.splitlines()[0][:90]}); retrying in 120 s")
            time.sleep(120)
    else:
        raise RuntimeError("compile never landed after 12 attempts")
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        vals.append((time.perf_counter() - t0) / iters)
    return float(np.median(vals)) * 1e3


def main():
    results = {}
    nh = nw = C // PATCH
    kpp = nh * nw
    n_base = B * kpp
    rng = np.random.default_rng(0)
    grad3 = jnp.asarray(rng.normal(size=(3, n_base, PATCH, PATCH)),
                        jnp.float32)
    logp = jnp.asarray(rng.normal(size=(n_base, PATCH, PATCH)), jnp.float32)
    phase = jnp.asarray(rng.normal(size=(n_base, PATCH, PATCH)), jnp.float32)
    remap = jnp.asarray(variant_remap(nh, nw, 4))
    keep = jnp.arange(K) * (B * 4 * kpp // K)

    def _indices(keep):
        v = (keep // kpp) % 4
        wf_i = keep // (4 * kpp)
        base_idx = wf_i * kpp + jnp.take(remap, v * kpp + (keep % kpp))
        pidx = jnp.take(jnp.asarray(_VARIANT_GRAD_PLANE), v)
        return v, base_idx, pidx

    @jax.jit
    def epi_nhwc(grad3, logp, phase, keep):
        v, base_idx, pidx = _indices(keep)
        g = jnp.take(grad3.reshape(3 * n_base, PATCH, PATCH),
                     pidx * n_base + base_idx, axis=0)
        img = jnp.stack([g, jnp.take(logp, base_idx, axis=0),
                         jnp.take(phase, base_idx, axis=0)], axis=-1)
        return _transform_by_variant_nhwc(img, v)

    @jax.jit
    def epi_planes(grad3, logp, phase, keep):
        v, base_idx, pidx = _indices(keep)
        g = _transform_by_variant(
            jnp.take(grad3.reshape(3 * n_base, PATCH, PATCH),
                     pidx * n_base + base_idx, axis=0), v)
        lp = _transform_by_variant(jnp.take(logp, base_idx, axis=0), v)
        ph = _transform_by_variant(jnp.take(phase, base_idx, axis=0), v)
        return jnp.stack([g, lp, ph], axis=-1)

    a = epi_nhwc(grad3, logp, phase, keep)
    b = epi_planes(grad3, logp, phase, keep)
    assert np.array_equal(np.asarray(a), np.asarray(b)), "variants disagree"

    results["epi_nhwc_ms"] = round(timed(epi_nhwc, grad3, logp, phase, keep), 2)
    log(f"epi_nhwc: {results['epi_nhwc_ms']} ms")
    results["epi_planes_ms"] = round(
        timed(epi_planes, grad3, logp, phase, keep), 2)
    log(f"epi_planes: {results['epi_planes_ms']} ms")

    print(json.dumps(results), flush=True)
    (Path(__file__).parent / "prep_epilogue.json").write_text(
        json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
