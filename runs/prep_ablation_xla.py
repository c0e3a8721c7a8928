"""XLA-only stages of the prep ablation (runs while the remote compile
service is refusing fresh Pallas compiles — see prep_ablation.log):
the plane-gather/stack/transform epilogue of the extract-before path,
the jnp extraction on 1920 gathered patches, and the full static
programs with use_pallas=False.

    python runs/prep_ablation_xla.py 2>&1 | tee runs/prep_ablation_xla.log
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.preprocess import pipeline as P
from rfi_toolbox_tpu.preprocess.static_prep import (
    _VARIANT_GRAD_PLANE,
    _transform_by_variant,
    _transform_by_variant_nhwc,
    make_static_prep_fn,
    variant_remap,
)
from rfi_toolbox_tpu.synth import make_sample_generator
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B, C, T, PATCH, K = 8, 1024, 1024, 128, 1920


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _sync(x):
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def timed(fn, *args, iters=8, reps=3):
    for attempt in range(6):
        try:
            out = fn(*args)
            _sync(out)
            break
        except Exception as e:  # noqa: BLE001
            log(f"compile attempt {attempt + 1} failed "
                f"({str(e).splitlines()[0][:90]}); retrying in 120 s")
            time.sleep(120)
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
    gen = jax.jit(lambda k: jax.vmap(sample_fn)(jax.random.split(k, B)))
    wf, mask, _ = gen(jax.random.key(0))
    _sync(wf.real)
    flat = wf.reshape(B, C, T)
    flag_flat = mask.reshape(B, C, T)

    base = jax.jit(lambda x: P.patchify_batch(x, PATCH))(flat)
    _sync(base.real)
    results["patchify_ms"] = round(
        timed(jax.jit(lambda x: P.patchify_batch(x, PATCH).real), flat), 2)
    log(f"patchify: {results['patchify_ms']} ms")

    nh = nw = C // PATCH
    kpp = nh * nw
    remap = jnp.asarray(variant_remap(nh, nw, 4))
    keep = (jnp.arange(K) * 7919) % (B * 4 * kpp)  # spread-out indices

    # jnp planes on base (the XLA form of the planes kernel)
    planes_fn = jax.jit(P.extract_channel_planes)
    planes = planes_fn(base)
    _sync(planes[1])
    results["planes512_xla_ms"] = round(timed(planes_fn, base), 2)
    log(f"planes512 (jnp): {results['planes512_xla_ms']} ms")

    @jax.jit
    def gather_tf(grad3, logp, phase, keep):
        n_base = logp.shape[0]
        v = (keep // kpp) % 4
        wf_i = keep // (4 * kpp)
        base_idx = wf_i * kpp + jnp.take(remap, v * kpp + (keep % kpp))
        pidx = jnp.take(jnp.asarray(_VARIANT_GRAD_PLANE), v)
        gsel = jnp.take(grad3.reshape(3 * n_base, PATCH, PATCH),
                        pidx * n_base + base_idx, axis=0)
        img = jnp.stack([gsel, jnp.take(logp, base_idx, axis=0),
                         jnp.take(phase, base_idx, axis=0)], axis=-1)
        return _transform_by_variant_nhwc(img, v)

    results["gather_tf_ms"] = round(timed(gather_tf, *planes, keep), 2)
    log(f"gather+stack+nhwc-transform: {results['gather_tf_ms']} ms")

    # components of the epilogue
    @jax.jit
    def gather_only(grad3, logp, phase, keep):
        n_base = logp.shape[0]
        v = (keep // kpp) % 4
        wf_i = keep // (4 * kpp)
        base_idx = wf_i * kpp + jnp.take(remap, v * kpp + (keep % kpp))
        pidx = jnp.take(jnp.asarray(_VARIANT_GRAD_PLANE), v)
        gsel = jnp.take(grad3.reshape(3 * n_base, PATCH, PATCH),
                        pidx * n_base + base_idx, axis=0)
        return jnp.stack([gsel, jnp.take(logp, base_idx, axis=0),
                          jnp.take(phase, base_idx, axis=0)], axis=-1)

    results["gather_stack_ms"] = round(timed(gather_only, *planes, keep), 2)
    log(f"gather+stack only: {results['gather_stack_ms']} ms")

    img = gather_only(*planes, keep)
    _sync(img)
    v = (keep // kpp) % 4

    @jax.jit
    def tf_only(img, v):
        return _transform_by_variant_nhwc(img, v)

    results["nhwc_transform_ms"] = round(timed(tf_only, img, v), 2)
    log(f"nhwc transform only: {results['nhwc_transform_ms']} ms")

    # old-path epilogue: complex gather + transform + jnp extraction
    @jax.jit
    def old_epilogue(base, keep):
        v = (keep // kpp) % 4
        wf_i = keep // (4 * kpp)
        base_idx = wf_i * kpp + jnp.take(remap, v * kpp + (keep % kpp))
        src = _transform_by_variant(jnp.take(base, base_idx, axis=0), v)
        return P.imagenet_normalize(P.extract_channels(src))

    results["old_epilogue_xla_ms"] = round(timed(old_epilogue, base, keep), 2)
    log(f"old epilogue (complex gather+tf+jnp extract): "
        f"{results['old_epilogue_xla_ms']} ms")

    # full static programs, XLA extraction
    key = jax.random.key(5)
    for name, kw in (
        ("full_base_xla", dict(extract="base", return_patches=False)),
        ("full_gathered_xla", dict(extract="gathered", return_patches=True)),
    ):
        fn = make_static_prep_fn(PATCH, K, 4, flags_mode="custom",
                                 use_pallas=False, **kw)
        results[f"{name}_ms"] = round(
            timed(lambda fn=fn: fn(flat, flag_flat, key)[0]), 2)
        log(f"{name}: {results[f'{name}_ms']} ms")

    print(json.dumps(results), flush=True)
    (Path(__file__).parent / "prep_ablation_xla.json").write_text(
        json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
