"""Stage-level ablation of the fused static prep at headline shapes
(B=8 waterfalls 1024^2 complex, K=1920 patches of 128^2), to find where
the ~45 ms/iter of prep device time actually goes after the
extract-before-gather change landed measured-neutral (runs/
prep_cost.json: 44.3 -> 45.2 ms).

Times, each jitted standalone with a host-readback fence:
  gen        on-device generation of the 8 waterfalls
  planes512  fused_extract_channel_planes on the 512 base patches
  kernel1920 fused_extract_channels on 1920 gathered patches (old path)
  gather_tf  plane gather + NHWC stack + variant transform (new path's
             post-kernel stage)
  full_base  the whole static fn, extract='base', return_patches=False
  full_gath  the whole static fn, extract='gathered', return_patches=True
  blockN     fused_extract_channels block ladder on 1920 patches
  planes_blockN  fused_extract_channel_planes block ladder on 512

Staged warmups with a fence after each compile (back-to-back cold
dispatches OOM the remote backend — CLAUDE.md).
    python runs/prep_ablation.py 2>&1 | tee runs/prep_ablation.log
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.ops import (
    fused_extract_channel_planes,
    fused_extract_channels,
    fused_gather_extract,
)
from rfi_toolbox_tpu.preprocess import pipeline as P
from rfi_toolbox_tpu.preprocess.static_prep import (
    _VARIANT_GRAD_PLANE,
    _transform_by_variant_nhwc,
    make_static_prep_fn,
    variant_remap,
)
from rfi_toolbox_tpu.synth import make_sample_generator
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B, C, T, PATCH, K = 8, 1024, 1024, 128, 1920


RESULTS_PATH = Path(__file__).parent / "prep_ablation.json"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _sync(x):
    return np.asarray(jax.tree.leaves(x)[0].reshape(-1)[0])


def timed(fn, *args, iters=8, reps=3, attempts=3):
    # the remote compile service intermittently fails fresh compiles
    # with RESOURCE_EXHAUSTED / HTTP 500 for stretches (CLAUDE.md) —
    # retry the compile+fence until it lands
    for attempt in range(attempts):
        try:
            out = fn(*args)
            _sync(out)  # compile + fence
            break
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            transient = ("RESOURCE_EXHAUSTED" in msg or "500" in msg
                         or "UNAVAILABLE" in msg)
            if not transient:
                raise  # deterministic failure (e.g. Mosaic lowering)
            if attempt + 1 >= attempts:
                raise RuntimeError(
                    f"compile never landed after {attempts} attempts "
                    f"({msg.splitlines()[0][:80]})"
                ) from e
            log(f"compile attempt {attempt + 1} failed "
                f"({msg.splitlines()[0][:100]}); retrying in 120 s")
            time.sleep(120)
    else:
        raise RuntimeError(f"compile never landed after {attempts} attempts")
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        vals.append((time.perf_counter() - t0) / iters)
    return float(np.median(vals)) * 1e3


def main():
    # resumable: stages already in the JSON (from a prior run killed by
    # a compile-service outage) are skipped; every stage writes through.
    # Round-5 finding: fresh compiles fail with persistent
    # RESOURCE_EXHAUSTED *from a process that has already run several
    # programs*, while a brand-new process compiles the same shapes in
    # ~2 s — so each new stage runs in its own process: after
    # RFI_MAX_NEW_STAGES (default 1) completed stages the script exits
    # with code 3 ("more stages remain") and the wrapper relaunches it.
    results = json.loads(RESULTS_PATH.read_text()) if RESULTS_PATH.exists() else {}
    max_new = int(os.environ.get("RFI_MAX_NEW_STAGES", 1))
    new_done = [0]
    transient_failures = [0]

    def stage(key, thunk, optional=False):
        """optional=True: a compile failure is skipped for this launch
        (transient RESOURCE_EXHAUSTED/500: logged only, retried by the
        next fresh-process launch; deterministic errors e.g. Mosaic
        lowering rejections: persisted as an _error entry)."""
        if key in results or f"{key}_error" in results:
            log(f"{key}: {results.get(key, 'error')} (cached)")
            return
        try:
            results[key] = round(thunk(), 2)
        except Exception as e:  # noqa: BLE001
            if not optional:
                raise
            msg = str(e).splitlines()[0][:160]
            transient = ("RESOURCE_EXHAUSTED" in msg or "500" in msg
                         or "UNAVAILABLE" in msg
                         or "never landed" in msg)
            if transient:
                transient_failures[0] += 1
                log(f"{key} transient failure (will retry next launch): "
                    f"{msg}")
                return
            results[f"{key}_error"] = msg
            log(f"{key} failed deterministically: {msg}")
        RESULTS_PATH.write_text(json.dumps(results, indent=1))
        if key in results:
            log(f"{key}: {results[key]} ms")
        new_done[0] += 1
        if new_done[0] >= max_new:
            log(f"{new_done[0]} new stage(s) done — exiting for a fresh "
                "process (rc=3)")
            sys.exit(3)
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
    stage("gen_ms", lambda: timed(lambda k: gen(k)[0].real,
                                  jax.random.key(1)))

    flat = wf.reshape(B, C, T)
    flag_flat = mask.reshape(B, C, T)

    base = jax.jit(lambda x: P.patchify_batch(x, PATCH))(flat)
    _sync(base.real)

    # stage: planes kernel on 512 base patches (block ladder; 32 blows
    # the 16 MB scoped-VMEM stack and is clamped to 16 in the kernel)
    for blk in (4, 8, 16):
        f = jax.jit(lambda x, b=blk: fused_extract_channel_planes(x, block=b))
        stage(f"planes512_block{blk}_ms", lambda f=f: timed(f, base))

    # HALF-SCALE full programs (B=4, K=960): the compile service has
    # rejected every full-scale (K=1920) prep-class program since
    # ~12:12 while accepting the (larger-FLOP) training programs — if
    # size is the trigger these land and give the breakdown by
    # 2-point scaling; if structure is the trigger they fail too,
    # which is itself diagnostic
    key = jax.random.key(5)
    flat4, flag4 = flat[:4], flag_flat[:4]
    for name, kw in (
        ("full_base_b4k960", dict(extract="base", return_patches=False)),
        ("full_planes_b4k960", dict(extract="planes", return_patches=False)),
    ):
        fnh = make_static_prep_fn(PATCH, 960, 4, flags_mode="custom",
                                  use_pallas=True, **kw)
        stage(f"{name}_ms",
              lambda fnh=fnh: timed(lambda: fnh(flat4, flag4, key)[0],
                                    attempts=1),
              optional=True)

    # 2/3-scale points (B=8, K=1280): a second scaling point below the
    # service's rejection cliff tightens the full-scale extrapolation
    for name, kw in (
        ("full_planes_b8k1280", dict(extract="planes",
                                     return_patches=False)),
        ("full_base_b8k1280", dict(extract="base", return_patches=False)),
    ):
        fnh = make_static_prep_fn(PATCH, 1280, 4, flags_mode="custom",
                                  use_pallas=True, **kw)
        stage(f"{name}_ms",
              lambda fnh=fnh: timed(lambda: fnh(flat, flag_flat, key)[0],
                                    attempts=1),
              optional=True)

    # PRIORITY ORDER: one failed big compile poisons the process, so
    # each launch gets exactly ONE real attempt — the first uncached
    # stage below. full_planes (the round-5 Pallas-epilogue candidate,
    # smallest peak buffers, most likely below the service's rejection
    # cliff) goes first.
    key = jax.random.key(5)
    fnp = make_static_prep_fn(PATCH, K, 4, flags_mode="custom",
                              use_pallas=True, extract="planes",
                              return_patches=False)
    stage("full_planes_ms",
          lambda: timed(lambda: fnp(flat, flag_flat, key)[0], attempts=1),
          optional=True)

    # stage: plane gather + stack + NHWC transform (new path epilogue)
    nh = nw = C // PATCH
    kpp = nh * nw
    remap = jnp.asarray(variant_remap(nh, nw, 4))

    @jax.jit
    def gather_tf(planes, keep):
        grad3, logp, phase = planes
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

    planes = jax.jit(fused_extract_channel_planes)(base)
    _sync(planes[1])
    keep = jnp.arange(K) * (B * 4 * kpp // K)

    # round-5 candidate: the pure-DMA Pallas epilogue (plane gather +
    # in-VMEM variant transform) replacing the XLA gather+where chain
    from rfi_toolbox_tpu.ops import fused_plane_gather_transform

    @jax.jit
    def plane_kernel_tf(planes, keep):
        v = (keep // kpp) % 4
        wf_i = keep // (4 * kpp)
        base_idx = wf_i * kpp + jnp.take(remap, v * kpp + (keep % kpp))
        pidx = jnp.take(jnp.asarray(_VARIANT_GRAD_PLANE), v)
        g, lp, ph = fused_plane_gather_transform(planes, base_idx, pidx, v)
        return jnp.stack([g, lp, ph], axis=-1)

    # half-K epilogue stages (same planes, 960 outputs) for 2-point
    # scaling when the full-K compiles are being rejected
    keep960 = jnp.arange(960) * (B * 4 * kpp // 960)
    stage("plane_kernel_tf_k960_ms",
          lambda: timed(plane_kernel_tf, planes, keep960, attempts=1),
          optional=True)
    stage("gather_tf_k960_ms",
          lambda: timed(gather_tf, planes, keep960, attempts=1),
          optional=True)

    # full static programs, shipped path (extract='base')
    for name, kw in (
        ("full_base", dict(extract="base", return_patches=False)),
        ("full_base_patches", dict(extract="base", return_patches=True)),
    ):
        fn = make_static_prep_fn(PATCH, K, 4, flags_mode="custom",
                                 use_pallas=True, **kw)
        stage(f"{name}_ms",
              lambda fn=fn: timed(lambda: fn(flat, flag_flat, key)[0],
                                  attempts=1),
              optional=True)

    # full-K epilogue stages
    stage("gather_tf_ms", lambda: timed(gather_tf, planes, keep, attempts=1),
          optional=True)
    stage("plane_kernel_tf_ms",
          lambda: timed(plane_kernel_tf, planes, keep, attempts=1),
          optional=True)

    # XLA jnp extraction on 1920 for reference (no Pallas)
    idx = jnp.arange(K) % base.shape[0]
    gathered = jax.jit(lambda b, i: jnp.take(b, i, axis=0))(base, idx)
    _sync(gathered.real)
    g = jax.jit(lambda x: P.imagenet_normalize(P.extract_channels(x)))
    stage("xla1920_ms", lambda: timed(g, gathered))

    # gather-fused kernel: K selected patches extracted straight from
    # the base array (scalar-prefetch DMA), planes never materialized
    pidx_k = jnp.asarray(np.random.default_rng(0).integers(0, 3, K),
                         jnp.int32)
    stage("gatherk1920_ms",
          lambda: timed(lambda b: fused_gather_extract(b, idx, pidx_k), base,
                        attempts=1),
          optional=True)

    # stage: old kernel on 1920 gathered patches (block ladder)
    for blk in (4, 8, 16, 32, 64):
        f = jax.jit(lambda x, b=blk: fused_extract_channels(x, block=b))
        stage(f"kernel1920_block{blk}_ms",
              lambda f=f: timed(f, gathered, attempts=1), optional=True)

    # old-path full programs (extract='gathered' uses the 1920 kernel)
    for name, kw in (
        ("full_gathered", dict(extract="gathered", return_patches=True)),
        ("full_gathered_nopatches",
         dict(extract="gathered", return_patches=False)),
    ):
        fn = make_static_prep_fn(PATCH, K, 4, flags_mode="custom",
                                 use_pallas=True, **kw)
        stage(f"{name}_ms",
              lambda fn=fn: timed(lambda: fn(flat, flag_flat, key)[0],
                                  attempts=1),
              optional=True)

    print(json.dumps(results), flush=True)
    if transient_failures[0]:
        log(f"{transient_failures[0]} stage(s) hit transient compile "
            "failures — exiting rc=4 (retry later)")
        sys.exit(4)


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as _e:  # noqa: BLE001
        # a failed big compile POISONS the whole session: even a 1 KB
        # device_put afterwards returns RESOURCE_EXHAUSTED (observed
        # 2026-08-20 14:0x) — report it as a transient launch (rc=4)
        # so the drive keeps cycling fresh processes
        _m = str(_e)
        if ("RESOURCE_EXHAUSTED" in _m or "500" in _m
                or "UNAVAILABLE" in _m):
            log(f"launch poisoned by transient backend failure: "
                f"{_m.splitlines()[0][:120]}")
            sys.exit(4)
        raise
