"""Decompose prep's device cost phase by phase (round-4 follow-up to
runs/prep_cost.py, which showed prep = 72.3 ms/iter standalone, ~41 ms
of it device compute, now the binding constraint on pipeline_s2d).

Phases of the headline preprocess_static(key, K):
  1. generation      vmap(sample_fn) over 8 keys -> (8, 1, 1024, 1024)
  2. aug+patchify    4-way rotations + 128^2 patchify (complex data)
  3. mask path       same aug+patchify on the float32 mask + >0
  4. static select   any-flag + stable argsort + cyclic fill + permute
  5. gather          take K=1920 of 2048 patches (complex + flags)
  6. fused channels  Pallas |z|->log10->grad->minmax->ImageNet, (K,128,128,3)

Each phase is timed cumulatively (phase i runs phases 1..i) with a hard
host-readback fence, so phase cost = delta between consecutive
cumulative medians; cumulative timing avoids re-staging inputs and
matches how the phases actually compose in create_dataset.

Run serialized with other TPU jobs:
    python runs/prep_phase_breakdown.py 2>&1 | tee runs/prep_phase_breakdown.log
Writes runs/prep_phase_breakdown.json.
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


def gen(key):
    wf, mask, _ = batch_gen(jax.random.split(key, B))
    return wf, mask


def aug_patch(wf):
    flat = wf.reshape(-1, C, T).astype(jnp.complex64)
    patches, _ = PP._augment_and_patchify(flat, PATCH, 4, True)
    return patches


def mask_patch(mask):
    flat = mask.reshape(-1, C, T).astype(jnp.float32)
    fp, _ = PP._augment_and_patchify(flat, PATCH, 4, True)
    return fp > 0


def select(fp, key):
    return P.static_select_flagged(fp, K, key)


def gather(patches, fp, keep):
    return jnp.take(patches, keep, axis=0), jnp.take(fp, keep, axis=0)


PHASES = [
    "generation",
    "aug_patchify_complex",
    "aug_patchify_mask",
    "static_select",
    "gather",
    "fused_channels",
]


def run_through(key, n_phases):
    wf, mask = gen(key)
    out = wf
    if n_phases >= 2:
        patches = aug_patch(wf)
        out = patches
    if n_phases >= 3:
        fp = mask_patch(mask)
        out = fp
    if n_phases >= 4:
        keep = select(fp, key)
        out = keep
    if n_phases >= 5:
        patches, fp = gather(patches, fp, keep)
        out = fp
    if n_phases >= 6:
        images = fused_extract_channels(patches)
        out = images
    return out


def main():
    # warm every prefix
    for n in range(1, len(PHASES) + 1):
        _sync(run_through(jax.random.key(0), n))

    def timed(n, iters=6, reps=3):
        vals = []
        for r in range(reps):
            t0 = time.perf_counter()
            for i in range(iters):
                out = run_through(jax.random.key(1000 * r + i), n)
            _sync(out)
            vals.append((time.perf_counter() - t0) / iters)
        return float(np.median(vals))

    cumulative = {}
    for n in range(1, len(PHASES) + 1):
        cumulative[PHASES[n - 1]] = timed(n)
        print(f"cum {PHASES[n-1]}: {cumulative[PHASES[n-1]]*1e3:.2f} ms",
              flush=True)

    deltas = {}
    prev = 0.0
    for name in PHASES:
        deltas[name] = round((cumulative[name] - prev) * 1e3, 2)
        prev = cumulative[name]

    out = {
        "B": B, "K": K,
        "cumulative_ms": {k: round(v * 1e3, 2) for k, v in cumulative.items()},
        "phase_delta_ms": deltas,
        "total_ms": round(cumulative[PHASES[-1]] * 1e3, 2),
        "note": "cumulative prefixes, hard-synced; deltas are per-phase "
                "cost incl. dispatch (async queue hides most dispatch in "
                "the real pipeline)",
    }
    print(json.dumps(out), flush=True)
    (Path(__file__).parent / "prep_phase_breakdown.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
