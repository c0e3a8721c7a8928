"""Cold-compile time of the FULL-SIZE (1024^2) all-six generator —
the `generate_rfi_dataset` CLI's traced program (VERDICT #3).

The 128^2 all-six instance program measured fast (runs/compile_time.py:
~35 s cold); CLAUDE.md's "~20 min compile" observation therefore points
at the full-waterfall generator. This script times it cold (compilation
cache disabled) at the CLI's shapes, for the current structure and for
candidate restructures if the baseline is pathological.

    python runs/compile_time_gen1024.py 2>&1 | tee runs/compile_time_gen1024.log
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_compilation_cache", False)

from rfi_toolbox_tpu.synth import make_sample_generator

ALL_SIX = {
    "narrowband_persistent": {"count": [1, 3]},
    "broadband_persistent": {"count": [0, 2]},
    "narrowband_intermittent": {"count": [0, 2]},
    "narrowband_bursty": {"count": [0, 2]},
    "broadband_bursty": {"count": [0, 2]},
    "frequency_sweep": {"count": [0, 1]},
}

# the reference-scale standard config (synthetic_train_4k.yaml class):
# dense 5-type mix, 4 pol, bandpass
DENSE_4POL = dict(
    rfi_config={
        "narrowband_persistent": {"count": 20},
        "broadband_persistent": {"count": 5},
        "narrowband_bursty": {"count": 20},
        "broadband_bursty": {"count": 5},
        "frequency_sweep": {"count": 1},
    },
    enable_bandpass=True,
    bandpass_order=8,
    num_polarizations=4,
    pol_corr=0.8,
)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    log(f"{name}: lower {t_lower:.1f}s  compile {t_compile:.1f}s")
    return {"lower_s": round(t_lower, 1), "compile_s": round(t_compile, 1),
            "total_s": round(t_lower + t_compile, 1)}


def main():
    results = {"backend": jax.default_backend()}
    key = jax.random.key(0)

    for name, nc, nt, b, kwargs in (
        ("all6_1024", 1024, 1024, 4, dict(rfi_config=ALL_SIX)),
        ("all6_1024_4pol", 1024, 1024, 4,
         dict(rfi_config=ALL_SIX, num_polarizations=4, pol_corr=0.8)),
        ("dense_4pol_1024", 1024, 1024, 2, DENSE_4POL),
    ):
        sample_fn = make_sample_generator(nc, nt, **kwargs)
        fn = jax.vmap(sample_fn)
        keys = jax.random.split(key, b)
        results[name] = timed(name, fn, keys)

    out = Path(__file__).parent / "compile_time_gen1024.json"
    out.write_text(json.dumps(results, indent=1))
    log(f"-> {out}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
