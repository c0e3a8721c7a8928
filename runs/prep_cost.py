"""Decompose the headline pipeline: device cost of generation +
static preprocess vs the train scan (round-3 VERDICT #2 accounting).

On ONE chip, generation + preprocessing is DEVICE compute on the same
stream as training — only a host-side stall can be "hidden", never
device FLOPs. The static-selection path (pipeline.static_select_flagged)
removed the last host sync; whatever ratio remains is the prep compute
itself. This run measures each phase in isolation (with forced host
readbacks as fences — jax.block_until_ready is not a fence on this
backend, CLAUDE.md) so BASELINE.md can record the pipeline's compute
floor: expected pipeline/train-only == train / (train + prep).

Run serialized with other TPU jobs:
    python runs/prep_cost.py 2>&1 | tee runs/prep_cost.log
Writes runs/prep_cost.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.models import UNet
from rfi_toolbox_tpu.preprocess import Preprocessor
from rfi_toolbox_tpu.synth import make_sample_generator
from rfi_toolbox_tpu.train import create_train_state, train_steps
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

B, C, T, PATCH, TRAIN_BATCH = 8, 1024, 1024, 128, 128

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

model = UNet(out_channels=1, init_features=32, dtype=jnp.bfloat16)
state = create_train_state(model, jax.random.key(1), (1, PATCH, PATCH, 3),
                           learning_rate=1e-4)


def _sync(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def preprocess_static(key, k):
    wf, mask, _ = batch_gen(jax.random.split(key, B))
    ds = Preprocessor(wf, flags=mask).create_dataset(
        patch_size=PATCH, use_custom_flags=True, seed=0,
        static_num_patches=k,
    )
    return jnp.asarray(ds.images), jnp.asarray(ds.labels, jnp.float32)


def train_all(state, images, labels):
    n = (len(images) // TRAIN_BATCH) * TRAIN_BATCH
    s = n // TRAIN_BATCH
    imgs = images[:n].reshape(s, TRAIN_BATCH, *images.shape[1:])
    lbls = labels[:n].reshape(s, TRAIN_BATCH, *labels.shape[1:])
    state, losses = train_steps(state, imgs, lbls)
    return state, losses[-1]


def main():
    global state
    # K probe identical to bench.py main()
    wf, mask, _ = batch_gen(jax.random.split(jax.random.key(0), B))
    ds = Preprocessor(wf, flags=mask).create_dataset(
        patch_size=PATCH, use_custom_flags=True, seed=0)
    K = max((len(ds.images) // TRAIN_BATCH) * TRAIN_BATCH, TRAIN_BATCH)
    print(f"K={K}", flush=True)

    images, labels = preprocess_static(jax.random.key(0), K)  # warm
    state, loss = train_all(state, images, labels)
    _sync(loss)

    def timed(fn, iters=8):
        vals = []
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(iters):
                fn(i)
            vals.append((time.perf_counter() - t0) / iters)
        return float(np.median(vals))

    # prep alone (fence: one-element readback of the labels)
    def prep_it(i):
        imgs, lbls = preprocess_static(jax.random.key(100 + i), K)
        _sync(lbls)

    # train alone (same device-resident batch, fence on loss)
    def train_it(i):
        global state
        state, loss = train_all(state, images, labels)
        _sync(loss)

    t_prep = timed(prep_it)
    t_train = timed(train_it)
    expected = t_train / (t_train + t_prep)
    out = {
        "K": K,
        "prep_s_per_iter": round(t_prep, 4),
        "train_s_per_iter": round(t_train, 4),
        "prep_over_train": round(t_prep / t_train, 4),
        "expected_pipeline_vs_train_only": round(expected, 4),
        "note": "single-chip compute floor: pipeline/train-only cannot "
                "exceed train/(train+prep); bench.py measured 0.913",
    }
    print(json.dumps(out), flush=True)
    (Path(__file__).parent / "prep_cost.json").write_text(
        json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
