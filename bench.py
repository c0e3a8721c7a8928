"""Benchmark: waterfall patches/sec/chip for preprocess + UNet fwd+bwd.

Workload (BASELINE.json metric): 1024x1024 synthetic complex waterfalls
-> full Preprocessor.create_dataset (4-way rotation augmentation, 128^2
patchify, custom exact flags, blank removal, 3-channel extraction,
ImageNet normalization) -> UNet train steps (BCE+Dice fwd+bwd) over all
resulting patches. Throughput = patches through the full pipeline per
wall-clock second on one chip.

Baseline denominator (BASELINE.md step 0): the reference CPU pipeline
measured on this machine — Preprocessor.create_dataset + torch UNet
(in_ch=3, init_features=32, batch 4) fwd+bwd, sequential path:
50.98 s/waterfall, 88 kept patches -> 1.73 patches/sec.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import time

import numpy as np

CPU_REFERENCE_PATCHES_PER_SEC = 1.73  # measured 2026-08-16, see module docstring


def main():
    import jax
    import jax.numpy as jnp

    from rfi_toolbox_tpu.models import UNet
    from rfi_toolbox_tpu.preprocess import Preprocessor
    from rfi_toolbox_tpu.synth import make_sample_generator
    from rfi_toolbox_tpu.train import create_train_state, train_step

    B = 4  # waterfalls per iteration
    C = T = 1024
    PATCH = 128
    TRAIN_BATCH = 128

    sample_fn = make_sample_generator(
        C, T,
        noise_level=1.0,
        rfi_power_min=1000.0,
        rfi_power_max=10000.0,
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
    state = create_train_state(
        model, jax.random.key(1), (1, PATCH, PATCH, 3), learning_rate=1e-4
    )

    def run_iteration(key, state):
        wf, mask, _ = batch_gen(jax.random.split(key, B))
        ds = Preprocessor(wf, flags=mask).create_dataset(
            patch_size=PATCH, use_custom_flags=True, seed=0,
            pad_to_multiple=TRAIN_BATCH
        )
        images = jnp.asarray(ds.images)
        labels = jnp.asarray(ds.labels, dtype=jnp.float32)
        n = (len(images) // TRAIN_BATCH) * TRAIN_BATCH
        loss = None
        for s in range(0, n, TRAIN_BATCH):
            state, loss = train_step(
                state, images[s : s + TRAIN_BATCH], labels[s : s + TRAIN_BATCH]
            )
        if loss is not None:
            jax.block_until_ready(loss)
        return state, len(images)

    # Warmup: compile generation, preprocessing and train step.
    state, _ = run_iteration(jax.random.key(0), state)

    iters = 3
    total_patches = 0
    t0 = time.perf_counter()
    for i in range(iters):
        state, n = run_iteration(jax.random.key(i + 1), state)
        total_patches += n
    elapsed = time.perf_counter() - t0

    value = total_patches / elapsed
    print(
        json.dumps(
            {
                "metric": "waterfall_patches_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "patches/s (preprocess + UNet fwd+bwd, 1024^2 waterfalls)",
                "vs_baseline": round(value / CPU_REFERENCE_PATCHES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
