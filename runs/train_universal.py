"""Train the UNIVERSAL 3-channel flagging model on BOTH generator
families (round-4 follow-up to the transfer-eval finding).

runs/transfer_eval.py measured the shipped 3-channel flagship
(`unet16_synthetic`, trained only on separable box events from
synth/sample) at IoU 0.398 on `RFISimulator` coherent physics — it
misses fringe-washed event interiors and Gibbs sidelobes, while MAD
sigma-5 scores 0.833 on the identical planes. The fix is data, not
architecture: train the SAME 3-channel pipeline on a 50/50 blend of
both generators so one model covers both physics families.

Recipe: UNet(init_features=16, norm='group') — GroupNorm because the
simulator planes are heavy-tailed (BASELINE.md round-3 BatchNorm
instability finding) — batch 128, warmup-cosine, every iteration
generates 4 synth waterfalls (the flagship's trained mix) + 4
simulator waterfalls (coherent fringes, drift, Gibbs, cross-hands),
preprocesses each through the standard fused static path with exact
masks, shuffles the union, and scan-trains all 12 minibatches in one
dispatch.

Held-out eval (key 77_000, the transfer-eval stream) goes through the
PRODUCTION path — export_params -> CompiledPredictor ->
flag_waterfalls(method='model') — on both physics, plus the
out-of-range synth configs, with a sigmoid threshold sweep.

Run serialized with other TPU jobs:
    python runs/train_universal.py 2>&1 | tee runs/train_universal.log
Writes runs/train_universal.json + pretrained/unet16gn_universal.npz.
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
import optax

from rfi_toolbox_tpu.evaluation import evaluate_segmentation
from rfi_toolbox_tpu.io import flag_waterfalls
from rfi_toolbox_tpu.models import UNet
from rfi_toolbox_tpu.preprocess import Preprocessor
from rfi_toolbox_tpu.serving import CompiledPredictor
from rfi_toolbox_tpu.synth import make_sample_generator
from rfi_toolbox_tpu.synth.simulator import RFISimulator
from rfi_toolbox_tpu.train import create_train_state, train_steps
from rfi_toolbox_tpu.train.trainer import export_params
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

HELD_OUT_KEY = 77_000    # the transfer-eval stream — disjoint from training
TRAIN_KEY0 = 1_000_000   # training keys count up from here
B = 4                    # waterfalls per source per iteration
K = 768                  # static patches kept per source per iteration
PATCH = 128
TRAIN_BATCH = 128
ITERS = int(os.environ.get("ITERS", 500))   # x 12 minibatches = 6000 steps
EVAL_EVERY = max(ITERS // 5, 1)
SMOKE = os.environ.get("SMOKE", "") == "1"  # skip sweep, 1 threshold, no ship
TAG = os.environ.get("TAG", "")  # non-empty: probe run, don't touch the
#                                  shipped snapshot (round-5 24k probe)

TRAINED_MIX = {
    "narrowband_persistent": {"count": 20},
    "broadband_persistent": {"count": 5},
    "narrowband_bursty": {"count": 20},
    "broadband_bursty": {"count": 5},
    "frequency_sweep": {"count": 1},
}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def _sync(x):
    return np.asarray(jnp.asarray(x).reshape(-1)[0])


def make_prep():
    sample_fn = make_sample_generator(
        1024, 1024, noise_level=1.0, rfi_power_min=1000.0,
        rfi_power_max=10000.0, rfi_config=TRAINED_MIX,
        num_polarizations=1)
    synth_gen = jax.jit(jax.vmap(sample_fn))
    sim = RFISimulator(time_bins=1024, freq_bins=1024, seed=0)
    sim_gen = jax.jit(jax.vmap(sim.generate_rfi_device))

    def prep(wf, mask):
        ds = Preprocessor(wf, flags=mask).create_dataset(
            patch_size=PATCH, use_custom_flags=True, seed=0,
            static_num_patches=K)
        return jnp.asarray(ds.images), jnp.asarray(ds.labels, jnp.float32)

    def iteration_batch(key):
        k1, k2, k3 = jax.random.split(key, 3)
        wf_s, mask_s, _ = synth_gen(jax.random.split(k1, B))
        img_s, lbl_s = prep(wf_s, mask_s)
        tf, mask_c = sim_gen(jax.random.split(k2, B))
        vis = tf[:, 0][:, None]                      # RR plane -> (B,1,T,F)
        img_c, lbl_c = prep(vis, mask_c[:, None])
        images = jnp.concatenate([img_s, img_c])
        labels = jnp.concatenate([lbl_s, lbl_c])
        perm = jax.random.permutation(k3, len(images))
        images, labels = images[perm], labels[perm]
        s = len(images) // TRAIN_BATCH
        return (images.reshape(s, TRAIN_BATCH, *images.shape[1:]),
                labels.reshape(s, TRAIN_BATCH, *labels.shape[1:]))

    return iteration_batch, sim_gen, synth_gen


def production_eval(pred, sim_gen, n_waterfalls=8):
    """Held-out eval through flag_waterfalls(method='model')."""
    keys = jax.random.split(jax.random.key(HELD_OUT_KEY), n_waterfalls)
    tf, masks = sim_gen(keys)
    vis = tf[:, 0]
    flags = flag_waterfalls(vis, method="model", predictor=pred,
                            patch_size=PATCH)
    sim_m = evaluate_segmentation(np.asarray(flags), np.asarray(masks))

    sample_fn = make_sample_generator(
        1024, 1024, noise_level=1.0, rfi_power_min=1000.0,
        rfi_power_max=10000.0, rfi_config=TRAINED_MIX,
        num_polarizations=1)
    gen = jax.jit(jax.vmap(sample_fn))
    wf, mask, _ = gen(keys)
    flags = flag_waterfalls(wf[:, 0], method="model", predictor=pred,
                            patch_size=PATCH)
    syn_m = evaluate_segmentation(np.asarray(flags), np.asarray(mask[:, 0]))
    return ({k: round(v, 4) for k, v in sim_m.items()},
            {k: round(v, 4) for k, v in syn_m.items()})


def main():
    iteration_batch, sim_gen, synth_gen = make_prep()

    total_steps = ITERS * 2 * K // TRAIN_BATCH
    warmup = min(500, max(total_steps // 10, 1))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, warmup, total_steps, 1e-5)
    model = UNet(out_channels=1, init_features=16, norm="group",
                 dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.key(7),
                               (1, PATCH, PATCH, 3), learning_rate=sched)

    log(f"training: {ITERS} iters x {2 * K // TRAIN_BATCH} steps "
        f"= {total_steps} steps, batch {TRAIN_BATCH}")
    t0 = time.perf_counter()
    losses_log = []
    for it in range(ITERS):
        imgs, lbls = iteration_batch(jax.random.key(TRAIN_KEY0 + it))
        state, losses = train_steps(state, imgs, lbls)
        if (it + 1) % EVAL_EVERY == 0 or it == 0:
            loss = float(_sync(losses[-1]))
            losses_log.append({"iter": it + 1, "loss": round(loss, 4)})
            log(f"iter {it + 1}/{ITERS} loss {loss:.4f} "
                f"({time.perf_counter() - t0:.0f}s)")
    _sync(losses)
    train_wall_s = time.perf_counter() - t0
    log(f"trained in {train_wall_s:.0f}s")

    # threshold sweep on the held-out production path
    if SMOKE:
        out_path = Path("/tmp/unet16gn_universal_smoke.npz")
    elif TAG:
        out_path = Path(__file__).parent / f"universal_{TAG}.npz"
    else:
        out_path = Path("pretrained/unet16gn_universal.npz")
    meta = {
        "model": "UNet", "init_features": 16, "in_channels": 3,
        "norm": "group",
        "trained": "2026-08-20 universal: 50/50 synth box events + "
                   "RFISimulator coherent physics, 6000 steps batch 128",
    }
    export_params(state, out_path, batch_stats=state.batch_stats,
                  metadata=meta)

    sweep = {}
    best = (None, -1.0)
    for thresh in ((0.5,) if SMOKE else (0.3, 0.4, 0.5, 0.6, 0.7)):
        pred = CompiledPredictor.from_snapshot(
            out_path, batch_size=TRAIN_BATCH, threshold=thresh)
        sim_m, syn_m = production_eval(pred, sim_gen)
        sweep[str(thresh)] = {"simulator": sim_m, "synthetic": syn_m}
        score = sim_m["iou"] + syn_m["iou"]
        log(f"thresh {thresh}: sim IoU {sim_m['iou']} "
            f"syn IoU {syn_m['iou']}")
        if score > best[1]:
            best = (thresh, score)

    meta["best_threshold"] = best[0]
    pred = CompiledPredictor.from_snapshot(out_path, batch_size=TRAIN_BATCH,
                                           threshold=best[0])
    sim_m, syn_m = production_eval(pred, sim_gen)
    meta["held_out_iou_simulator"] = sim_m["iou"]
    meta["held_out_iou_synthetic"] = syn_m["iou"]
    export_params(state, out_path, batch_stats=state.batch_stats,
                  metadata=meta)
    log(f"shipped {out_path}: sim {sim_m} syn {syn_m} "
        f"@ threshold {best[0]}")

    results = {
        "held_out_key": HELD_OUT_KEY,
        "total_steps": total_steps,
        "train_wall_s": round(train_wall_s, 1),
        "loss_ladder": losses_log,
        "threshold_sweep": sweep,
        "best_threshold": best[0],
        "final": {"simulator": sim_m, "synthetic": syn_m},
    }
    name = ("train_universal_smoke.json" if SMOKE
            else f"train_universal_{TAG}.json" if TAG
            else "train_universal.json")
    out = Path(__file__).parent / name
    out.write_text(json.dumps(results, indent=1))
    log(f"-> {out}")


if __name__ == "__main__":
    main()
