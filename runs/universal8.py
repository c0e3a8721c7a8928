"""Round-5 universal-gap probe (b): is the 3-channel universal's
remaining 0.024 sim-physics IoU gap (0.9101 vs the 8-channel coherent
flagship's ~0.932 through the production path) INFORMATION (1 pol x 3
derived channels vs 4 pols x re/im) or just steps?

Trains an 8-CHANNEL universal: the CoherentTrainer recipe (size 256,
batch 16, GroupNorm, EMA, flips, per-sample robust scale) with the
sample stream replaced by a 50/50 per-sample blend of both generator
families —
  - RFISimulator coherent physics (fringes, drift, Gibbs, cross-hands),
  - the separable box-event synthetic family at 4 pols + pol_corr 0.8
    (counts scaled to 256^2 from the 1024^2 trained mix),
both rendered 4 pols x (re, im) -> robust-scaled (T, F, 8).

Architecture: UNet(f=16, norm='group', space_to_depth=True) — measured
quality-EQUAL to plain f=16 on exactly this physics (runs/
s2d_coherent_f16: 0.9350 vs 0.9332) at ~2x the step rate, so the probe
is cheap without confounding quality.

Held-out eval through the PRODUCTION 8-channel path
(flag_waterfalls_coherent on 1024^2 4-pol waterfalls, key 77_000 — the
transfer-eval stream) on BOTH families, directly comparable to
runs/train_universal.json (3ch universal: sim 0.9101) and the coherent
flagship's production-path 0.932.

    python runs/universal8.py 2>&1 | tee runs/universal8.log
Writes runs/universal8.json (+ pretrained/unet16gn_s2d_universal8.npz
if the sim-physics target >= 0.92 is met).
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
from jax import random

from rfi_toolbox_tpu.evaluation import evaluate_segmentation
from rfi_toolbox_tpu.io.flagging import flag_waterfalls_coherent
from rfi_toolbox_tpu.serving import CompiledPredictor
from rfi_toolbox_tpu.synth import make_sample_generator
from rfi_toolbox_tpu.synth.simulator import RFISimulator
from rfi_toolbox_tpu.train.coherent_trainer import (
    CoherentTrainer,
    _robust_scale,
    _to_8ch,
)
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

STEPS = int(os.environ.get("STEPS", 24_000))
HELD_OUT_KEY = 77_000
OUT = Path(__file__).parent
CKPT = OUT / "universal8_ckpts"

# the 1024^2 trained mix scaled ~1/16 to 256^2 area (event widths are
# absolute, so per-pixel density matches the 3ch universal's training)
SYNTH_MIX_256 = {
    "narrowband_persistent": {"count": [0, 3]},
    "broadband_persistent": {"count": [0, 1]},
    "narrowband_bursty": {"count": [0, 3]},
    "broadband_bursty": {"count": [0, 1]},
    "frequency_sweep": {"count": [0, 1]},
}
# held-out evaluation uses the FULL trained mix at 1024^2 (the
# transfer-eval convention, runs/train_universal.py)
TRAINED_MIX_1024 = {
    "narrowband_persistent": {"count": 20},
    "broadband_persistent": {"count": 5},
    "narrowband_bursty": {"count": 20},
    "broadband_bursty": {"count": 5},
    "frequency_sweep": {"count": 1},
}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


class UniversalCoherentTrainer(CoherentTrainer):
    """CoherentTrainer whose sample stream is a 50/50 per-sample blend
    of the coherent simulator and the 4-pol synthetic box-event family
    (both as robust-scaled 8-channel images)."""

    def _make_sample_fn(self):
        sim_sample = super()._make_sample_fn()
        synth_fn = make_sample_generator(
            self.size, self.size, noise_level=1.0,
            rfi_power_min=1000.0, rfi_power_max=10000.0,
            rfi_config=SYNTH_MIX_256, num_polarizations=4, pol_corr=0.8,
        )
        flips = self.flips

        def synth_sample(key):
            k_gen, k_t, k_f = random.split(key, 3)
            wf, mask, _ = synth_fn(k_gen)          # (4, C, T) complex
            x = _robust_scale(_to_8ch(wf))
            y = (mask[0] > 0).astype(jnp.float32)  # pol0 = event union
            if flips:
                ft = random.bernoulli(k_t)
                x = jnp.where(ft, x[::-1], x)
                y = jnp.where(ft, y[::-1], y)
                ff = random.bernoulli(k_f)
                x = jnp.where(ff, x[:, ::-1], x)
                y = jnp.where(ff, y[:, ::-1], y)
            return x.astype(jnp.float32), y

        def sample(key):
            k_sel, k_s = random.split(key)
            pick_sim = random.bernoulli(k_sel)
            out_sim = sim_sample(k_s)
            out_syn = synth_sample(k_s)
            return jax.tree.map(
                lambda a, b: jnp.where(pick_sim, a, b), out_sim, out_syn
            )

        return sample


def production_eval(pred, n_waterfalls=8, chunk=2):
    """Held-out 8-channel production-path eval on both families.

    Processed ``chunk`` waterfalls at a time: the remote compile
    service rejects programs above a peak-buffer cliff (~1 GB class,
    CLAUDE.md round-5 note), and 8x 1024^2 4-pol through
    flag_waterfalls_coherent is in that class; 2 at a time is not."""
    keys = random.split(random.key(HELD_OUT_KEY), n_waterfalls)

    sim = RFISimulator(time_bins=1024, freq_bins=1024, seed=0)
    sim_gen = jax.jit(jax.vmap(sim.generate_rfi_device))
    gen = jax.jit(jax.vmap(make_sample_generator(
        1024, 1024, noise_level=1.0, rfi_power_min=1000.0,
        rfi_power_max=10000.0, rfi_config=TRAINED_MIX_1024,
        num_polarizations=4, pol_corr=0.8)))

    sim_f, sim_g, syn_f, syn_g = [], [], [], []
    for i in range(0, n_waterfalls, chunk):
        ks = keys[i:i + chunk]
        tf, masks = sim_gen(ks)
        sim_f.append(np.asarray(flag_waterfalls_coherent(tf, pred)))
        sim_g.append(np.asarray(masks))
        wf, mask, _ = gen(ks)
        syn_f.append(np.asarray(flag_waterfalls_coherent(wf, pred)))
        syn_g.append(np.asarray(mask[:, 0]))
    sim_m = evaluate_segmentation(np.concatenate(sim_f),
                                  np.concatenate(sim_g))
    syn_m = evaluate_segmentation(np.concatenate(syn_f),
                                  np.concatenate(syn_g))
    return ({k: round(float(v), 4) for k, v in sim_m.items()},
            {k: round(float(v), 4) for k, v in syn_m.items()})


def main():
    trainer = UniversalCoherentTrainer(
        init_features=16, size=256, batch_size=16, norm="group",
        space_to_depth=True, seed=11,
    )
    ckpts = sorted(CKPT.glob("step_*"), key=lambda p: int(p.name.split("_")[1]))
    if ckpts:
        got = trainer.restore_checkpoint(ckpts[-1], num_steps_hint=STEPS)
        log(f"resumed from {ckpts[-1]} at step {got}")
    start = trainer.step
    t0 = time.perf_counter()

    def _cb(step, loss):
        rate = (step - start) / (time.perf_counter() - t0)
        log(f"step {step} loss {loss:.4f} ({rate:.1f} steps/s)")

    trainer.fit(num_steps=STEPS - start, fused_steps=20, log_every=2000,
                checkpoint_dir=CKPT, checkpoint_every=8000, callback=_cb)
    train_s = time.perf_counter() - t0

    # gate-convention sweep first (threshold on held-out sim batches)
    rep = trainer.evaluate()
    log(f"gate-convention sim eval: {rep}")

    snap = OUT / "universal8.npz"
    trainer.export(snap, best_threshold=rep["best_threshold"])

    pred = CompiledPredictor.from_snapshot(snap, batch_size=64)
    sim_m, syn_m = production_eval(pred)
    log(f"production path: sim {sim_m} synth {syn_m}")

    result = {
        "steps": STEPS,
        "train_seconds": round(train_s, 1),
        "architecture": "unet16gn_s2d, 8ch, 50/50 blend",
        "gate_convention_eval": rep,
        "production_sim": sim_m,
        "production_synthetic": syn_m,
        "comparisons": {
            "universal_3ch_6k_sim": 0.9101,
            "coherent_flagship_production_sim": 0.932,
            "target": 0.92,
        },
    }
    (OUT / "universal8.json").write_text(json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
