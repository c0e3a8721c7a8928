"""Round-5 (VERDICT #4): space-to-depth SOLOLite at the shipped recipe.

The shipped all-six detector (pretrained/sololite_synthetic.npz,
SOLOLite(grid=8, f=48, embed=48)) runs its stem at full resolution with
48 channels — the same 25-50% MXU N-utilization pattern the UNet
space_to_depth variant removed at zero quality cost (BASELINE.md round
4). SOLOLite(space_to_depth=True) replaces the full-res stage with a
2x2 pack + two half-res blocks at 2f; every downstream shape (FPN,
mask head at H/4, grid heads) is unchanged.

This trains the EXACT shipped recipe — 36k batch-64 stride-2 steps
(warmup-cosine 1e-5 -> 8e-4, 500 warmup) on the all-six mix with mild
weak-family oversampling, then 8k batch-32 full-res fine-tune (cosine
1e-4) — with the packed stem, and evaluates against the shipped gates
(seed 10_000, 64 images, IoU >= 0.5, correct class). Success criterion:
>= 1.3x steps/s at equal recall/precision (shipped reference: 14.8
steps/s fused_steps=10; all-six st=0.25 r=0.822 p=0.883 floor 0.79).

    python runs/train_solo_s2d.py 2>&1 | tee runs/solo_s2d.log
Writes runs/solo_s2d_eval.json + runs/solo_s2d_all6.npz.
"""

import json
import sys
import time
from pathlib import Path

import optax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rfi_toolbox_tpu.models.instance import SOLOLite
from rfi_toolbox_tpu.train import InstanceTrainer
from rfi_toolbox_tpu.evaluation import evaluate_instance_model
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

OUT = Path(__file__).parent
CKPT1 = OUT / "solo_s2d_phase1_ckpt"
CKPT2 = OUT / "solo_s2d_phase2_ckpt"
SNAP = OUT / "solo_s2d_all6.npz"

import os

F = 48
STEPS1 = int(os.environ.get("STEPS1", 36_000))
STEPS2 = int(os.environ.get("STEPS2", 8_000))
FUSED = 10
CHUNK = 2_000

# the shipped f=48 snapshot's mix (train_solo64.py / pretrained/README)
TRAIN_MIX = {
    "narrowband_persistent": {"count": [1, 3]},
    "broadband_persistent": {"count": [0, 2]},
    "narrowband_intermittent": {"count": [0, 2]},
    "narrowband_bursty": {"count": [0, 2]},
    "broadband_bursty": {"count": [0, 2]},   # eval draws [0, 1]
    "frequency_sweep": {"count": [0, 1]},
}
ALL6_EVAL = {
    "narrowband_persistent": {"count": [1, 3]},
    "broadband_persistent": {"count": [0, 2]},
    "narrowband_intermittent": {"count": [0, 2]},
    "narrowband_bursty": {"count": [0, 2]},
    "broadband_bursty": {"count": [0, 1]},
    "frequency_sweep": {"count": [0, 1]},
}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_phase(trainer, total, ckpt, fused, label, rates):
    start = 0
    if ckpt.exists():
        start = trainer.restore_checkpoint(ckpt)
        log(f"{label}: resumed at step {start}")
    while start < total:
        n = min(CHUNK, total - start)
        res = trainer.fit(num_steps=n, log_every=n, fused_steps=fused)
        rec = res["history"][-1]
        start += n
        trainer.save_checkpoint(ckpt, step=start)
        rates.append(rec["steps_per_sec"])
        log(f"{label} {start}/{total}: loss={rec['loss']:.4f} "
            f"cate={rec['cate_loss']:.4f} mask={rec['mask_loss']:.4f} "
            f"{rec['steps_per_sec']:.1f} steps/s")
    return trainer


def main():
    model = SOLOLite(num_classes=6, grid_size=8, features=F, embed_dim=F,
                     space_to_depth=True)

    rates1, rates2 = [], []
    sched1 = optax.warmup_cosine_decay_schedule(
        1e-5, 8e-4, 500, STEPS1, end_value=1e-5)
    t1 = InstanceTrainer(model=model, patch_size=128, batch_size=64,
                         rfi_config=TRAIN_MIX, learning_rate=sched1,
                         seed=3, mask_loss_stride=2)
    run_phase(t1, STEPS1, CKPT1, FUSED, "phase1", rates1)

    sched2 = optax.cosine_decay_schedule(1e-4, STEPS2, alpha=1e-2)
    t2 = InstanceTrainer(model=model, patch_size=128, batch_size=32,
                         rfi_config=TRAIN_MIX, learning_rate=sched2,
                         seed=7, mask_loss_stride=1)
    t2._init()
    t2.params = t1.params
    del t1
    run_phase(t2, STEPS2, CKPT2, FUSED, "phase2", rates2)

    t2.save(SNAP)
    log(f"snapshot -> {SNAP}")

    results = {"steps_per_sec_phase1": rates1, "steps_per_sec_phase2": rates2,
               "reference_phase1_steps_per_sec": 14.8}
    for st in (0.25, 0.28, 0.30):
        ev = InstanceTrainer.load(SNAP, batch_size=16, seed=0,
                                  rfi_config=ALL6_EVAL)
        q = evaluate_instance_model(ev, num_images=64, seed=10_000,
                                    iou_thresh=0.5, score_thresh=st)
        q.pop("best_iou", None)
        results[f"all6_st{st}"] = q
        log(f"all6 st={st}: recall={q['recall']:.3f} "
            f"precision={q['precision']:.3f} "
            f"floor={min(q['per_class_recall'].values()):.3f}")
    ev = InstanceTrainer.load(SNAP, batch_size=16, seed=0)  # default mix
    q = evaluate_instance_model(ev, num_images=64, seed=10_000,
                                iou_thresh=0.5, score_thresh=0.3)
    results["default_st0.3"] = q
    log(f"default st=0.3: recall={q['recall']:.3f} "
        f"precision={q['precision']:.3f}")

    def clean(o):
        if isinstance(o, dict):
            return {k: clean(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [clean(v) for v in o]
        try:
            return float(o)
        except (TypeError, ValueError):
            return o

    (OUT / "solo_s2d_eval.json").write_text(
        json.dumps(clean(results), indent=1))
    log("done")


if __name__ == "__main__":
    main()
