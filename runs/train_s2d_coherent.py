"""Round-4: quality validation of the space-to-depth packed UNet on the
coherent 8-channel task (the quality-bound task in this repo — the
3-channel synthetic task saturates at IoU 0.9998 and cannot separate
architectures).

Recipe: EXACTLY the round-3 GroupNorm ladder recipe (64k batch-16
steps, warmup-cosine 1e-3 schedule, EMA 0.999, flips, per-sample
robust scale) with UNet(space_to_depth=True). Comparison points
(pretrained/README.md): f=16gn 0.9332 / 0.9351 TTA, f=24gn 0.9339 /
0.9361, f=32gn 0.9369 / 0.9384.

The perf claim being validated: `bench.py train_s2d` measures the
packed variant at 1.83x the parity architecture's step rate (58.5%
MFU vs 41.5%). If held-out IoU ties the GN ladder, space_to_depth
is a pure speed win on this physics, not a quality trade.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from rfi_toolbox_tpu.train.coherent_trainer import CoherentTrainer  # noqa: E402

F = int(sys.argv[1]) if len(sys.argv) > 1 else 16
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 64_000
OUT = Path(__file__).parent / f"s2d_coherent_f{F}"
OUT.mkdir(exist_ok=True)

trainer = CoherentTrainer(init_features=F, size=256, batch_size=16,
                          norm="group", space_to_depth=True)

# resume-on-relaunch: a compile-service outage mid-run must not void it
ckpts = sorted((OUT / "ckpts").glob("step_*"),
               key=lambda p: int(p.name.split("_")[1]))
if ckpts:
    got = trainer.restore_checkpoint(ckpts[-1], num_steps_hint=STEPS)
    print(f"resumed from {ckpts[-1]} at step {got}", flush=True)

t0 = time.perf_counter()
start_step = trainer.step


def _log(step, loss):
    rate = (step - start_step) / (time.perf_counter() - t0)
    print(f"[{time.strftime('%H:%M:%S')}] step {step} loss {loss:.4f} "
          f"({rate:.1f} steps/s)", flush=True)


trainer.fit(num_steps=STEPS - start_step, fused_steps=20, log_every=2000,
            checkpoint_dir=OUT / "ckpts", checkpoint_every=8000,
            callback=_log)
train_s = time.perf_counter() - t0

report = trainer.evaluate()
report_tta = trainer.evaluate(tta=True)
result = {
    "init_features": F,
    "space_to_depth": True,
    "norm": "group",
    "steps": STEPS,
    "train_seconds": round(train_s, 1),
    "steps_per_sec": round((STEPS - start_step) / max(train_s, 1e-9), 2),
    "eval": report,
    "eval_tta": report_tta,
    "ladder_reference": {"f16gn": [0.9332, 0.9351],
                         "f24gn": [0.9339, 0.9361],
                         "f32gn": [0.9369, 0.9384]},
}
(OUT / "result.json").write_text(json.dumps(result, indent=1))
print(json.dumps(result, indent=1))

trainer.export(OUT / f"unet{F}gn_s2d_coherent8ch.npz",
               best_threshold=report["best_threshold"])
print("exported", OUT / f"unet{F}gn_s2d_coherent8ch.npz")
