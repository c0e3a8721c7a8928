"""Decode-knob sweep on the SHIPPED SOLOLite: does a lower mask
sigmoid cut (mask_thresh) lift all-six recall / best-IoU at equal
precision, without retraining? Held-out protocol identical to
tests/test_instance_quality.py (seed 10_000, 64 images, IoU >= 0.5).

Run: python runs/sweep_mask_thresh.py | tee runs/sweep_mask_thresh.log
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rfi_toolbox_tpu.evaluation import evaluate_instance_model
from rfi_toolbox_tpu.train import InstanceTrainer
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

ALL6 = {
    "narrowband_persistent": {"count": [1, 3]},
    "broadband_persistent": {"count": [0, 2]},
    "narrowband_intermittent": {"count": [0, 2]},
    "narrowband_bursty": {"count": [0, 2]},
    "broadband_bursty": {"count": [0, 1]},
    "frequency_sweep": {"count": [0, 1]},
}
SNAP = Path(__file__).parent.parent / "pretrained" / "sololite_synthetic.npz"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


results = {}
for mt in (0.35, 0.45, 0.5, 0.55):
    tr = InstanceTrainer.load(SNAP, batch_size=16, seed=0, rfi_config=ALL6)
    q = evaluate_instance_model(tr, num_images=64, seed=10_000,
                                iou_thresh=0.5, score_thresh=0.25,
                                mask_thresh=mt)
    results[mt] = q
    log(f"all6 st=0.25 mt={mt}: recall={q['recall']:.3f} "
        f"precision={q['precision']:.3f} iou={q['mean_best_iou']:.3f} "
        f"floor={min(q['per_class_recall'].values()):.3f}")

out = Path(__file__).parent / "sweep_mask_thresh.json"
out.write_text(json.dumps({str(k): v for k, v in results.items()},
                          indent=1, default=float))
log(f"-> {out}")
