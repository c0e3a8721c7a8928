"""All-six precision calibration (round-3 VERDICT #8).

Goal: lift all-six precision 0.77-0.80 -> >=0.83 while holding recall
>=0.82 and per-family floor >=0.77 — WITHOUT retraining, by calibrating
the decode knobs the shipped snapshot already has:

  nms_sigma     Matrix-NMS decay strength (duplicates surviving the
                soft decay at st=0.25 count as false positives)
  score_thresh  per-FAMILY thresholds (families score on different
                confidence scales; one global cut trades them off)

Method: predictions are cached once per nms_sigma on a CALIBRATION
seed (20_000 — disjoint from training and from the held-out gate seed
10_000), every threshold config is then evaluated host-side from the
cache, and only the winning config is re-measured with fresh forwards
on the held-out seed. Also re-checks the default-mix gate so the
calibration can't silently trade it away.

Run serialized with other TPU jobs:
    python runs/calibrate_all6.py 2>&1 | tee runs/calibrate_all6.log
Writes runs/calibrate_all6.json.
"""

import itertools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rfi_toolbox_tpu.evaluation.instances import (evaluate_instance_model,
                                                  match_instances)
from rfi_toolbox_tpu.train import InstanceTrainer
from rfi_toolbox_tpu.utils import enable_compilation_cache

enable_compilation_cache()

ALL6_EVAL = {
    "narrowband_persistent": {"count": [1, 3]},
    "broadband_persistent": {"count": [0, 2]},
    "narrowband_intermittent": {"count": [0, 2]},
    "narrowband_bursty": {"count": [0, 2]},
    "broadband_bursty": {"count": [0, 1]},
    "frequency_sweep": {"count": [0, 1]},
}
SNAP = "pretrained/sololite_synthetic.npz"
N_IMAGES = 96
CAL_SEED = 20_000
HELD_OUT_SEED = 10_000
DECODE_FLOOR = 0.18          # decode keeps everything above this; the
                             # per-config cut happens at matching time
SIGMAS = (2.0, 3.0, 4.0, 6.0)
GRID = (0.20, 0.22, 0.25, 0.28, 0.31, 0.34, 0.38, 0.42)
TARGET_RECALL = 0.82
TARGET_FLOOR = 0.77


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def cache_predictions(trainer, seed, nms_sigma, num_images=N_IMAGES,
                      batch_size=16):
    """Forward once at the decode floor; return [(dets, gm, gc, gv)]."""
    import jax

    from rfi_toolbox_tpu.preprocess import pipeline as P

    out = []
    key = jax.random.key(seed)
    done = 0
    while done < num_images:
        key, k = jax.random.split(key)
        batch = trainer._batch_fn(jax.random.split(k, batch_size))
        images = P.imagenet_normalize(
            P.extract_channels(batch["waterfall"]))
        take = min(batch_size, num_images - done)
        dets = trainer.predict(np.asarray(images[:take]),
                               score_thresh=DECODE_FLOOR,
                               nms_sigma=nms_sigma)
        gms = np.asarray(batch["inst_masks"][:take])
        gcs = np.asarray(batch["inst_classes"][:take])
        gvs = np.asarray(batch["inst_valid"][:take])
        for i in range(take):
            out.append((dets[i], gms[i], gcs[i], gvs[i]))
        done += take
    return out


def score_config(cache, score_thresh):
    tp = n_gt = n_det = 0
    per_tp, per_n = {}, {}
    for dets, gm, gc, gv in cache:
        r = match_instances(dets, gm, gc, gv, iou_thresh=0.5,
                            score_thresh=score_thresh)
        tp += r["tp"]
        n_gt += r["n_gt"]
        n_det += r["n_det"]
        for c, m in zip(gc[gv], r["matched"][gv]):
            per_n[int(c)] = per_n.get(int(c), 0) + 1
            per_tp[int(c)] = per_tp.get(int(c), 0) + int(m)
    per_class = {c: per_tp.get(c, 0) / n for c, n in sorted(per_n.items())}
    return {
        "recall": tp / n_gt if n_gt else 1.0,
        "precision": tp / n_det if n_det else 1.0,
        "floor": min(per_class.values()) if per_class else 0.0,
        "per_class_recall": {k: round(v, 3) for k, v in per_class.items()},
        "n_det": n_det,
        "n_gt": n_gt,
    }


def main():
    results = {"snapshot": SNAP, "cal_seed": CAL_SEED,
               "held_out_seed": HELD_OUT_SEED, "num_images": N_IMAGES}
    trainer = InstanceTrainer.load(SNAP, batch_size=16, seed=0,
                                   rfi_config=ALL6_EVAL)

    # ---- stage 1: global (sigma, threshold) sweep on the cal seed ----
    caches = {}
    stage1 = []
    for sigma in SIGMAS:
        t0 = time.perf_counter()
        caches[sigma] = cache_predictions(trainer, CAL_SEED, sigma)
        log(f"cached sigma={sigma} in {time.perf_counter()-t0:.0f}s")
        for st in GRID:
            q = score_config(caches[sigma], st)
            stage1.append({"nms_sigma": sigma, "score_thresh": st, **q})
            log(f"  sigma={sigma} st={st}: r={q['recall']:.3f} "
                f"p={q['precision']:.3f} floor={q['floor']:.3f}")
    results["global_sweep"] = stage1

    feasible = [r for r in stage1 if r["recall"] >= TARGET_RECALL
                and r["floor"] >= TARGET_FLOOR]
    best_global = max(feasible, key=lambda r: r["precision"]) if feasible \
        else max(stage1, key=lambda r: (r["recall"], r["precision"]))
    log(f"best global: {best_global}")
    results["best_global"] = best_global

    # ---- stage 2: per-class coordinate descent from the best global --
    sigma = best_global["nms_sigma"]
    cache = caches[sigma]
    thresh = [best_global["score_thresh"]] * 6
    best = score_config(cache, thresh)
    improved = True
    while improved:
        improved = False
        for c, st in itertools.product(range(6), GRID):
            cand = list(thresh)
            cand[c] = st
            q = score_config(cache, cand)
            if (q["recall"] >= TARGET_RECALL and q["floor"] >= TARGET_FLOOR
                    and q["precision"] > best["precision"] + 1e-9):
                thresh, best, improved = cand, q, True
    log(f"per-class thresholds {thresh}: r={best['recall']:.3f} "
        f"p={best['precision']:.3f} floor={best['floor']:.3f}")
    results["per_class"] = {"nms_sigma": sigma, "score_thresh": thresh,
                            **best}

    # ---- stage 3: verify the winner on the HELD-OUT seed ------------
    held = evaluate_instance_model(
        trainer, num_images=64, seed=HELD_OUT_SEED, iou_thresh=0.5,
        score_thresh=thresh, nms_sigma=sigma)
    log(f"HELD-OUT all-six: r={held['recall']:.3f} "
        f"p={held['precision']:.3f} "
        f"floor={min(held['per_class_recall'].values()):.3f} "
        f"per_class={held['per_class_recall']}")
    results["held_out_all6"] = held

    # baseline on the same held-out seed (round-3 shipped decode)
    held_base = evaluate_instance_model(
        trainer, num_images=64, seed=HELD_OUT_SEED, iou_thresh=0.5,
        score_thresh=0.25, nms_sigma=2.0)
    results["held_out_all6_round3_decode"] = held_base
    log(f"held-out round-3 decode: r={held_base['recall']:.3f} "
        f"p={held_base['precision']:.3f}")

    # default-mix gate must not regress (its own decode is unchanged,
    # but record the calibrated decode on it too)
    t_default = InstanceTrainer.load(SNAP, batch_size=16, seed=0)
    held_default = evaluate_instance_model(
        t_default, num_images=64, seed=HELD_OUT_SEED, iou_thresh=0.5,
        score_thresh=thresh, nms_sigma=sigma)
    results["held_out_default_mix_calibrated"] = held_default
    log(f"held-out default mix w/ calibrated decode: "
        f"r={held_default['recall']:.3f} p={held_default['precision']:.3f}")

    out = Path(__file__).parent / "calibrate_all6.json"
    out.write_text(json.dumps(results, indent=1))
    log(f"-> {out}")


if __name__ == "__main__":
    main()
