"""Round-4: false-positive mode analysis for the all-six instance
detector (follow-up to the decode-calibration refutation — see
BASELINE.md round-4 VERDICT #8 section).

The calibration sweep proved all-six precision at recall 0.82 is
score-RANKING-bound, not threshold-bound. Before choosing a
training-side lever, classify what the false positives actually ARE at
the shipped operating point (st=0.25, nms_sigma=2.0, held-out seed
10_000, 64 images):

  duplicate        IoU >= 0.5 with an already-matched same-class GT
                   (Matrix-NMS survivor) -> lever: NMS/embedding
  class_confusion  IoU >= 0.5 with a GT of another class
                   -> lever: classification head (hard negatives
                   between confusable families)
  fragment         max any-class IoU in [0.1, 0.5) -> lever: mask
                   quality (low IoU match, counts as FP+FN both)
  spurious         max any-class IoU < 0.1 -> lever: background
                   hard negatives

Writes runs/diagnose_all6_fp.json.
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

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
SEED = 10_000
N_IMAGES = 64
SCORE_THRESH = 0.25
NMS_SIGMA = 2.0
IOU_THRESH = 0.5


def classify_detections(dets, gm, gc, gv):
    """Greedy matching (the match_instances algorithm) + per-detection
    outcome labels."""
    masks = np.asarray(dets["masks"], bool)
    scores = np.asarray(dets["scores"], float)
    classes = np.asarray(dets["classes"], int)
    keep = scores >= SCORE_THRESH
    order = np.argsort(-scores[keep])
    det_idx = np.nonzero(keep)[0][order]

    gv = np.asarray(gv, bool)
    gt_idx = np.nonzero(gv)[0]
    gm_v = np.asarray(gm, bool)[gt_idx]
    gc_v = np.asarray(gc, int)[gt_idx]
    n_gt = len(gt_idx)
    matched = np.zeros(n_gt, bool)

    out = []
    gt_flat = gm_v.reshape(n_gt, -1) if n_gt else None
    gt_area = gt_flat.sum(axis=1) if n_gt else None
    for d in det_idx:
        dm = masks[d].reshape(-1)
        if not n_gt:
            out.append(("spurious", scores[d], int(classes[d]), 0.0))
            continue
        inter = (gt_flat & dm).sum(axis=1)
        union = gt_area + dm.sum() - inter
        iou = inter / np.maximum(union, 1)
        same = gc_v == classes[d]
        iou_same = np.where(same, iou, 0.0)
        cand = np.where(matched, -1.0, iou_same)
        j = int(np.argmax(cand))
        best_any = float(iou.max())
        if cand[j] >= IOU_THRESH:
            matched[j] = True
            out.append(("tp", scores[d], int(classes[d]), best_any))
        elif (iou_same >= IOU_THRESH).any():
            out.append(("duplicate", scores[d], int(classes[d]), best_any))
        elif (iou >= IOU_THRESH).any():
            out.append(("class_confusion", scores[d], int(classes[d]),
                        best_any))
        elif best_any >= 0.1:
            out.append(("fragment", scores[d], int(classes[d]), best_any))
        else:
            out.append(("spurious", scores[d], int(classes[d]), best_any))
    return out, int(matched.sum()), n_gt


def main():
    import jax

    from rfi_toolbox_tpu.preprocess import pipeline as P

    trainer = InstanceTrainer.load(SNAP, batch_size=16, seed=0,
                                   rfi_config=ALL6_EVAL)
    rows = []
    tp = n_gt = 0
    key = jax.random.key(SEED)
    done = 0
    t0 = time.perf_counter()
    while done < N_IMAGES:
        key, k = jax.random.split(key)
        batch = trainer._batch_fn(jax.random.split(k, 16))
        images = P.imagenet_normalize(P.extract_channels(batch["waterfall"]))
        take = min(16, N_IMAGES - done)
        dets = trainer.predict(np.asarray(images[:take]),
                               score_thresh=SCORE_THRESH,
                               nms_sigma=NMS_SIGMA)
        gms = np.asarray(batch["inst_masks"][:take])
        gcs = np.asarray(batch["inst_classes"][:take])
        gvs = np.asarray(batch["inst_valid"][:take])
        for i in range(take):
            r, t, g = classify_detections(dets[i], gms[i], gcs[i], gvs[i])
            rows.extend(r)
            tp += t
            n_gt += g
        done += take
        print(f"{done}/{N_IMAGES} in {time.perf_counter()-t0:.0f}s",
              flush=True)

    kinds = ("tp", "duplicate", "class_confusion", "fragment", "spurious")
    summary = {}
    for kind in kinds:
        sel = [r for r in rows if r[0] == kind]
        per_class = {}
        for _, _, c, _ in sel:
            per_class[c] = per_class.get(c, 0) + 1
        summary[kind] = {
            "count": len(sel),
            "mean_score": round(float(np.mean([r[1] for r in sel])), 3)
            if sel else None,
            "mean_best_any_iou": round(
                float(np.mean([r[3] for r in sel])), 3) if sel else None,
            "per_class": dict(sorted(per_class.items())),
        }
    n_det = len(rows)
    result = {
        "snapshot": SNAP, "seed": SEED, "num_images": N_IMAGES,
        "score_thresh": SCORE_THRESH, "nms_sigma": NMS_SIGMA,
        "n_det": n_det, "n_gt": n_gt, "tp": tp,
        "recall": round(tp / n_gt, 4), "precision": round(tp / n_det, 4),
        "fp_modes": summary,
    }
    Path("runs/diagnose_all6_fp.json").write_text(
        json.dumps(result, indent=1))
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
