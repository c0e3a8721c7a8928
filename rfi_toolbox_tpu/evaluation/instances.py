"""Instance-segmentation quality metrics for the SOLOLite model.

The BASELINE "Mask-RCNN-class" configuration (config 4) needs a quality
gate, not just a training loss: per-GT-event recall/precision at an IoU
threshold with correct class, COCO-style greedy matching. The reference
has no instance model at all (SURVEY.md §7 hard parts — the shared
IoU/F1 metrics justify parity); these metrics are the held-out evidence
that the dense SOLO head actually detects and classifies RFI events.
"""

import numpy as np

__all__ = ["match_instances", "evaluate_instance_model"]


def match_instances(detections, gt_masks, gt_classes, gt_valid=None,
                    iou_thresh=0.5, score_thresh=0.3, require_class=True):
    """Greedy score-ordered matching of detections to GT instances.

    Args:
        detections: dict with masks (K, H, W) bool, scores (K,),
            classes (K,) — one image's :func:`solo_decode` output.
        gt_masks: (M, H, W) bool ground-truth instance masks.
        gt_classes: (M,) int class ids.
        gt_valid: (M,) bool (padded rows False). Default: any-pixel.
        iou_thresh: match threshold.
        score_thresh: detections below are ignored. Scalar, or a
            per-class sequence/array indexed by class id (per-family
            score calibration — different event families run at very
            different confidence scales).
        require_class: matches must also agree on class.

    Returns dict:
        matched: (M,) bool per valid GT.
        best_iou: (M,) float best IoU per valid GT over same-class dets
            (regardless of threshold — diagnostic).
        n_gt, n_det, tp, recall, precision.
    """
    masks = np.asarray(detections["masks"], bool)
    scores = np.asarray(detections["scores"], float)
    classes = np.asarray(detections["classes"], int)
    gt_masks = np.asarray(gt_masks, bool)
    gt_classes = np.asarray(gt_classes, int)
    if gt_valid is None:
        gt_valid = gt_masks.any(axis=(1, 2))
    gt_valid = np.asarray(gt_valid, bool)

    if np.ndim(score_thresh) > 0 or isinstance(score_thresh, (list, tuple)):
        thresh = np.asarray(score_thresh, float)[classes]
    else:
        thresh = float(score_thresh)
    keep = scores >= thresh
    order = np.argsort(-scores[keep])
    det_idx = np.nonzero(keep)[0][order]

    gt_idx = np.nonzero(gt_valid)[0]
    n_gt = len(gt_idx)
    matched = np.zeros(len(gt_masks), bool)
    best_iou = np.zeros(len(gt_masks), float)

    if n_gt and len(det_idx):
        gt_flat = gt_masks[gt_idx].reshape(n_gt, -1)
        gt_area = gt_flat.sum(axis=1)
        for d in det_idx:
            dm = masks[d].reshape(-1)
            inter = (gt_flat & dm).sum(axis=1)
            union = gt_area + dm.sum() - inter
            iou = inter / np.maximum(union, 1)
            if require_class:
                iou = np.where(gt_classes[gt_idx] == classes[d], iou, 0.0)
            best_iou[gt_idx] = np.maximum(best_iou[gt_idx], iou)
            # greedy: best still-unmatched GT above threshold
            cand = np.where(matched[gt_idx], -1.0, iou)
            j = int(np.argmax(cand))
            if cand[j] >= iou_thresh:
                matched[gt_idx[j]] = True

    tp = int(matched.sum())
    n_det = int(keep.sum())
    return {
        "matched": matched,
        "best_iou": best_iou,
        "n_gt": n_gt,
        "n_det": n_det,
        "tp": tp,
        "recall": tp / n_gt if n_gt else 1.0,
        "precision": tp / n_det if n_det else (1.0 if n_gt == 0 else 0.0),
    }


def evaluate_instance_model(trainer, num_images=32, seed=10_000,
                            iou_thresh=0.5, score_thresh=0.3,
                            batch_size=None, mask_thresh=0.5,
                            nms_sigma=2.0):
    """Held-out quality of an InstanceTrainer on fixed-seed synthetic
    batches (a key stream disjoint from training, which uses seed+1).

    ``score_thresh`` may be a scalar or a per-class sequence indexed by
    class id (decode runs at the minimum so Matrix-NMS sees every
    candidate; the per-class cut applies at matching). ``nms_sigma`` is
    the Matrix-NMS decay strength.

    Returns dict: recall, precision, mean_best_iou, per_class_recall,
    n_gt, n_det — aggregated over all images.
    """
    import jax

    from ..preprocess import pipeline as P

    batch_size = batch_size or trainer.batch_size
    decode_thresh = (float(np.min(score_thresh))
                     if np.ndim(score_thresh) > 0
                     or isinstance(score_thresh, (list, tuple))
                     else float(score_thresh))
    tp = n_gt = n_det = 0
    best_ious = []
    per_class_tp = {}
    per_class_n = {}

    done = 0
    key = jax.random.key(seed)
    while done < num_images:
        key, k = jax.random.split(key)
        batch = trainer._batch_fn(jax.random.split(k, batch_size))
        images = P.imagenet_normalize(P.extract_channels(batch["waterfall"]))
        take = min(batch_size, num_images - done)
        dets = trainer.predict(np.asarray(images[:take]),
                               score_thresh=decode_thresh,
                               mask_thresh=mask_thresh,
                               nms_sigma=nms_sigma)
        gms = np.asarray(batch["inst_masks"][:take])
        gcs = np.asarray(batch["inst_classes"][:take])
        gvs = np.asarray(batch["inst_valid"][:take])
        for i in range(take):
            r = match_instances(dets[i], gms[i], gcs[i], gvs[i],
                                iou_thresh=iou_thresh,
                                score_thresh=score_thresh)
            tp += r["tp"]
            n_gt += r["n_gt"]
            n_det += r["n_det"]
            valid = gvs[i]
            best_ious.extend(r["best_iou"][valid].tolist())
            for c, m in zip(gcs[i][valid], r["matched"][valid]):
                per_class_n[int(c)] = per_class_n.get(int(c), 0) + 1
                per_class_tp[int(c)] = per_class_tp.get(int(c), 0) + int(m)
        done += take

    return {
        "recall": tp / n_gt if n_gt else 1.0,
        "precision": tp / n_det if n_det else 1.0,
        "mean_best_iou": float(np.mean(best_ious)) if best_ious else 0.0,
        "per_class_recall": {
            c: per_class_tp.get(c, 0) / n for c, n in sorted(per_class_n.items())
        },
        "n_gt": n_gt,
        "n_det": n_det,
        "num_images": num_images,
        "iou_thresh": iou_thresh,
        "score_thresh": (
            [float(t) for t in np.asarray(score_thresh).ravel()]
            if np.ndim(score_thresh) > 0
            or isinstance(score_thresh, (list, tuple))
            else score_thresh
        ),
        "nms_sigma": nms_sigma,
    }
