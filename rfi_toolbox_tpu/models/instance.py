"""SOLOLite: anchor-free dense instance segmentation for RFI events.

The BASELINE "Mask-RCNN-class" configuration asks for an instance
segmentation model at batch 64 on waterfall patches. ROI-align/NMS-heavy
detectron-style models are TPU-hostile (dynamic shapes, gather-scatter);
this is the TPU-first formulation (SURVEY.md §7.5): a SOLO-style dense
model where every step is a conv or a matmul —

- FPN-lite backbone: 4 stride-2 conv stages + top-down pathway.
- category head: S x S grid of per-cell class logits.
- kernel head: S x S grid of E-dim dynamic mask kernels.
- mask-feature head: unified (H/4, W/4, E) feature map.
- instance masks = einsum(kernels, mask features): one MXU matmul
  produces all S^2 candidate masks at once; no ROI ops anywhere.

Training uses center-region target assignment (each GT instance claims
the grid cells inside its scaled bounding box), focal loss for the
category grid and Dice loss for claimed masks. Inference thresholds the
category grid and applies Matrix-NMS (also fully vectorized).

Instance ground truth comes for free from the synthetic generator:
every RFI event is its own instance mask (see
``rfi_toolbox_tpu.synth.sample``); event types are the classes.
"""

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "SOLOLite",
    "solo_loss",
    "assign_targets",
    "solo_decode",
    "matrix_nms",
]


class _ConvBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), dtype=self.dtype)(x)
        return nn.relu(x)


class SOLOLite(nn.Module):
    """Dense instance segmentation head.

    Args:
        num_classes: instance categories (default 6 = RFI event types).
        grid_size: S (S*S candidate instances per image).
        embed_dim: dynamic-kernel dimensionality E.
        features: backbone base width.
    """

    num_classes: int = 6
    grid_size: int = 16
    embed_dim: int = 32
    features: int = 32
    dtype: jnp.dtype = jnp.float32
    space_to_depth: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C) -> dict with
        cate_logits (B, S, S, num_classes),
        kernels     (B, S, S, E),
        mask_feats  (B, H/4, W/4, E)."""
        f = self.features
        in_dtype = x.dtype
        x = x.astype(self.dtype)

        # --- backbone: 4 stages, strides 1/2/4/8 ------------------------
        if self.space_to_depth:
            # MXU-packed stem (opt-in, beyond-reference): the FPN only
            # consumes c3/c4, so the full-resolution f-channel stage —
            # 25% N-utilization of the 128-wide MXU at f=32, the same
            # pattern BASELINE.md's roofline table names for the UNet —
            # can be replaced by a 2x2 space-to-depth pack plus two
            # half-res blocks at 2f. Every downstream shape (c3, c4,
            # mask head at H/4, grid heads) is unchanged.
            from .unet import space_to_depth as _s2d

            c2 = _ConvBlock(f * 2, self.dtype)(_s2d(x), train)       # H/2
            c2 = _ConvBlock(f * 2, self.dtype)(c2, train)            # H/2
        else:
            c1 = _ConvBlock(f, self.dtype)(x, train)                 # H
            c2 = _ConvBlock(f * 2, self.dtype)(
                nn.max_pool(c1, (2, 2), strides=(2, 2)), train)      # H/2
        c3 = _ConvBlock(f * 4, self.dtype)(
            nn.max_pool(c2, (2, 2), strides=(2, 2)), train)          # H/4
        c4 = _ConvBlock(f * 8, self.dtype)(
            nn.max_pool(c3, (2, 2), strides=(2, 2)), train)          # H/8

        # --- FPN-lite top-down to H/4 -----------------------------------
        p4 = nn.Conv(f * 4, (1, 1), dtype=self.dtype)(c4)
        p4_up = jax.image.resize(
            p4, (p4.shape[0], c3.shape[1], c3.shape[2], p4.shape[3]),
            method="nearest",
        )
        p3 = nn.Conv(f * 4, (1, 1), dtype=self.dtype)(c3) + p4_up
        p3 = _ConvBlock(f * 4, self.dtype)(p3, train)               # H/4

        # --- mask feature head ------------------------------------------
        mask_feats = _ConvBlock(f * 4, self.dtype)(p3, train)
        mask_feats = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)(
            mask_feats
        )

        # --- grid heads: resize to S x S, then convs --------------------
        s = self.grid_size
        grid = jax.image.resize(
            p3, (p3.shape[0], s, s, p3.shape[3]), method="bilinear"
        )
        g = _ConvBlock(f * 4, self.dtype)(grid, train)
        g = _ConvBlock(f * 4, self.dtype)(g, train)
        cate_logits = nn.Conv(
            self.num_classes, (3, 3), padding="SAME", dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.6),  # focal-loss prior
        )(g)
        kernels = nn.Conv(self.embed_dim, (3, 3), padding="SAME",
                          dtype=self.dtype)(g)

        out_dtype = in_dtype if jnp.issubdtype(in_dtype, jnp.floating) \
            else jnp.float32
        return {
            "cate_logits": cate_logits.astype(out_dtype),
            "kernels": kernels.astype(out_dtype),
            "mask_feats": mask_feats.astype(out_dtype),
        }


def instance_masks_from_outputs(outputs):
    """All S^2 candidate masks per image via one matmul:
    (B, S, S, E) x (B, h, w, E) -> (B, S*S, h, w) logits."""
    kernels = outputs["kernels"]
    feats = outputs["mask_feats"]
    b, s, _, e = kernels.shape
    return jnp.einsum("bke,bhwe->bkhw", kernels.reshape(b, s * s, e), feats)


# ---------------------------------------------------------------------------
# target assignment
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("grid_size", "num_classes"))
def assign_targets(inst_masks, inst_classes, inst_valid, grid_size,
                   num_classes, center_frac=0.2):
    """Center-region assignment of GT instances to grid cells.

    Args:
        inst_masks: (B, M, H, W) float/bool per-instance masks.
        inst_classes: (B, M) int32 class ids.
        inst_valid: (B, M) bool.
        grid_size: S.
        center_frac: scale of the center region inside each instance's
            bounding box (SOLO's sigma).

    Returns:
        cate_target: (B, S, S) int32, num_classes = background.
        mask_target_idx: (B, S, S) int32 index into M (or -1).
    """
    b, m, h, w = inst_masks.shape
    masks = inst_masks.astype(jnp.float32)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    area = jnp.maximum(masks.sum(axis=(2, 3)), 1e-6)               # (B, M)
    cy = (masks * ys[None, None, :, None]).sum(axis=(2, 3)) / area
    cx = (masks * xs[None, None, None, :]).sum(axis=(2, 3)) / area
    any_y = masks.max(axis=3)                                       # (B, M, H)
    any_x = masks.max(axis=2)                                       # (B, M, W)
    y0 = jnp.argmax(any_y, axis=2).astype(jnp.float32)
    y1 = (h - 1 - jnp.argmax(any_y[:, :, ::-1], axis=2)).astype(jnp.float32)
    x0 = jnp.argmax(any_x, axis=2).astype(jnp.float32)
    x1 = (w - 1 - jnp.argmax(any_x[:, :, ::-1], axis=2)).astype(jnp.float32)
    # center-region half extents, floored at half a grid cell so every
    # instance claims at least its nearest cell regardless of size
    half_h = jnp.maximum((y1 - y0) * center_frac / 2, h / grid_size / 2)
    half_w = jnp.maximum((x1 - x0) * center_frac / 2, w / grid_size / 2)

    # grid cell centers in image coordinates
    s = grid_size
    gy = (jnp.arange(s, dtype=jnp.float32) + 0.5) * (h / s)         # (S,)
    gx = (jnp.arange(s, dtype=jnp.float32) + 0.5) * (w / s)

    in_y = (jnp.abs(gy[None, None, :] - cy[:, :, None]) <= half_h[:, :, None])
    in_x = (jnp.abs(gx[None, None, :] - cx[:, :, None]) <= half_w[:, :, None])
    claims = (
        in_y[:, :, :, None] & in_x[:, :, None, :]
        & inst_valid[:, :, None, None]
    )                                                                # (B,M,S,S)

    # smallest-area instance wins contested cells
    area_key = jnp.where(inst_valid[:, :, None, None], area[:, :, None, None],
                         jnp.inf)
    key = jnp.where(claims, area_key, jnp.inf)
    winner = jnp.argmin(key, axis=1)                                 # (B,S,S)
    has_winner = jnp.isfinite(jnp.min(key, axis=1))

    cls = jnp.take_along_axis(
        inst_classes, winner.reshape(b, -1), axis=1
    ).reshape(b, s, s)
    cate_target = jnp.where(has_winner, cls, num_classes)
    mask_target_idx = jnp.where(has_winner, winner, -1)
    return cate_target.astype(jnp.int32), mask_target_idx.astype(jnp.int32)


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------
def _focal_loss(logits, targets_onehot, alpha=0.25, gamma=2.0):
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets_onehot + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    alpha_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def solo_loss(outputs, inst_masks, inst_classes, inst_valid,
              mask_weight=3.0, mask_loss_stride=2, max_positive_cells=16):
    """Focal category loss + Dice mask loss for positive cells.

    Args:
        outputs: SOLOLite forward dict.
        inst_masks: (B, M, H, W) ground-truth instance masks.
        inst_classes / inst_valid: (B, M).
        mask_loss_stride: resolution of the Dice term relative to the
            GT (1 = full res, 2 = half, 4 = the mask head's native /4).
            Predicted mask logits are bilinearly resized to H/stride and
            the GT is SOFT-downsampled (area-averaging 'linear', not
            nearest): RFI events are routinely 1-10 pixels wide, and
            nearest-downsampling such GT to /4 erases thin strips
            entirely — zero gradient, capped IoU. Soft GT keeps
            fractional coverage so even 1-px strips supervise. Stride 2
            is the speed/quality sweet spot on TPU (full res quadruples
            the HBM traffic of the K-candidate upsample).
        max_positive_cells: Dice is only defined on POSITIVE grid cells
            (measured max ~12 of S^2=64 under the default RFI config),
            so the loss gathers the first P positive cells per image
            and builds/upsamples only those P candidate masks instead
            of all S^2 — a 4x cut in the mask branch's matmul + resize
            traffic. None = all cells (no cap).

    Returns:
        (total_loss, dict of components)
    """
    cate_logits = outputs["cate_logits"].astype(jnp.float32)
    b, s, _, num_classes = cate_logits.shape

    cate_t, mask_idx = assign_targets(
        inst_masks, inst_classes, inst_valid, s, num_classes
    )
    onehot = jax.nn.one_hot(cate_t, num_classes + 1)[..., :num_classes]
    cate_loss = _focal_loss(cate_logits, onehot).sum() / jnp.maximum(
        (cate_t < num_classes).sum(), 1
    )

    # mask loss on positive cells only: gather the first P positive
    # cells per image, then build just those candidate masks
    k = s * s
    flat_idx = mask_idx.reshape(b, k)
    total_positive = (flat_idx >= 0).sum()
    if max_positive_cells is not None and max_positive_cells < k:
        p = int(max_positive_cells)
        order = jnp.argsort(
            jnp.where(flat_idx >= 0, 0, 1), axis=1, stable=True
        )
        sel = order[:, :p]                                    # (B, P)
        flat_idx = jnp.take_along_axis(flat_idx, sel, axis=1)
        kern = jnp.take_along_axis(
            outputs["kernels"].reshape(b, k, -1).astype(jnp.float32),
            sel[:, :, None], axis=1,
        )
        mask_logits = jnp.einsum(
            "bpe,bhwe->bphw", kern,
            outputs["mask_feats"].astype(jnp.float32),
        )
        k = p
    else:
        mask_logits = instance_masks_from_outputs(outputs).astype(jnp.float32)
    mh, mw = mask_logits.shape[2], mask_logits.shape[3]
    gh, gw = inst_masks.shape[2], inst_masks.shape[3]
    th, tw = gh // mask_loss_stride, gw // mask_loss_stride
    if (th, tw) != (mh, mw):
        mask_logits = jax.image.resize(
            mask_logits, (b, k, th, tw), method="bilinear"
        )
        mh, mw = th, tw
    gt = inst_masks.astype(jnp.float32)
    if (th, tw) != (gh, gw):
        gt = jax.image.resize(
            gt, (inst_masks.shape[0], inst_masks.shape[1], th, tw),
            method="linear",
        )
    positive = flat_idx >= 0
    gather_idx = jnp.maximum(flat_idx, 0)
    gt_per_cell = jnp.take_along_axis(
        gt, gather_idx[:, :, None, None].repeat(mh, 2).repeat(mw, 3), axis=1
    )
    probs = jax.nn.sigmoid(mask_logits)
    inter = (probs * gt_per_cell).sum(axis=(2, 3))
    denom = probs.sum(axis=(2, 3)) + gt_per_cell.sum(axis=(2, 3))
    dice = 1.0 - (2 * inter + 1.0) / (denom + 1.0)
    mask_loss = (dice * positive).sum() / jnp.maximum(positive.sum(), 1)

    total = cate_loss + mask_weight * mask_loss
    # cells beyond the max_positive_cells cap receive no mask gradient;
    # report the count so dense custom configs see the truncation
    # instead of silently under-training (pick a larger cap if nonzero)
    dropped = (total_positive - positive.sum()).astype(jnp.int32)
    return total, {
        "cate_loss": cate_loss,
        "mask_loss": mask_loss,
        "dropped_mask_cells": dropped,
    }


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------
def matrix_nms(masks, scores, classes, sigma=2.0):
    """Matrix NMS (SOLOv2 eq. 4): decay scores by pairwise mask IoU —
    fully vectorized, no sequential suppression loop.

    Per target i the decay is ``min over suppressors j`` (same-class,
    higher-scored) of ``exp(-sigma * iou_ij^2) / exp(-sigma * c_j^2)``,
    where ``c_j`` is the max IoU suppressor j itself suffers from ITS
    higher-scored same-class masks — the compensation estimates the
    probability that j survives to do the suppressing.

    An earlier version compensated with the TARGET's max IoU against
    LOWER-scored masks instead; in duplicate clusters (3+ detections on
    one instance — routine for large broadband events firing several
    grid cells) that term equals the decay term and cancels it, so
    mid-ranked duplicates were never suppressed at any sigma. That was
    the round-4 FP diagnosis's dominant mode (48 of 95 held-out all-six
    false positives were duplicates; runs/diagnose_all6_fp.json) and
    the reason the decode-calibration sigma sweep barely moved
    precision.

    Args:
        masks: (K, h, w) binary masks.
        scores: (K,) confidence.
        classes: (K,) class ids.

    Returns:
        decayed scores (K,).
    """
    k = masks.shape[0]
    flat = masks.reshape(k, -1).astype(jnp.float32)
    inter = flat @ flat.T
    areas = flat.sum(axis=1)
    union = areas[:, None] + areas[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-6)
    same_class = classes[:, None] == classes[None, :]
    higher = scores[None, :] > scores[:, None]  # [i, j]: j outranks i
    sup = same_class & higher                   # j may suppress i
    # per mask: the max IoU it suffers from its own suppressors
    suffered = jnp.where(sup, iou, 0.0).max(axis=1)
    decay = jnp.where(
        sup, jnp.exp(-sigma * (iou**2 - suffered[None, :] ** 2)), 1.0
    ).min(axis=1)
    return scores * jnp.minimum(decay, 1.0)


def solo_decode(outputs, score_thresh=0.3, mask_thresh=0.5, nms_sigma=2.0,
                out_size=None):
    """Decode one image's outputs into scored instances (device-side,
    static shapes: returns all S^2 candidates with decayed scores;
    filter by score on host).

    Args:
        out_size: optional (H, W) — bilinearly upsample mask logits to
            this size before thresholding. The mask head runs at input/4
            resolution; thin RFI events (1-10 channel strips) need the
            upsample for faithful boundaries at full resolution.

    Returns dict: masks (S^2, h, w) bool, scores (S^2,), classes (S^2,).
    """
    cate = jax.nn.sigmoid(outputs["cate_logits"].astype(jnp.float32))
    s = cate.shape[0]
    num_classes = cate.shape[-1]
    scores2d = cate.reshape(s * s, num_classes)
    classes = jnp.argmax(scores2d, axis=1)
    scores = jnp.max(scores2d, axis=1)

    kernels = outputs["kernels"].reshape(s * s, -1)
    mask_logits = jnp.einsum("ke,hwe->khw", kernels,
                             outputs["mask_feats"])
    if out_size is not None:
        mask_logits = jax.image.resize(
            mask_logits, (s * s, *out_size), method="bilinear"
        )
    masks = jax.nn.sigmoid(mask_logits) > mask_thresh

    active = scores >= score_thresh
    scores = jnp.where(active, scores, 0.0)
    scores = matrix_nms(masks & active[:, None, None], scores, classes,
                        sigma=nms_sigma)
    return {"masks": masks, "scores": scores, "classes": classes}
