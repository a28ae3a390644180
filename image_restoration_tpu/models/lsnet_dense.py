"""Dense-prediction engines around the LSNet backbone — the TPU-native
equivalent of the reference's mmdetection/mmsegmentation stacks
(20251113_lsnet_xy/detection/configs/retinanet_lsnet_{t,s,b}_fpn_1x_coco.py
and segmentation/configs fpn heads). The reference only ships mm* config
shims plus the backbone registration (detection/model/, segmentation/model/);
here the neck, heads, target assignment, losses and static-shape decode/NMS
are implemented natively so detection/segmentation run without the mm*
framework stack (uninstallable in this environment, and CUDA-bound).

Everything is static-shape for XLA: ground-truth boxes are padded to a fixed
slot count with a validity mask, NMS is a fixed-iteration greedy pass over a
static top-k, and anchors are precomputed per (level, feature size).

Components:
* ``FPN``            — lateral 1x1 + top-down add + 3x3 smooth, optional
                       extra stride-2 levels (RetinaNet P6/P7).
* ``RetinaNetHead``  — shared 4-conv cls/box towers, A=9 anchors/cell
                       (3 scales x 3 ratios), class-prior bias init.
* ``RetinaNetLSNet`` — backbone + FPN + head; returns per-level maps.
* ``retinanet_loss`` — max-IoU assignment (pos>=0.5, neg<0.4, ignore between),
                       focal loss (alpha .25, gamma 2) + smooth-L1 on
                       encoded deltas — the mmdet RetinaNet recipe.
* ``decode_detections`` — delta decode + score top-k + class-aware greedy NMS.
* ``SemanticFPN``    — Semantic-FPN segmentation head (per-level conv+up to
                       1/4 scale, sum, classify, upsample) + CE/mIoU helpers.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from image_restoration_tpu.models.lsnet import LSNet
from image_restoration_tpu.models.registry import register_model
from image_restoration_tpu.ops.common import Conv


# --------------------------------------------------------------------- FPN --

class FPN(nn.Module):
    """mmdet-style FPN over 4 backbone stages (strides 8/16/32/64 for LSNet),
    plus ``extra_levels`` stride-2 convs on top (RetinaNet uses P6/P7 via
    add_extra_convs='on_input'/'on_output'; we use on-output)."""

    out_dim: int = 256
    extra_levels: int = 2
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        laterals = [Conv(self.out_dim, 1, use_bias=True, name=f"lateral_{i}",
                         **kw)(f) for i, f in enumerate(feats)]
        # top-down pathway: nearest x2 upsample + add
        for i in range(len(laterals) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(laterals[i], 2, axis=1), 2, axis=2)
            up = up[:, : laterals[i - 1].shape[1], : laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [Conv(self.out_dim, 3, padding=1, use_bias=True,
                     name=f"smooth_{i}", **kw)(l) for i, l in enumerate(laterals)]
        x = outs[-1]
        for j in range(self.extra_levels):
            x = Conv(self.out_dim, 3, padding=1, stride=2, use_bias=True,
                     name=f"extra_{j}", **kw)(nn.relu(x) if j else x)
            outs.append(x)
        return outs


# ------------------------------------------------------------------ anchors --

def make_anchors(sizes, strides, scales=(1.0, 2 ** (1 / 3), 2 ** (2 / 3)),
                 ratios=(0.5, 1.0, 2.0), octave_base: float = 4.0):
    """Per-level (H*W*A, 4) xyxy anchors. sizes: [(h, w)] per level."""
    all_anchors = []
    for (h, w), stride in zip(sizes, strides):
        base = octave_base * stride
        ws, hs = [], []
        for r in ratios:
            for s in scales:
                ws.append(base * s * (1.0 / r) ** 0.5)
                hs.append(base * s * r ** 0.5)
        ws = jnp.asarray(ws, jnp.float32)
        hs = jnp.asarray(hs, jnp.float32)
        cy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride
        cx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride
        cy, cx = jnp.meshgrid(cy, cx, indexing="ij")
        cx = cx.reshape(-1, 1)
        cy = cy.reshape(-1, 1)
        boxes = jnp.stack([cx - ws / 2, cy - hs / 2, cx + ws / 2, cy + hs / 2],
                          axis=-1)  # (HW, A, 4)
        all_anchors.append(boxes.reshape(-1, 4))
    return jnp.concatenate(all_anchors, axis=0)


def box_iou(a, b):
    """IoU matrix (N,4)x(M,4) xyxy."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(a[:, 3] - a[:, 1], 0)
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(b[:, 3] - b[:, 1], 0)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def encode_deltas(anchors, boxes):
    """mmdet DeltaXYWHBBoxCoder (means 0, stds 1)."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    bw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    bh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    bx = (boxes[:, 0] + boxes[:, 2]) / 2
    by = (boxes[:, 1] + boxes[:, 3]) / 2
    return jnp.stack([(bx - ax) / aw, (by - ay) / ah,
                      jnp.log(bw / aw), jnp.log(bh / ah)], axis=-1)


def decode_deltas(anchors, deltas, max_wh: float = 16.0):
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    bx = ax + deltas[:, 0] * aw
    by = ay + deltas[:, 1] * ah
    bw = aw * jnp.exp(jnp.clip(deltas[:, 2], -max_wh, max_wh))
    bh = ah * jnp.exp(jnp.clip(deltas[:, 3], -max_wh, max_wh))
    return jnp.stack([bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], -1)


# --------------------------------------------------------------- RetinaNet --

class RetinaNetHead(nn.Module):
    """Shared 4-conv towers; cls conv bias init -log((1-p)/p), p=0.01."""

    num_classes: int
    num_anchors: int = 9
    dim: int = 256
    stacked: int = 4
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        cls_out, box_out = [], []
        cls_convs = [Conv(self.dim, 3, padding=1, use_bias=True,
                          name=f"cls_{i}", **kw) for i in range(self.stacked)]
        box_convs = [Conv(self.dim, 3, padding=1, use_bias=True,
                          name=f"box_{i}", **kw) for i in range(self.stacked)]
        prior = float(-jnp.log((1 - 0.01) / 0.01))
        cls_pred = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                           padding=[(1, 1), (1, 1)], use_bias=True,
                           bias_init=nn.initializers.constant(prior),
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           name="cls_pred")
        box_pred = Conv(self.num_anchors * 4, 3, padding=1, use_bias=True,
                        name="box_pred", **kw)
        for f in feats:
            c = b = f
            for conv_c, conv_b in zip(cls_convs, box_convs):
                c = nn.relu(conv_c(c))
                b = nn.relu(conv_b(b))
            n, h, w, _ = f.shape
            cls_out.append(cls_pred(c).reshape(n, h * w * self.num_anchors,
                                               self.num_classes))
            box_out.append(box_pred(b).reshape(n, h * w * self.num_anchors, 4))
        return (jnp.concatenate(cls_out, axis=1).astype(jnp.float32),
                jnp.concatenate(box_out, axis=1).astype(jnp.float32))


@register_model("retinanet_lsnet")
class RetinaNetLSNet(nn.Module):
    """LSNet backbone + FPN + RetinaNet head
    (retinanet_lsnet_t_fpn_1x_coco.py capability equivalent)."""

    num_classes: int = 80
    embed_dim: Sequence[int] = (64, 128, 192, 256)
    depth: Sequence[int] = (1, 2, 3, 4)
    img_size: int = 512
    fpn_dim: int = 256
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = LSNet(img_size=self.img_size, embed_dim=self.embed_dim,
                         depth=self.depth, num_classes=0, features=True,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="backbone")
        feats = backbone(x, train=train)
        feats = FPN(self.fpn_dim, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="neck")(feats)
        cls, box = RetinaNetHead(self.num_classes, dim=self.fpn_dim,
                                 dtype=self.dtype,
                                 param_dtype=self.param_dtype,
                                 name="bbox_head")(feats)
        sizes = [(f.shape[1], f.shape[2]) for f in feats]
        return cls, box, sizes

    def anchor_strides(self):
        return (8, 16, 32, 64, 128, 256)


def retinanet_loss(cls_logits, box_deltas, anchors, gt_boxes, gt_labels,
                   gt_valid, num_classes: int, alpha: float = 0.25,
                   gamma: float = 2.0, beta: float = 1.0 / 9.0):
    """Per-image RetinaNet loss with max-IoU assignment.

    gt_boxes (G,4) padded, gt_labels (G,), gt_valid (G,) bool. Anchors with
    IoU>=0.5 are positive, <0.4 negative, in between ignored; every GT also
    claims its best anchor (mmdet MaxIoUAssigner semantics, vectorized)."""
    iou = box_iou(anchors, gt_boxes) * gt_valid[None, :]          # (N, G)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    pos = best_iou >= 0.5
    neg = best_iou < 0.4
    # force-match each valid GT's argmax anchor
    gt_best_anchor = jnp.argmax(iou, axis=0)                      # (G,)
    force = jnp.zeros(anchors.shape[0], bool).at[gt_best_anchor].set(gt_valid)
    forced_gt = jnp.zeros(anchors.shape[0], jnp.int32).at[gt_best_anchor].set(
        jnp.arange(gt_boxes.shape[0], dtype=jnp.int32))
    best_gt = jnp.where(force, forced_gt, best_gt)
    pos = pos | force
    neg = neg & ~force

    tgt_onehot = jax.nn.one_hot(gt_labels[best_gt], num_classes) * pos[:, None]
    p = jax.nn.sigmoid(cls_logits)
    ce = optax_sigmoid_ce(cls_logits, tgt_onehot)
    p_t = p * tgt_onehot + (1 - p) * (1 - tgt_onehot)
    a_t = alpha * tgt_onehot + (1 - alpha) * (1 - tgt_onehot)
    focal = a_t * (1 - p_t) ** gamma * ce
    cls_mask = (pos | neg)[:, None]
    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    cls_loss = jnp.sum(focal * cls_mask) / num_pos

    tgt_deltas = encode_deltas(anchors, gt_boxes[best_gt])
    d = jnp.abs(box_deltas - tgt_deltas)
    sl1 = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    box_loss = jnp.sum(sl1 * pos[:, None]) / num_pos
    return cls_loss, box_loss


def optax_sigmoid_ce(logits, labels):
    """Numerically stable sigmoid BCE (kept local: no optax dep in models)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))


def decode_detections(cls_logits, box_deltas, anchors, top_k: int = 200,
                      score_thr: float = 0.05, iou_thr: float = 0.5,
                      max_det: int = 100):
    """Static-shape per-image decode: flatten (anchor, class) scores, take
    top_k, decode boxes, greedy class-aware NMS over the fixed candidate set.
    Returns (boxes (max_det,4), scores (max_det,), labels (max_det,)) with
    score 0 padding."""
    n, c = cls_logits.shape
    scores = jax.nn.sigmoid(cls_logits).reshape(-1)
    k = min(top_k, scores.shape[0])
    top_scores, flat_idx = jax.lax.top_k(scores, k)
    anchor_idx = flat_idx // c
    labels = flat_idx % c
    boxes = decode_deltas(anchors[anchor_idx], box_deltas[anchor_idx])
    valid = top_scores >= score_thr

    # greedy NMS over the k candidates (already score-sorted)
    iou = box_iou(boxes, boxes)
    same_cls = labels[:, None] == labels[None, :]
    suppress_pair = (iou > iou_thr) & same_cls

    def body(i, keep):
        alive_i = keep[i]
        kill = suppress_pair[i] & (jnp.arange(k) > i) & alive_i
        return keep & ~kill

    keep = jax.lax.fori_loop(0, k, body, valid)
    final_scores = jnp.where(keep, top_scores, 0.0)
    order = jnp.argsort(-final_scores)[:max_det]
    return boxes[order], final_scores[order], labels[order]


# ------------------------------------------------------------- SemanticFPN --

@register_model("semanticfpn_lsnet")
class SemanticFPNLSNet(nn.Module):
    """Semantic-FPN segmentation over LSNet (segmentation/configs fpn_lsnet
    capability equivalent): every FPN level is conv+GN+relu'd and upsampled
    to the stride-8 map, summed, classified, and upsampled to input size."""

    num_classes: int = 150
    embed_dim: Sequence[int] = (64, 128, 192, 256)
    depth: Sequence[int] = (1, 2, 3, 4)
    img_size: int = 512
    fpn_dim: int = 256
    seg_dim: int = 128
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        backbone = LSNet(img_size=self.img_size, embed_dim=self.embed_dim,
                         depth=self.depth, num_classes=0, features=True,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name="backbone")
        feats = backbone(x, train=train)
        feats = FPN(self.fpn_dim, extra_levels=0, dtype=self.dtype,
                    param_dtype=self.param_dtype, name="neck")(feats)
        base_h, base_w = feats[0].shape[1:3]
        merged = 0.0
        for i, f in enumerate(feats):
            g = Conv(self.seg_dim, 3, padding=1, use_bias=True,
                     name=f"scale_{i}", **kw)(f)
            g = nn.relu(nn.GroupNorm(num_groups=32, dtype=jnp.float32,
                                     param_dtype=self.param_dtype,
                                     name=f"gn_{i}")(g))
            for _ in range(i):
                g = jnp.repeat(jnp.repeat(g, 2, axis=1), 2, axis=2)
            merged = merged + g[:, :base_h, :base_w]
        logits = Conv(self.num_classes, 1, use_bias=True, name="classifier",
                      **kw)(merged)
        logits = jax.image.resize(logits.astype(jnp.float32),
                                  (x.shape[0], h, w, self.num_classes),
                                  method="bilinear")
        return logits


def segmentation_ce_loss(logits, labels, ignore_index: int = 255):
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    ll = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(ll, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)


def mean_iou(pred_labels, labels, num_classes: int, ignore_index: int = 255):
    valid = labels != ignore_index
    ious = []
    for c in range(num_classes):
        p = (pred_labels == c) & valid
        t = (labels == c) & valid
        inter = jnp.sum(p & t)
        union = jnp.sum(p | t)
        ious.append(jnp.where(union > 0, inter / jnp.maximum(union, 1), jnp.nan))
    ious = jnp.stack(ious)
    return jnp.nanmean(ious), ious
