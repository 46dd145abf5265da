"""Single-object YOLO pose loss + train step.

The reference delegates training entirely to ultralytics ``model.train()``
(*_yolo12n/train.py:479-518). Here the loss is re-built for the one-card
task (every image has exactly one box built from the 4 corners with 5%
padding — the reference's label converter, *_yolo12n/dataset.py:121-152):

- assignment: TAL-lite — the top-k anchors (across levels) by center
  distance whose cell centers lie inside the GT box are positives;
- classification: BCE with IoU-quality soft targets on positives;
- box: CIoU on DFL-decoded boxes (positives);
- DFL: cross-entropy on the two integer bins adjacent to each ltrb target;
- keypoints: corner-heatmap formulation — per-anchor per-corner confidence
  trained with CornerNet penalty-reduced focal toward a pixel-space Gaussian
  of the anchor-to-corner distance, plus Huber on local sub-pixel offsets
  for anchors near the corner (replaces center-anchored regression, which
  capped at 7 px mean error).

Everything is dense masked math over the fixed anchor set — no dynamic
shapes, single fused XLA program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mtg_card_image_segmentation_tpu.models.yolo12_pose import (
    KPT_OFFSET_SCALE,
    REG_MAX,
    STRIDES,
    decode_predictions,
)
from mtg_card_image_segmentation_tpu.parallel.mesh import batch_spec, is_trivial
from mtg_card_image_segmentation_tpu.training.state import SegTrainState

TOP_K = 10
# Corner-heatmap supervision (pixels; level-independent, see models/yolo12_pose.py)
KPT_SIGMA_PX = 6.0
KPT_RADIUS_PX = 12.0


def corners_to_box(corners_xy: jax.Array, pad: float = 0.05) -> jax.Array:
    """(B, 4, 2) corner pixels -> (B, 4) xyxy with 5% padding
    (*_yolo12n/dataset.py:121-152)."""
    mn = jnp.min(corners_xy, axis=1)
    mx = jnp.max(corners_xy, axis=1)
    wh = mx - mn
    return jnp.concatenate([mn - pad * wh, mx + pad * wh], axis=-1)


def _anchor_centers(shapes: List[Tuple[int, int]]) -> jax.Array:
    """Flattened (A, 3) [cx_px, cy_px, stride] for all levels."""
    pts = []
    for (h, w), stride in zip(shapes, STRIDES):
        cx = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) * stride
        cy = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) * stride
        s = jnp.full((h, w), float(stride))
        pts.append(jnp.stack([cx, cy, s], axis=-1).reshape(-1, 3))
    return jnp.concatenate(pts, axis=0)


def _ciou(box1: jax.Array, box2: jax.Array) -> jax.Array:
    """Complete IoU between (..., 4) xyxy boxes."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    a1 = (box1[..., 2] - box1[..., 0]) * (box1[..., 3] - box1[..., 1])
    a2 = (box2[..., 2] - box2[..., 0]) * (box2[..., 3] - box2[..., 1])
    union = a1 + a2 - inter + 1e-7
    iou = inter / union
    # enclosing box diagonal + center distance
    ex1 = jnp.minimum(box1[..., 0], box2[..., 0])
    ey1 = jnp.minimum(box1[..., 1], box2[..., 1])
    ex2 = jnp.maximum(box1[..., 2], box2[..., 2])
    ey2 = jnp.maximum(box1[..., 3], box2[..., 3])
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2 + 1e-7
    d2 = (
        ((box1[..., 0] + box1[..., 2]) - (box2[..., 0] + box2[..., 2])) ** 2
        + ((box1[..., 1] + box1[..., 3]) - (box2[..., 1] + box2[..., 3])) ** 2
    ) / 4.0
    w1 = box1[..., 2] - box1[..., 0]
    h1 = jnp.maximum(box1[..., 3] - box1[..., 1], 1e-7)
    w2 = box2[..., 2] - box2[..., 0]
    h2 = jnp.maximum(box2[..., 3] - box2[..., 1], 1e-7)
    v = (4 / jnp.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = v / (1 - iou + v + 1e-7)
    return iou - d2 / c2 - alpha * v


def yolo_pose_loss(
    level_outputs: List[jax.Array],
    gt_corners: jax.Array,  # (B, 4, 2) pixels
    num_keypoints: int = 4,
    cls_weight: float = 0.5,
    box_weight: float = 7.5,
    dfl_weight: float = 1.5,
    kpt_weight: float = 12.0,
    kobj_weight: float = 1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    shapes = [(o.shape[1], o.shape[2]) for o in level_outputs]
    anchors = _anchor_centers(shapes)  # (A, 3)
    boxes_p, scores_p, kpts_p = decode_predictions(
        level_outputs, num_classes=1, num_keypoints=num_keypoints
    )
    b = boxes_p.shape[0]
    a = anchors.shape[0]

    gt_box = corners_to_box(gt_corners)  # (B, 4)
    gt_cx = (gt_box[:, 0] + gt_box[:, 2]) / 2
    gt_cy = (gt_box[:, 1] + gt_box[:, 3]) / 2

    inside = (
        (anchors[None, :, 0] > gt_box[:, None, 0])
        & (anchors[None, :, 0] < gt_box[:, None, 2])
        & (anchors[None, :, 1] > gt_box[:, None, 1])
        & (anchors[None, :, 1] < gt_box[:, None, 3])
    )
    dist = jnp.sqrt(
        (anchors[None, :, 0] - gt_cx[:, None]) ** 2
        + (anchors[None, :, 1] - gt_cy[:, None]) ** 2
    )
    masked_dist = jnp.where(inside, dist, jnp.inf)
    _, topk_idx = jax.lax.top_k(-masked_dist, TOP_K)  # (B, K)
    pos_mask = jnp.zeros((b, a), bool)
    pos_mask = jax.vmap(lambda m, i, ins: m.at[i].set(True) & ins)(
        pos_mask, topk_idx, inside
    )
    num_pos = jnp.maximum(jnp.sum(pos_mask, axis=1), 1)  # (B,)
    posf = pos_mask.astype(jnp.float32)

    # --- cls BCE with IoU soft targets ---
    iou = jnp.clip(_ciou(boxes_p, gt_box[:, None, :]), 0.0, 1.0)
    cls_target = posf * jax.lax.stop_gradient(iou)
    logits = jnp.squeeze(
        jnp.concatenate(
            [o[..., 4 * REG_MAX : 4 * REG_MAX + 1].reshape(b, -1, 1) for o in level_outputs],
            axis=1,
        ),
        -1,
    )
    bce = optax_sigmoid_bce(logits, cls_target)
    cls_loss = jnp.mean(jnp.sum(bce, axis=1) / num_pos)

    # --- box CIoU on positives ---
    ciou = _ciou(boxes_p, gt_box[:, None, :])
    box_loss = jnp.mean(jnp.sum((1.0 - ciou) * posf, axis=1) / num_pos)

    # --- DFL on positives ---
    ltrb_target = jnp.stack(
        [
            (anchors[None, :, 0] - gt_box[:, None, 0]),
            (anchors[None, :, 1] - gt_box[:, None, 1]),
            (gt_box[:, None, 2] - anchors[None, :, 0]),
            (gt_box[:, None, 3] - anchors[None, :, 1]),
        ],
        axis=-1,
    ) / anchors[None, :, 2:3]
    ltrb_target = jnp.clip(ltrb_target, 0, REG_MAX - 1.01)
    box_logits = jnp.concatenate(
        [o[..., : 4 * REG_MAX].reshape(b, -1, 4, REG_MAX) for o in level_outputs],
        axis=1,
    )
    lo = jnp.floor(ltrb_target)
    hi = lo + 1
    w_hi = ltrb_target - lo
    logp = jax.nn.log_softmax(box_logits, axis=-1)
    take = lambda idx: jnp.take_along_axis(logp, idx[..., None].astype(jnp.int32), axis=-1)[..., 0]
    dfl = -(take(lo) * (1 - w_hi) + take(hi) * w_hi)
    dfl_loss = jnp.mean(
        jnp.sum(jnp.mean(dfl, axis=-1) * posf, axis=1) / num_pos
    )

    # --- keypoints: corner heatmap (focal) + local sub-pixel offsets ---
    # Per (anchor, keypoint): confidence trained toward a Gaussian of the
    # anchor-center-to-corner distance in *pixels* (sigma constant across
    # levels, so the dense P3 grid always holds the peak and wins the decode
    # argmax), offsets trained only on anchors within KPT_RADIUS_PX of the
    # corner, in KPT_OFFSET_SCALE-pixel units (level-independent precision).
    # This replaces center-anchored regression, whose stride-granular output
    # capped round 2 at 7.03 px mean error / 39% acc@5px.
    kpt_raw = jnp.concatenate(
        [
            o[..., 4 * REG_MAX + 1 :].reshape(b, -1, num_keypoints, 3)
            for o in level_outputs
        ],
        axis=1,
    )  # (B, A, K, 3) raw head outputs [dx, dy, conf]
    dxy = gt_corners[:, None, :, :] - anchors[None, :, None, :2]  # (B,A,K,2)
    d2k = jnp.sum(dxy**2, axis=-1)  # (B, A, K) px^2
    t = jnp.exp(-d2k / (2.0 * KPT_SIGMA_PX**2))
    logit = kpt_raw[..., 2]
    p = jax.nn.sigmoid(logit)
    # CornerNet penalty-reduced focal with soft Gaussian targets
    # (https://arxiv.org/abs/1808.01244 eq. 1), stable via softplus.
    focal = t * (1 - p) ** 2 * jax.nn.softplus(-logit) + (
        (1 - t) ** 4 * p**2 * jax.nn.softplus(logit)
    )
    kobj_loss = jnp.mean(
        jnp.sum(focal, axis=(1, 2)) / (jnp.sum(t, axis=(1, 2)) + 1.0)
    )

    off_mask = (d2k < KPT_RADIUS_PX**2).astype(jnp.float32)
    off_target = dxy / KPT_OFFSET_SCALE
    off_err = kpt_raw[..., :2] - off_target
    huber = jnp.sum(
        jnp.where(
            jnp.abs(off_err) < 1.0,
            0.5 * off_err**2,
            jnp.abs(off_err) - 0.5,
        ),
        axis=-1,
    )
    kpt_loss = jnp.mean(
        jnp.sum(huber * off_mask, axis=(1, 2))
        / (jnp.sum(off_mask, axis=(1, 2)) + 1e-6)
    )

    total = (
        cls_weight * cls_loss
        + box_weight * box_loss
        + dfl_weight * dfl_loss
        + kpt_weight * kpt_loss
        + kobj_weight * kobj_loss
    )
    parts = {
        "loss": total,
        "cls_loss": cls_loss,
        "box_loss": box_loss,
        "dfl_loss": dfl_loss,
        "kpt_loss": kpt_loss,
        "kobj_loss": kobj_loss,
        "count": jnp.asarray(1.0),
    }
    return total, parts


def optax_sigmoid_bce(logits, targets):
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def make_yolo_train_step(
    num_keypoints: int = 4, mesh: Optional[Mesh] = None, donate: bool = True
):
    def train_step(state: SegTrainState, images: jax.Array, corners: jax.Array):
        def loss_fn(params):
            outs, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            loss, parts = yolo_pose_loss(outs, corners, num_keypoints)
            return loss, (parts, mutated["batch_stats"])

        (loss, (parts, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        return state, parts

    kwargs: Dict[str, Any] = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None and not is_trivial(mesh):
        replicated = NamedSharding(mesh, P())
        kwargs["in_shardings"] = (
            replicated,
            NamedSharding(mesh, batch_spec()),
            replicated,
        )
        kwargs["out_shardings"] = (replicated, replicated)
    return jax.jit(train_step, **kwargs)
