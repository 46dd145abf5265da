"""YOLO12n-pose corner detector, NHWC Flax.

Behavioral spec: the reference's ultralytics graph
(train-pose-estimation_yolo12n/yolo12n-pose.yaml) at scale n
(depth 0.5, width 0.25): Conv/C3k2/A2C2f backbone with area attention,
PAN-style head, anchor-free Detect+Pose head with DFL box regression and
(K, 3) keypoint regression per anchor. The wrapper API mirrors
CornerDetectionModel (*_yolo12n/model.py:12-310): create/predict/decode
with max_det=1 (exactly one card).

Implementation notes (TPU-first):
- Area attention (A2C2f/ABlock/AAttn) is plain softmax attention over
  spatial tokens split into ``area`` groups — einsum on the MXU, no masks.
- DFL decode (softmax expectation over 16 distance bins) and the
  kpt/box/anchor decode are fused into the jitted forward; "NMS" for this
  single-object task is top-1 anchor selection (ultralytics predict with
  max_det=1, model.py:215-264).
- All convs are Conv+BN+SiLU (ultralytics Conv); BN folds via
  export/fold_bn.py like the other families.
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtg_card_image_segmentation_tpu.ops.resize import nearest_resize

# scale n
WIDTH = 0.25
DEPTH = 0.5
REG_MAX = 16


def _c(ch: int, max_channels: int = 1024) -> int:
    return int(min(ch, max_channels) * WIDTH)


def _n(n: int) -> int:
    return max(1, round(n * DEPTH))


class ConvBNSiLU(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    act: bool = True
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.fold_bn,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x.astype(self.dtype))
        if not self.fold_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.97, epsilon=1e-3,
                dtype=jnp.float32, param_dtype=self.param_dtype, name="bn",
            )(x.astype(jnp.float32))
        if self.act:
            x = nn.silu(x)
        return x.astype(self.dtype)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    e: float = 0.5
    k1: int = 3
    k2: int = 3
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.features * self.e)
        kw = dict(fold_bn=self.fold_bn, dtype=self.dtype, param_dtype=self.param_dtype)
        y = ConvBNSiLU(hidden, self.k1, name="cv1", **kw)(x, train)
        y = ConvBNSiLU(self.features, self.k2, name="cv2", **kw)(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            y = (y.astype(jnp.float32) + x.astype(jnp.float32)).astype(self.dtype)
        return y


class C3k(nn.Module):
    features: int
    n: int = 2
    shortcut: bool = True
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.features // 2
        kw = dict(fold_bn=self.fold_bn, dtype=self.dtype, param_dtype=self.param_dtype)
        a = ConvBNSiLU(c_, 1, name="cv1", **kw)(x, train)
        b = ConvBNSiLU(c_, 1, name="cv2", **kw)(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, e=1.0, name=f"m{i}", **kw)(a, train)
        return ConvBNSiLU(self.features, 1, name="cv3", **kw)(
            jnp.concatenate([a, b], axis=-1), train
        )


class C3k2(nn.Module):
    """C2f-style split block (ultralytics C3k2)."""

    features: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    shortcut: bool = True
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.features * self.e)
        kw = dict(fold_bn=self.fold_bn, dtype=self.dtype, param_dtype=self.param_dtype)
        y = ConvBNSiLU(2 * c, 1, name="cv1", **kw)(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                ys.append(C3k(c, 2, self.shortcut, name=f"m{i}", **kw)(ys[-1], train))
            else:
                ys.append(
                    Bottleneck(c, self.shortcut, e=0.5, name=f"m{i}", **kw)(ys[-1], train)
                )
        return ConvBNSiLU(self.features, 1, name="cv2", **kw)(
            jnp.concatenate(ys, axis=-1), train
        )


class AAttn(nn.Module):
    """Area attention (ultralytics AAttn): softmax attention over spatial
    tokens within ``area`` horizontal strips + depthwise positional conv."""

    dim: int
    num_heads: int
    area: int = 1
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        kw = dict(fold_bn=self.fold_bn, dtype=self.dtype, param_dtype=self.param_dtype)
        qkv = ConvBNSiLU(self.dim * 3, 1, act=False, name="qkv", **kw)(x, train)
        n = h * w
        assert n % self.area == 0, f"{h}x{w} tokens not divisible by area {self.area}"
        head_dim = self.dim // self.num_heads
        t = qkv.reshape(b * self.area, n // self.area, 3, self.num_heads, head_dim)
        q, k, v = t[:, :, 0], t[:, :, 1], t[:, :, 2]
        scale = head_dim**-0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v)
        out = out.reshape(b, h, w, self.dim)
        vv = v.reshape(b, h, w, self.dim)
        pe = ConvBNSiLU(
            self.dim, 7, groups=self.dim, act=False, name="pe", **kw
        )(vv, train)
        out = out + pe
        return ConvBNSiLU(self.dim, 1, act=False, name="proj", **kw)(out, train)


class ABlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 1.2
    area: int = 1
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(fold_bn=self.fold_bn, dtype=self.dtype, param_dtype=self.param_dtype)
        x = (
            x.astype(jnp.float32)
            + AAttn(self.dim, self.num_heads, self.area, name="attn", **kw)(
                x, train
            ).astype(jnp.float32)
        ).astype(self.dtype)
        hidden = int(self.dim * self.mlp_ratio)
        y = ConvBNSiLU(hidden, 1, name="mlp1", **kw)(x, train)
        y = ConvBNSiLU(self.dim, 1, act=False, name="mlp2", **kw)(y, train)
        return (x.astype(jnp.float32) + y.astype(jnp.float32)).astype(self.dtype)


class A2C2f(nn.Module):
    features: int
    n: int = 1
    a2: bool = True
    area: int = 1
    mlp_ratio: float = 2.0
    e: float = 0.5
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.e)
        kw = dict(fold_bn=self.fold_bn, dtype=self.dtype, param_dtype=self.param_dtype)
        y = ConvBNSiLU(c_, 1, name="cv1", **kw)(x, train)
        ys = [y]
        for i in range(self.n):
            z = ys[-1]
            if self.a2:
                for j in range(2):
                    z = ABlock(
                        c_, max(1, c_ // 32), self.mlp_ratio, self.area,
                        name=f"m{i}_{j}", **kw,
                    )(z, train)
            else:
                z = C3k(c_, 2, name=f"m{i}", **kw)(z, train)
            ys.append(z)
        return ConvBNSiLU(self.features, 1, name="cv2", **kw)(
            jnp.concatenate(ys, axis=-1), train
        )


def _kpt_bias_init(kpt_dim: int):
    def init(key, shape, dtype=jnp.float32):
        b = jnp.zeros(shape, dtype)
        if kpt_dim == 3:
            b = b.at[2::3].set(-4.595)
        return b

    return init


class YOLO12PoseBackboneHead(nn.Module):
    """Full yolo12n-pose graph; returns per-level raw head outputs."""

    num_classes: int = 1
    num_keypoints: int = 4
    kpt_dim: int = 3
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(fold_bn=self.fold_bn, dtype=self.dtype, param_dtype=self.param_dtype)
        # --- backbone (yaml rows 0-8) ---
        x = ConvBNSiLU(_c(64), 3, 2, name="l0", **kw)(x, train)  # P1/2
        x = ConvBNSiLU(_c(128), 3, 2, name="l1", **kw)(x, train)  # P2/4
        x = C3k2(_c(256), _n(2), False, 0.25, name="l2", **kw)(x, train)
        x = ConvBNSiLU(_c(256), 3, 2, name="l3", **kw)(x, train)  # P3/8
        p3_bb = C3k2(_c(512), _n(2), False, 0.25, name="l4", **kw)(x, train)
        x = ConvBNSiLU(_c(512), 3, 2, name="l5", **kw)(p3_bb, train)  # P4/16
        p4_bb = A2C2f(_c(512), _n(4), True, 4, name="l6", **kw)(x, train)
        x = ConvBNSiLU(_c(1024), 3, 2, name="l7", **kw)(p4_bb, train)  # P5/32
        p5_bb = A2C2f(_c(1024), _n(4), True, 1, name="l8", **kw)(x, train)

        # --- head (yaml rows 9-20) ---
        up = nearest_resize(p5_bb, p4_bb.shape[1], p4_bb.shape[2])
        x = jnp.concatenate([up, p4_bb], axis=-1)
        p4_mid = A2C2f(_c(512), _n(2), False, name="l11", **kw)(x, train)
        up = nearest_resize(p4_mid, p3_bb.shape[1], p3_bb.shape[2])
        x = jnp.concatenate([up, p3_bb], axis=-1)
        p3 = A2C2f(_c(256), _n(2), False, name="l14", **kw)(x, train)
        x = ConvBNSiLU(_c(256), 3, 2, name="l15", **kw)(p3, train)
        x = jnp.concatenate([x, p4_mid], axis=-1)
        p4 = A2C2f(_c(512), _n(2), False, name="l17", **kw)(x, train)
        x = ConvBNSiLU(_c(512), 3, 2, name="l18", **kw)(p4, train)
        x = jnp.concatenate([x, p5_bb], axis=-1)
        p5 = C3k2(_c(1024), _n(2), True, name="l20", **kw)(x, train)

        # --- Pose head (Detect + kpt branch) per level ---
        nk = self.num_keypoints * self.kpt_dim
        ch0 = p3.shape[-1]
        c2 = max(16, ch0 // 4, REG_MAX * 4)
        c3 = max(ch0, min(self.num_classes, 100))
        c4 = max(ch0 // 4, nk)
        outs = []
        for li, feat in enumerate((p3, p4, p5)):
            b = ConvBNSiLU(c2, 3, name=f"box{li}_0", **kw)(feat, train)
            b = ConvBNSiLU(c2, 3, name=f"box{li}_1", **kw)(b, train)
            b = nn.Conv(4 * REG_MAX, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"box{li}_2")(b)
            # v10-style lightweight cls head (DWConv+1x1 pairs)
            c = ConvBNSiLU(feat.shape[-1], 3, groups=feat.shape[-1],
                           name=f"cls{li}_0dw", **kw)(feat, train)
            c = ConvBNSiLU(c3, 1, name=f"cls{li}_0pw", **kw)(c, train)
            c = ConvBNSiLU(c3, 3, groups=c3, name=f"cls{li}_1dw", **kw)(c, train)
            c = ConvBNSiLU(c3, 1, name=f"cls{li}_1pw", **kw)(c, train)
            c = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"cls{li}_2",
                        # 1% objectness prior (ultralytics bias_init): keeps
                        # the dense BCE term sane from step 0
                        bias_init=nn.initializers.constant(-4.595))(c)
            k = ConvBNSiLU(c4, 3, name=f"kpt{li}_0", **kw)(feat, train)
            k = ConvBNSiLU(c4, 3, name=f"kpt{li}_1", **kw)(k, train)
            k = nn.Conv(nk, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name=f"kpt{li}_2",
                        # 1% prior on the per-corner confidence channels
                        # (layout (K, kpt_dim) flattened, conf at index 2):
                        # keeps the penalty-reduced focal's dense negative
                        # term near zero from step 0.
                        bias_init=_kpt_bias_init(self.kpt_dim))(k)
            outs.append(
                jnp.concatenate(
                    [b.astype(jnp.float32), c.astype(jnp.float32), k.astype(jnp.float32)],
                    axis=-1,
                )
            )
        return outs


STRIDES = (8, 16, 32)

# Keypoint head calibration (corner-heatmap decode, see decode_predictions):
# predicted offsets are in units of KPT_OFFSET_SCALE *pixels* at every level,
# so localization precision is level-independent (a 0.1 head-unit error is
# 0.8 px whether the winning anchor is P3 or P5).
KPT_OFFSET_SCALE = 8.0
# two decoded corners closer than this are considered the same physical
# corner during joint decode (card corners are >=100 px apart at 640)
KPT_COLLISION_PX = 24.0
# a decoded quadrilateral below this area (input px^2) cannot be a card
# (the synthetic camera never renders one smaller than ~100 px on a side);
# used by the joint decode's plausibility gate, deliberately conservative
KPT_MIN_AREA_PX2 = 4.0 * KPT_COLLISION_PX**2

# Identity-order consistency bonus for the joint assignment. The corner
# channels are TRAINED with canonical image-position identities (TL, TR,
# BR, BL — preprocess_masks.py:196-223 order), so an assignment whose
# points are ALREADY in canonical order agrees with the head's own
# labeling; a rotated-identity assignment only exists because channels
# mis-bound their labels and needs post-hoc canonicalization. Calibration
# from the frozen r5 tail image (tests/fixtures/yolo_decode_fixture.npz):
# the rotated-identity pick with one garbage corner outscored the true
# in-order assignment by 0.096 conf (2.195 vs 2.099) — the bonus must
# exceed such marginal gaps, but stay far below the >=0.5 conf advantage
# genuinely-swapped predictions have (for those, canonicalize-after-pick
# remains the correct repair and the bonus must not fight it).
KPT_ORDER_BONUS = 0.25


def decode_predictions(
    level_outputs: List[jax.Array],
    num_classes: int = 1,
    num_keypoints: int = 4,
    kpt_dim: int = 3,
):
    """Anchor-free decode: DFL expectation -> ltrb -> xyxy boxes.

    Keypoints use a corner-heatmap decode rather than ultralytics' coarse
    center-anchored regression ((pred*2 + anchor - 0.5) * stride, which at
    stride 32 cannot express sub-5px precision — measured 7.03 px mean error
    in round 2): each anchor predicts, per keypoint, a confidence logit
    (trained toward a Gaussian of the anchor-to-corner distance in pixels)
    and a *local* offset in KPT_OFFSET_SCALE-pixel units. Anchors near a
    corner carry the evidence; :func:`top1_detection` picks the best anchor
    per keypoint. Returns flattened (B, A, ...) boxes/scores/kpts."""
    boxes, scores, kpts = [], [], []
    bins = jnp.arange(REG_MAX, dtype=jnp.float32)
    for out, stride in zip(level_outputs, STRIDES):
        # decode in fp32 regardless of the network's compute dtype: the
        # decode is a few thousand FLOPs, and running it in bf16 on the
        # serving path was measured (runs/yolo_full_r4/eval, round 4) to
        # flip a marginal greedy-NMS candidate on 1/384 eval images into a
        # 323 px corner error. fp32 decode makes candidate selection
        # identical across fp32/bf16 deployments of the same head outputs.
        out = out.astype(jnp.float32)
        b, h, w, _ = out.shape
        box = out[..., : 4 * REG_MAX].reshape(b, h, w, 4, REG_MAX)
        dist = jnp.sum(jax.nn.softmax(box, axis=-1) * bins, axis=-1)  # (b,h,w,4) ltrb
        cls = out[..., 4 * REG_MAX : 4 * REG_MAX + num_classes]
        kpt = out[..., 4 * REG_MAX + num_classes :].reshape(
            b, h, w, num_keypoints, kpt_dim
        )
        cx = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5)
        cy = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5)
        x1 = (cx - dist[..., 0]) * stride
        y1 = (cy - dist[..., 1]) * stride
        x2 = (cx + dist[..., 2]) * stride
        y2 = (cy + dist[..., 3]) * stride
        boxes.append(jnp.stack([x1, y1, x2, y2], axis=-1).reshape(b, h * w, 4))
        scores.append(jax.nn.sigmoid(cls).reshape(b, h * w, num_classes))
        kx = cx[..., None] * stride + kpt[..., 0] * KPT_OFFSET_SCALE
        ky = cy[..., None] * stride + kpt[..., 1] * KPT_OFFSET_SCALE
        kconf = jax.nn.sigmoid(kpt[..., 2]) if kpt_dim == 3 else jnp.ones_like(kx)
        kpts.append(
            jnp.stack([kx, ky, kconf], axis=-1).reshape(b, h * w, num_keypoints, 3)
        )
    return (
        jnp.concatenate(boxes, axis=1),
        jnp.concatenate(scores, axis=1),
        jnp.concatenate(kpts, axis=1),
    )


def top1_detection(boxes, scores, kpts):
    """max_det=1 decode (one card): the box comes from the best detection
    anchor across all levels; keypoints from a joint assignment over each
    corner channel's top-3 greedy-NMS peaks, scored by sum(conf) minus a
    collision penalty and GATED on quadrilateral plausibility
    (quad_plausible on the canonicalized points: distinct corners, convex
    winding, card-sized area) — the best *plausible* assignment wins.

    The gate is the round-5 fix for the bf16 serving tail: round 4's
    tracked eval (runs/yolo_full_r4) showed 1/384 images flipping a
    marginal NMS candidate under bf16 numerics into a 323 px corner error
    that a convexity check catches. With no plausible assignment the
    ordering degrades to the ungated score (detection-rate metrics still
    see genuine misses).

    (Box-gating the keypoint argmax was measured a no-op — the failure
    mode is corner-identity confusion *on* the card, handled by the joint
    decode + canonical reordering below, not far-field peaks.)"""
    conf = jnp.max(scores, axis=-1)  # (B, A)
    idx = jnp.argmax(conf, axis=-1)  # (B,)
    box = jnp.take_along_axis(boxes, idx[:, None, None], axis=1)[:, 0]  # (B,4)
    # Joint decode over the top-3 SPATIALLY DISTINCT candidates per corner
    # channel: a corner channel sometimes double-picks another corner's
    # peak (the card's four corners look alike), leaving one corner
    # unplaced — and the raw top-k anchors are often several anchors of
    # ONE peak, so candidates are selected by greedy NMS on the decoded xy
    # (radius KPT_COLLISION_PX). Enumerate all 3^K candidate assignments
    # and score sum(conf) minus a collision penalty for any two corners
    # closer than KPT_COLLISION_PX — the best non-colliding assignment
    # wins. K=4 -> 81 combos, fully batched.
    k_dim = kpts.shape[2]
    n_cand = 3
    flat = jnp.swapaxes(kpts, 1, 2)  # (B, K, A, 3)
    xy = flat[..., :2]  # (B, K, A, 2)
    masked = flat[..., 2].astype(jnp.float32)  # (B, K, A) running NMS mask
    picks = []
    for _ in range(n_cand):
        i = jnp.argmax(masked, axis=-1)  # (B, K)
        picks.append(i)
        sel = jnp.take_along_axis(xy, i[..., None, None], axis=2)  # (B,K,1,2)
        d2_a = jnp.sum((xy - sel) ** 2, axis=-1)  # (B, K, A)
        masked = jnp.where(d2_a < KPT_COLLISION_PX**2, -jnp.inf, masked)
    i3 = jnp.stack(picks, axis=-1)  # (B, K, n_cand)
    cand = jnp.take_along_axis(flat, i3[..., None], axis=2)  # (B,K,n,3)
    # assignment score = joint log-likelihood of the 4 corners, not the
    # conf SUM. The r5 frozen tail image shows why: the rotated-identity
    # assignment (three real corners bound to the wrong channels + one
    # 0.073-conf garbage corner) out-SUMS the true assignment 2.195 vs
    # 2.099, and both are plausible canonical quads — but a quad is a
    # JOINT hypothesis, and a near-zero corner should be near-fatal to
    # it: in log space the true assignment wins -2.83 vs -3.66.
    c3 = jnp.log(jnp.maximum(cand[..., 2].astype(jnp.float32), 1e-6))
    digits = []
    for c in range(n_cand**k_dim):
        q, row = c, []
        for _ in range(k_dim):
            row.append(q % n_cand)
            q //= n_cand
        digits.append(row)
    combos = jnp.asarray(digits)  # (n^K, K) rank choice per channel
    pick = cand[:, jnp.arange(k_dim)[None, :], combos, :]  # (B, n^K, K, 3)
    conf_sum = jnp.sum(c3[:, jnp.arange(k_dim)[None, :], combos], axis=-1)
    d2 = jnp.sum(
        (pick[..., None, :, :2] - pick[..., :, None, :2]) ** 2, axis=-1
    )  # (B, n^K, K, K)
    eye = jnp.eye(k_dim, dtype=bool)
    collide = (d2 < KPT_COLLISION_PX**2) & ~eye
    penalty = jnp.sum(collide, axis=(-1, -2)).astype(jnp.float32) * 10.0
    # Plausibility gate (VERDICT r4: the bf16 serving path flipped one
    # marginal NMS candidate into a 323 px miss that a convexity check
    # catches): every assignment is canonicalized and checked with
    # quad_plausible (distinct corners, convex winding, card-sized area);
    # implausible assignments are pushed below every plausible one, so the
    # best *plausible* combination wins. If no assignment is plausible
    # (e.g. the card is genuinely not there), relative order among the
    # implausible ones is preserved and the decode degrades to the old
    # behavior. K=4 -> 81 combos per image, fully batched.
    from mtg_card_image_segmentation_tpu.ops.heatmap import (
        canonicalize_corners,
        quad_plausible,
    )

    n_comb = combos.shape[0]
    flat_pick = pick.reshape(pick.shape[0] * n_comb, k_dim, 3)
    can = canonicalize_corners(flat_pick)
    plaus = quad_plausible(
        can[..., :2],
        min_dist=KPT_COLLISION_PX,
        min_area=KPT_MIN_AREA_PX2,
    ).reshape(pick.shape[0], n_comb)
    # KPT_ORDER_BONUS: prefer assignments already in canonical identity
    # order (see the constant's rationale — fixes the r5 frozen tail image
    # where a rotated-identity pick with a garbage 4th corner won the raw
    # conf-sum by 0.096 and passed the plausibility gate)
    in_order = jnp.all(
        jnp.sum((can[..., :2] - flat_pick[..., :2]) ** 2, axis=-1) < 1.0,
        axis=-1,
    ).reshape(pick.shape[0], n_comb)
    score_c = (
        conf_sum.astype(jnp.float32)
        - penalty
        + KPT_ORDER_BONUS * in_order.astype(jnp.float32)
    )
    best = jnp.argmax(jnp.where(plaus, score_c, score_c - 1e4), axis=1)  # (B,)
    kp = jnp.take_along_axis(
        pick, best[:, None, None, None], axis=1
    )[:, 0]  # (B, K, 3)
    # Corner identity is position-canonical (TL,TR,BR,BL *in the image* —
    # the reference derives labels from masks, preprocess_masks.py:196-223),
    # but a 180-degree-rotated card puts TL-looking texture at BR, so the
    # per-channel heatmaps occasionally swap identities (~2% of corners).
    # Re-sorting the four decoded points into canonical image order repairs
    # every pure swap and is the identity on already-ordered predictions.
    kp = canonicalize_corners(kp)
    return box, jnp.max(conf, axis=-1), kp


class YOLO12Pose(nn.Module):
    """Wrapper returning decoded (boxes, scores, kpts) in inference and raw
    level outputs in training mode."""

    num_classes: int = 1
    num_keypoints: int = 4
    kpt_dim: int = 3
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = YOLO12PoseBackboneHead(
            num_classes=self.num_classes, num_keypoints=self.num_keypoints,
            kpt_dim=self.kpt_dim, fold_bn=self.fold_bn, dtype=self.dtype,
            param_dtype=self.param_dtype, name="net",
        )(x, train)
        if train:
            return outs
        return decode_predictions(
            outs, self.num_classes, self.num_keypoints, self.kpt_dim
        )
