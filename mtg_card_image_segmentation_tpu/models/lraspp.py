"""LR-ASPP segmentation head + full card-segmentation model, NHWC Flax.

Behavioral spec: the reference's custom ``LRASPPHead`` (train/model.py:92-142)
— note it differs from torchvision's in using a **3x3** cbr conv
(train/model.py:110), which puts the full model at ~4.2M params (the
reference README's "3.2M" is the stock torchvision figure).

Head dataflow (train/model.py:124-142):
    x = cbr(high)                       # 3x3 conv + BN + ReLU, 128ch @ s16
    s = sigmoid(1x1(globalpool(high)))  # SE-style image-level gate
    x = x * s
    x = bilinear_up(x, low.shape)       # s16 -> s8, align_corners=False
    out = low_cls(low) + high_cls(x)    # 1x1 classifiers, summed @ s8
    out = bilinear_up(out, input.shape) # s8 -> full res (torchvision LRASPP
                                        # forward wrapper)

The gate multiply + upsample + classifier-add decoder has a fused Pallas
variant (ops/pallas/decoder.py); this module is the XLA-composed reference
implementation which already fuses well (everything between the two convs is
elementwise).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtg_card_image_segmentation_tpu.models.layers import ConvBNAct
from mtg_card_image_segmentation_tpu.models.mobilenetv3 import MobileNetV3Backbone
from mtg_card_image_segmentation_tpu.ops.resize import bilinear_resize


class LRASPPHead(nn.Module):
    num_classes: int = 2
    inter_channels: int = 128
    bn_momentum: float = 0.99
    fold_bn: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, low: jax.Array, high: jax.Array, train: bool = False
    ) -> jax.Array:
        x = ConvBNAct(
            self.inter_channels, 3, act="relu", bn_momentum=self.bn_momentum,
            fold_bn=self.fold_bn,
            dtype=self.dtype, param_dtype=self.param_dtype, name="cbr",
        )(high, train)
        # image-level gate: pool in fp32, 1x1 (no bias, train/model.py:117), sigmoid
        s = jnp.mean(high.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(
            self.inter_channels, (1, 1), use_bias=False,
            dtype=self.dtype, param_dtype=self.param_dtype, name="scale",
        )(s.astype(self.dtype))
        s = nn.sigmoid(s.astype(jnp.float32))
        x = x.astype(jnp.float32) * s

        x = bilinear_resize(x, low.shape[1], low.shape[2])

        low_logits = nn.Conv(
            self.num_classes, (1, 1), use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="low_classifier",
        )(low.astype(self.dtype))
        high_logits = nn.Conv(
            self.num_classes, (1, 1), use_bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype, name="high_classifier",
        )(x.astype(self.dtype))
        return low_logits.astype(jnp.float32) + high_logits.astype(jnp.float32)


class CardSegmentationModel(nn.Module):
    """Full model: backbone -> LR-ASPP head -> upsample to input resolution.

    Input: (B, H, W, 3) float (already normalized). Output: (B, H, W,
    num_classes) fp32 logits — class 0 background, class 1 card.
    """

    num_classes: int = 2
    inter_channels: int = 128
    bn_momentum: float = 0.99
    fold_bn: bool = False
    expanded_overrides: Any = None  # see MobileNetV3Backbone
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_h, in_w = x.shape[1], x.shape[2]
        taps = MobileNetV3Backbone(
            dilated=True, bn_momentum=self.bn_momentum, fold_bn=self.fold_bn,
            expanded_overrides=self.expanded_overrides,
            dtype=self.dtype, param_dtype=self.param_dtype,
            name="backbone",
        )(x, train)
        logits = LRASPPHead(
            num_classes=self.num_classes, inter_channels=self.inter_channels,
            bn_momentum=self.bn_momentum, fold_bn=self.fold_bn,
            dtype=self.dtype, param_dtype=self.param_dtype, name="head",
        )(taps["low"], taps["high"], train)
        return bilinear_resize(logits, in_h, in_w)
