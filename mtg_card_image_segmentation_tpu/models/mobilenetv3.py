"""MobileNetV3-Large backbone with LR-ASPP feature taps, NHWC Flax.

Behavioral spec: torchvision ``mobilenet_v3_large(dilated=True)`` as consumed
by the reference's ``lraspp_mobilenet_v3_large`` (train/model.py:31-35).
Architecture table = the MobileNetV3 paper / torchvision ``_mobilenet_v3_conf``:
15 inverted-residual rows; the dilated tail turns the last downsample into
dilation-2 convs so the high-level features sit at output-stride 16.

Taps (train/model.py:74-75 hardcodes high=960, low=40):
- ``low``: output of the first 40-channel block (C2 downsample), stride 8.
- ``high``: output of the final 1x1 conv (960 ch), stride 16.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtg_card_image_segmentation_tpu.models.layers import ConvBNAct, InvertedResidual

# (kernel, expanded, out, use_se, act, stride, dilated_tail)
# fmt: off
MOBILENET_V3_LARGE_ROWS: List[Tuple[int, int, int, bool, str, int, bool]] = [
    (3,  16,  16, False, "relu",      1, False),
    (3,  64,  24, False, "relu",      2, False),   # C1 -> stride 4
    (3,  72,  24, False, "relu",      1, False),
    (5,  72,  40, True,  "relu",      2, False),   # C2 -> stride 8   [low tap]
    (5, 120,  40, True,  "relu",      1, False),
    (5, 120,  40, True,  "relu",      1, False),
    (3, 240,  80, False, "hardswish", 2, False),   # C3 -> stride 16
    (3, 200,  80, False, "hardswish", 1, False),
    (3, 184,  80, False, "hardswish", 1, False),
    (3, 184,  80, False, "hardswish", 1, False),
    (3, 480, 112, True,  "hardswish", 1, False),
    (3, 672, 112, True,  "hardswish", 1, False),
    (5, 672, 160, True,  "hardswish", 2, True),    # C4 -> dilated, stays stride 16
    (5, 960, 160, True,  "hardswish", 1, True),
    (5, 960, 160, True,  "hardswish", 1, True),
]
# fmt: on

LOW_TAP_ROW = 3  # first 40-channel block (torchvision stage_indices[-4])
LOW_CHANNELS = 40
HIGH_CHANNELS = 960


class MobileNetV3Backbone(nn.Module):
    """Returns {"low": (B, H/8, W/8, 40), "high": (B, H/16, W/16, 960)}."""

    dilated: bool = True
    bn_momentum: float = 0.99
    fold_bn: bool = False
    # per-block expansion widths for slimmed (physically channel-pruned)
    # models; None keeps the table value. SE squeeze dims stay sized from the
    # original table expansion so slim checkpoints slice, never reshape.
    expanded_overrides: Any = None  # Optional[Tuple[Optional[int], ...]]
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Dict[str, jax.Array]:
        from mtg_card_image_segmentation_tpu.models.layers import make_divisible

        taps: Dict[str, jax.Array] = {}
        x = ConvBNAct(
            16, 3, stride=2, act="hardswish", bn_momentum=self.bn_momentum,
            fold_bn=self.fold_bn,
            dtype=self.dtype, param_dtype=self.param_dtype, name="stem",
        )(x, train)
        for i, (k, exp, out, se, act, stride, in_tail) in enumerate(
            MOBILENET_V3_LARGE_ROWS
        ):
            dilation = 2 if (self.dilated and in_tail) else 1
            eff_exp = exp
            if self.expanded_overrides is not None:
                eff_exp = self.expanded_overrides[i] or exp
            x = InvertedResidual(
                expanded=eff_exp, out_features=out, kernel=k, stride=stride,
                dilation=dilation, use_se=se, act=act,
                se_features=make_divisible(exp // 4, 8) if se else None,
                bn_momentum=self.bn_momentum, fold_bn=self.fold_bn,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"block{i}",
            )(x, train)
            if i == LOW_TAP_ROW:
                taps["low"] = x
        x = ConvBNAct(
            HIGH_CHANNELS, 1, act="hardswish", bn_momentum=self.bn_momentum,
            fold_bn=self.fold_bn,
            dtype=self.dtype, param_dtype=self.param_dtype, name="head_conv",
        )(x, train)
        taps["high"] = x
        return taps


def expected_backbone_params(dilated: bool = True) -> int:
    """Independent closed-form parameter count for the backbone (used by
    tests as a second opinion against the actual pytree)."""
    from mtg_card_image_segmentation_tpu.models.layers import make_divisible

    total = 3 * 16 * 9 + 2 * 16  # stem conv + BN scale/bias
    in_ch = 16
    for k, exp, out, se, act, stride, _ in MOBILENET_V3_LARGE_ROWS:
        if exp != in_ch:
            total += in_ch * exp + 2 * exp  # expand 1x1 + BN
        total += exp * k * k + 2 * exp  # depthwise + BN
        if se:
            sq = make_divisible(exp // 4, 8)
            total += exp * sq + sq + sq * exp + exp  # fc1/fc2 with bias
        total += exp * out + 2 * out  # project 1x1 + BN
        in_ch = out
    total += in_ch * HIGH_CHANNELS + 2 * HIGH_CHANNELS  # final 1x1 + BN
    return total
