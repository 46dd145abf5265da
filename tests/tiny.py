"""Tiny registered models for fast default tests.

The full 4.2M-param LR-ASPP / HRNet / YOLO compiles take 1-5 min each on the
virtual CPU mesh; these 2-conv stand-ins exercise the same train-step,
trainer, checkpoint, recalibration and sharding machinery in seconds. The
full-model versions of each test stay in the suite behind ``-m slow``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtg_card_image_segmentation_tpu.models import registry
from mtg_card_image_segmentation_tpu.models.layers import ConvBNAct
from mtg_card_image_segmentation_tpu.ops.resize import bilinear_resize


class TinySeg(nn.Module):
    num_classes: int = 2
    width: int = 8
    bn_momentum: float = 0.99
    fold_bn: bool = False
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h, w = x.shape[1], x.shape[2]
        kw = dict(bn_momentum=self.bn_momentum, fold_bn=self.fold_bn,
                  dtype=self.dtype, param_dtype=self.param_dtype)
        x = ConvBNAct(self.width, 3, stride=2, act="relu", name="c1", **kw)(x, train)
        x = ConvBNAct(self.width, 3, act="hardswish", name="c2", **kw)(x, train)
        x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="cls")(x)
        return bilinear_resize(x.astype(jnp.float32), h, w)


class TinyPose(nn.Module):
    num_keypoints: int = 4
    heatmap_height: int = 16
    heatmap_width: int = 16
    width: int = 8
    bn_momentum: float = 0.99
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        kw = dict(bn_momentum=self.bn_momentum, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        x = ConvBNAct(self.width, 3, stride=2, act="relu", name="c1", **kw)(x, train)
        x = ConvBNAct(self.width, 3, stride=2, act="relu", name="c2", **kw)(x, train)
        x = nn.Conv(self.num_keypoints, (1, 1), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="head")(x)
        return bilinear_resize(
            x.astype(jnp.float32), self.heatmap_height, self.heatmap_width
        )


def _dt(name):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


if "tiny_seg" not in registry.available_models():

    @registry.register("tiny_seg")
    def _tiny_seg(num_classes: int = 2, inter_channels: int = 8,
                  compute_dtype: str = "float32", param_dtype: str = "float32",
                  bn_momentum: float = 0.99, fold_bn: bool = False):
        return TinySeg(num_classes=num_classes, width=inter_channels,
                       bn_momentum=bn_momentum, fold_bn=fold_bn,
                       dtype=_dt(compute_dtype), param_dtype=_dt(param_dtype))

    @registry.register("tiny_pose")
    def _tiny_pose(num_keypoints: int = 4, heatmap_height: int = 16,
                   heatmap_width: int = 16, compute_dtype: str = "float32",
                   param_dtype: str = "float32", bn_momentum: float = 0.99):
        return TinyPose(num_keypoints=num_keypoints,
                        heatmap_height=heatmap_height,
                        heatmap_width=heatmap_width, bn_momentum=bn_momentum,
                        dtype=_dt(compute_dtype), param_dtype=_dt(param_dtype))
