"""Batched TPU segmentation predictor — the serving fast path.

Inference-specialized pipeline (vs the training model):
- BatchNorm folded into convs (export/fold_bn.py), params cast to bf16;
- input normalization fused into one Pallas pass (ops/pallas/preprocess.py);
- the head's final decode fused into one Pallas kernel that upsamples the
  class-score map with MXU interp-matmuls and writes the uint8 mask directly
  (ops/pallas/decoder.py) — no (B, H, W, 2) fp32 logits ever hit HBM.

This is the component behind the >=5k img/s/chip north star (BASELINE.md)
and the TPU-side replacement for the browser's per-frame
preprocess/inference/postprocess loop (demo/src/model-inference.js:352-401).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mtg_card_image_segmentation_tpu.export import fold_batch_norm
from mtg_card_image_segmentation_tpu.models import create_model
from mtg_card_image_segmentation_tpu.models.lraspp import LRASPPHead
from mtg_card_image_segmentation_tpu.models.mobilenetv3 import MobileNetV3Backbone
from mtg_card_image_segmentation_tpu.ops.pallas import (
    fused_mask_decode,
    fused_normalize,
)
from mtg_card_image_segmentation_tpu.ops.resize import bilinear_resize

import flax.linen as nn


class _HeadlessSeg(nn.Module):
    """Backbone + head WITHOUT the final full-resolution upsample — the
    serving path decodes scores with the fused Pallas kernel instead."""

    num_classes: int = 2
    inter_channels: int = 128
    fold_bn: bool = True
    dtype: any = jnp.bfloat16
    param_dtype: any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        taps = MobileNetV3Backbone(
            dilated=True, fold_bn=self.fold_bn, dtype=self.dtype,
            param_dtype=self.param_dtype, name="backbone",
        )(x, train)
        return LRASPPHead(
            num_classes=self.num_classes, inter_channels=self.inter_channels,
            fold_bn=self.fold_bn, dtype=self.dtype,
            param_dtype=self.param_dtype, name="head",
        )(taps["low"], taps["high"], train)


class SegPredictor:
    """predict(uint8 images) -> uint8 masks, all fused on device."""

    def __init__(
        self,
        params,
        batch_stats,
        height: int,
        width: int,
        use_pallas: bool = True,
        dtype=jnp.bfloat16,
    ) -> None:
        folded = fold_batch_norm(params, batch_stats)
        self._params = jax.tree.map(lambda a: a.astype(dtype), folded)
        model = _HeadlessSeg(dtype=dtype, param_dtype=dtype)
        self.height, self.width = height, width

        if use_pallas:

            @jax.jit
            def predict(p, images_u8):
                x = fused_normalize(images_u8, out_dtype=dtype)
                logits = model.apply({"params": p}, x, train=False)
                scores = logits[..., 1] - logits[..., 0]
                return fused_mask_decode(scores, height, width)

        else:

            @jax.jit
            def predict(p, images_u8):
                x = (images_u8.astype(jnp.float32) / 255.0).astype(dtype)
                mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
                std = jnp.asarray([0.229, 0.224, 0.225], dtype)
                x = (x - mean) / std
                logits = model.apply({"params": p}, x, train=False)
                full = bilinear_resize(logits.astype(jnp.float32), height, width)
                return jnp.argmax(full, axis=-1).astype(jnp.uint8)

        self._predict = predict

    @classmethod
    def from_checkpoint(
        cls, checkpoint_dir: str, name: str, height: int, width: int, **kw
    ) -> "SegPredictor":
        import os

        from mtg_card_image_segmentation_tpu.config import OptimizerConfig
        from mtg_card_image_segmentation_tpu.training import (
            checkpoint as ckpt_lib,
            create_optimizer,
            create_seg_state,
        )

        model = create_model("lraspp_mobilenet_v3_large")
        tx, _ = create_optimizer(OptimizerConfig(), 1, 1)
        state = create_seg_state(model, tx, (1, height, width, 3), jax.random.key(0))
        state, _ = ckpt_lib.load_checkpoint(
            checkpoint_dir, name, state, params_only=True
        )
        return cls(state.params, state.batch_stats, height, width, **kw)

    def predict(self, images_u8) -> jax.Array:
        """(B, H, W, 3) uint8 (already at model resolution) -> (B, H, W)
        uint8 {0,1} masks."""
        return self._predict(self._params, jnp.asarray(images_u8))
