#!/usr/bin/env python
"""Prefix-timing of the serving graph at the bench operating point.

The axon relay has a ~10ms per-dispatch floor, so timing components
standalone is meaningless. Instead each measurement jits a PREFIX of the
serving graph (normalize -> ... -> cut point); successive differences then
attribute device time per stage with the dispatch constant cancelled.

    python tools/profile_blocks.py --size 512 --batch 128 --iters 30
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp


def fence(x):
    return np.asarray(jax.jit(lambda a: jnp.sum(a.astype(jnp.float32)))(x))


def time_fn(fn, args, iters, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument(
        "--cuts", type=str,
        default="norm,stem,b1,b3,b5,b6,b11,b14,head_conv,head,decode",
    )
    args = ap.parse_args()

    from mtg_card_image_segmentation_tpu.models.lraspp import LRASPPHead
    from mtg_card_image_segmentation_tpu.models.layers import ConvBNAct
    from mtg_card_image_segmentation_tpu.models.mobilenetv3 import (
        MOBILENET_V3_LARGE_ROWS,
        MobileNetV3Backbone,
    )
    from mtg_card_image_segmentation_tpu.ops.pallas import (
        fused_mask_decode,
        fused_normalize,
    )
    import flax.linen as nn

    B, S = args.batch, args.size
    bf16 = jnp.bfloat16

    class Headless(nn.Module):
        @nn.compact
        def __call__(self, x):
            taps = MobileNetV3Backbone(
                dilated=True, fold_bn=True, dtype=bf16, param_dtype=bf16,
                name="backbone",
            )(x, False)
            return LRASPPHead(
                fold_bn=True, dtype=bf16, param_dtype=bf16, name="head"
            )(taps["low"], taps["high"], False)

    model = Headless()
    ex = jnp.zeros((1, S, S, 3), bf16)
    params = jax.jit(model.init)(jax.random.key(0), ex)["params"]

    rows = MOBILENET_V3_LARGE_ROWS

    def prefix_fn(cut: str):
        """Build fn(params, u8) running the serving graph up to `cut`."""

        def run(p, u8):
            from mtg_card_image_segmentation_tpu.models.layers import (
                ConvBNAct,
                InvertedResidual,
            )

            x = fused_normalize(u8, out_dtype=bf16)
            if cut == "norm":
                return x
            bb = p["backbone"]
            stem = ConvBNAct(16, 3, stride=2, act="hardswish", fold_bn=True,
                             dtype=bf16, param_dtype=bf16)
            x = stem.apply({"params": bb["stem"]}, x)
            if cut == "stem":
                return x
            low = None
            for i, (k, exp, out, se, act, stride, in_tail) in enumerate(rows):
                blk = InvertedResidual(
                    expanded=exp, out_features=out, kernel=k, stride=stride,
                    dilation=2 if in_tail else 1, use_se=se, act=act,
                    fold_bn=True, dtype=bf16, param_dtype=bf16,
                )
                x = blk.apply({"params": bb[f"block{i}"]}, x)
                if i == 3:
                    low = x
                if cut == f"b{i}":
                    return x
            hc = ConvBNAct(960, 1, act="hardswish", fold_bn=True,
                           dtype=bf16, param_dtype=bf16)
            x = hc.apply({"params": bb["head_conv"]}, x)
            if cut == "head_conv":
                return x
            head = LRASPPHead(fold_bn=True, dtype=bf16, param_dtype=bf16)
            logits = head.apply({"params": p["head"]}, low, x)
            if cut == "head":
                return logits
            scores = logits[..., 1] - logits[..., 0]
            return fused_mask_decode(scores, S, S)

        return jax.jit(run)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (B, S, S, 3)), jnp.uint8)

    prev = 0.0
    for cut in args.cuts.split(","):
        dt = time_fn(prefix_fn(cut), (params, imgs), args.iters)
        print(f"{cut:12s} cum {dt * 1e3:8.3f} ms   delta {(dt - prev) * 1e3:+8.3f} ms")
        prev = dt
    print(f"TOTAL {prev * 1e3:.3f} ms -> {B / prev:.0f} img/s")


if __name__ == "__main__":
    main()
