"""HRNet-W18-Small backbone + heatmap pose head, NHWC Flax.

Behavioral spec: the custom pose pipeline's timm ``hrnet_w18_small``
features_only backbone + HRNetPoseHead
(train-pose-estimation_custom/model.py:10-130): deepest feature map in,
2x [ConvTranspose(256, k4 s2) + BN + ReLU], 2x [3x3 conv(256) + BN + ReLU],
1x1 -> K heatmaps, exact-size output (reference abuses AdaptiveAvgPool2d to
up-size; we use half-pixel bilinear resize — cleaner and XLA-native).

The backbone is a faithful multi-resolution HRNet (parallel branches +
full cross-resolution fusion), W18-small-v1 widths: stem 64 @ s4; stage1
1 bottleneck (32x4); stages 2-4 grow branches [16, 32, 64, 128] at strides
[4, 8, 16, 32] with 2 basic blocks per branch per stage and bidirectional
fusion (strided 3x3 down, 1x1 + nearest-upsample up).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mtg_card_image_segmentation_tpu.models.layers import ConvBNAct
from mtg_card_image_segmentation_tpu.ops.resize import bilinear_resize, nearest_resize

W18_SMALL_CHANNELS: Tuple[Tuple[int, ...], ...] = ((16, 32), (16, 32, 64), (16, 32, 64, 128))
W18_SMALL_BLOCKS = 2
STAGE1_PLANES = 32
BOTTLENECK_EXPANSION = 4


class BasicBlock(nn.Module):
    features: int
    bn_momentum: float = 0.99
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = ConvBNAct(self.features, 3, act="relu", bn_momentum=self.bn_momentum,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(x, train)
        y = ConvBNAct(self.features, 3, act=None, bn_momentum=self.bn_momentum,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(y, train)
        if x.shape[-1] != self.features:
            x = ConvBNAct(self.features, 1, act=None, bn_momentum=self.bn_momentum,
                          dtype=self.dtype, param_dtype=self.param_dtype, name="proj")(x, train)
        return nn.relu(y.astype(jnp.float32) + x.astype(jnp.float32)).astype(self.dtype)


class Bottleneck(nn.Module):
    planes: int
    bn_momentum: float = 0.99
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out_ch = self.planes * BOTTLENECK_EXPANSION
        y = ConvBNAct(self.planes, 1, act="relu", bn_momentum=self.bn_momentum,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="conv1")(x, train)
        y = ConvBNAct(self.planes, 3, act="relu", bn_momentum=self.bn_momentum,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="conv2")(y, train)
        y = ConvBNAct(out_ch, 1, act=None, bn_momentum=self.bn_momentum,
                      dtype=self.dtype, param_dtype=self.param_dtype, name="conv3")(y, train)
        if x.shape[-1] != out_ch:
            x = ConvBNAct(out_ch, 1, act=None, bn_momentum=self.bn_momentum,
                          dtype=self.dtype, param_dtype=self.param_dtype, name="proj")(x, train)
        return nn.relu(y.astype(jnp.float32) + x.astype(jnp.float32)).astype(self.dtype)


class FuseLayer(nn.Module):
    """Full cross-resolution fusion: every output branch sums contributions
    from every input branch (down: strided 3x3 convs; up: 1x1 + nearest)."""

    out_channels: Sequence[int]
    bn_momentum: float = 0.99
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs: List[jax.Array], train: bool = False) -> List[jax.Array]:
        outs: List[jax.Array] = []
        for i, out_ch in enumerate(self.out_channels):
            acc = None
            for j, x in enumerate(xs):
                if j == i:
                    y = x
                elif j < i:  # downsample i-j times
                    y = x
                    for s in range(i - j):
                        last = s == i - j - 1
                        y = ConvBNAct(
                            out_ch if last else x.shape[-1], 3, stride=2,
                            act=None if last else "relu",
                            bn_momentum=self.bn_momentum, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=f"down{i}_{j}_{s}",
                        )(y, train)
                else:  # upsample j-i times
                    y = ConvBNAct(
                        out_ch, 1, act=None, bn_momentum=self.bn_momentum,
                        dtype=self.dtype, param_dtype=self.param_dtype,
                        name=f"up{i}_{j}",
                    )(x, train)
                    th, tw = xs[i].shape[1], xs[i].shape[2]
                    y = nearest_resize(y, th, tw)
                acc = y.astype(jnp.float32) if acc is None else acc + y.astype(jnp.float32)
            outs.append(nn.relu(acc).astype(self.dtype))
        return outs


class HRNetBackbone(nn.Module):
    """W18-small backbone -> list of 4 feature maps at strides [4, 8, 16, 32]
    with channels [16, 32, 64, 128]."""

    bn_momentum: float = 0.99
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        kw = dict(bn_momentum=self.bn_momentum, dtype=self.dtype,
                  param_dtype=self.param_dtype)
        # stem: 2x stride-2 conv -> 64 @ s4
        x = ConvBNAct(64, 3, stride=2, act="relu", name="stem1", **kw)(x, train)
        x = ConvBNAct(64, 3, stride=2, act="relu", name="stem2", **kw)(x, train)
        # stage 1: one bottleneck (out 128)
        x = Bottleneck(STAGE1_PLANES, name="stage1_block0", **kw)(x, train)

        # grow branches stage by stage
        branches: List[jax.Array] = [x]
        for stage_idx, channels in enumerate(W18_SMALL_CHANNELS):
            new_branches: List[jax.Array] = []
            for b, ch in enumerate(channels):
                if b < len(branches):
                    src = branches[b]
                    if src.shape[-1] != ch:
                        src = ConvBNAct(
                            ch, 3, act="relu", name=f"t{stage_idx}_b{b}", **kw
                        )(src, train)
                else:
                    src = ConvBNAct(
                        ch, 3, stride=2, act="relu",
                        name=f"t{stage_idx}_b{b}", **kw
                    )(branches[-1], train)
                for blk in range(W18_SMALL_BLOCKS):
                    src = BasicBlock(
                        ch, name=f"s{stage_idx}_b{b}_blk{blk}", **kw
                    )(src, train)
                new_branches.append(src)
            branches = FuseLayer(
                channels, name=f"fuse{stage_idx}", **kw
            )(new_branches, train)
        return branches


class HRNetPoseHead(nn.Module):
    """Deconv heatmap head (model.py:10-78): 2x up-convs to 256, 2x 3x3
    refinement convs, 1x1 -> K, bilinear to exact heatmap size."""

    num_keypoints: int = 4
    heatmap_height: int = 120
    heatmap_width: int = 160
    width: int = 256
    bn_momentum: float = 0.99
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(2):
            x = nn.ConvTranspose(
                self.width, (4, 4), strides=(2, 2), padding="SAME",
                use_bias=False, dtype=self.dtype, param_dtype=self.param_dtype,
                name=f"deconv{i}",
            )(x.astype(self.dtype))
            x = nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum,
                epsilon=1e-3, dtype=jnp.float32, param_dtype=self.param_dtype,
                name=f"deconv_bn{i}",
            )(x.astype(jnp.float32))
            x = nn.relu(x).astype(self.dtype)
        for i in range(2):
            x = ConvBNAct(
                self.width, 3, act="relu", bn_momentum=self.bn_momentum,
                dtype=self.dtype, param_dtype=self.param_dtype, name=f"conv{i}",
            )(x, train)
        x = nn.Conv(
            self.num_keypoints, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, name="final",
        )(x)
        return bilinear_resize(
            x.astype(jnp.float32), self.heatmap_height, self.heatmap_width
        )


class HRNetPose(nn.Module):
    """Full corner-heatmap model: (B, H, W, 3) [0,1] images -> (B, hm_h,
    hm_w, K) heatmaps. Note the custom-pose path normalizes by /255 only —
    no ImageNet normalization (inference_test.py:167-169)."""

    num_keypoints: int = 4
    heatmap_height: int = 120
    heatmap_width: int = 160
    feature_index: int = 3  # deepest branch, mirroring out_indices=[3]
    bn_momentum: float = 0.99
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        feats = HRNetBackbone(
            bn_momentum=self.bn_momentum, dtype=self.dtype,
            param_dtype=self.param_dtype, name="backbone",
        )(x, train)
        return HRNetPoseHead(
            num_keypoints=self.num_keypoints,
            heatmap_height=self.heatmap_height,
            heatmap_width=self.heatmap_width,
            bn_momentum=self.bn_momentum, dtype=self.dtype,
            param_dtype=self.param_dtype, name="head",
        )(feats[self.feature_index], train)
