"""Shared NHWC building blocks for all model families.

Design notes (TPU-first):
- NHWC layout: channels-last is XLA's native conv layout on TPU; the MXU
  tiles (8,128)/(16,128) want C in the minor dimension.
- bf16 compute / fp32 params: convs run in bf16 (MXU native), BatchNorm
  statistics and normalization run in fp32 for stability, activations are
  cast back to the compute dtype. Replaces the reference's fp16 AMP +
  GradScaler (train/train.py:96-104) — bf16 needs no loss scaling.
- torch-style *explicit symmetric* padding ((k-1)//2 * dilation) rather than
  XLA 'SAME': for stride-2 convs the two conventions pick different spatial
  alignments; explicit padding keeps us bit-compatible with the reference's
  conv semantics (enables torchvision weight import + golden tests vs torch).
- BatchNorm follows torchvision MobileNetV3: eps=1e-3, torch momentum 0.01
  (flax momentum 0.99). Statistics are computed over the *global* batch under
  a sharded jit, so multi-chip training gets sync-BN for free.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Channel rounding rule used throughout the MobileNet family."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hard_sigmoid(x: jax.Array) -> jax.Array:
    """relu6(x+3)/6 — torch nn.Hardsigmoid."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hard_swish(x: jax.Array) -> jax.Array:
    """x * relu6(x+3)/6 — torch nn.Hardswish."""
    return x * hard_sigmoid(x)


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": nn.relu,
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "hardswish": hard_swish,
    "silu": nn.silu,
    "sigmoid": nn.sigmoid,
}


def torch_padding(kernel: int, dilation: int = 1) -> Tuple[int, int]:
    pad = (kernel - 1) // 2 * dilation
    return (pad, pad)


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> activation, the universal `cbr` unit
    (reference train/model.py:109-113 and every torchvision ConvNormActivation).

    Conv runs in ``dtype`` (bf16), BN normalizes in fp32, output is cast back
    to ``dtype``.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    act: Optional[str] = "relu"
    use_bn: bool = True
    bias: bool = False
    bn_momentum: float = 0.99
    # inference mode with BN folded into the conv (use export.fold_bn to
    # transform trained params into this layout)
    fold_bn: bool = False
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[torch_padding(self.kernel, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=self.bias or (self.fold_bn and self.use_bn),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x.astype(self.dtype))
        if self.use_bn and not self.fold_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=1e-3,
                dtype=jnp.float32,
                param_dtype=self.param_dtype,
                name="bn",
            )(x.astype(jnp.float32))
        if self.act is not None:
            x = ACTIVATIONS[self.act](x)
        return x.astype(self.dtype)


class SqueezeExcite(nn.Module):
    """SE block: global-pool -> 1x1 reduce (ReLU) -> 1x1 expand (hardsigmoid)
    -> channel gate. torchvision SqueezeExcitation semantics (biased convs)."""

    squeeze_features: int
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        channels = x.shape[-1]
        # pool in fp32 — large spatial reductions lose precision in bf16
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(
            self.squeeze_features,
            (1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc1",
        )(s.astype(self.dtype))
        s = nn.relu(s)
        s = nn.Conv(
            channels,
            (1, 1),
            use_bias=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fc2",
        )(s)
        return x * hard_sigmoid(s.astype(jnp.float32)).astype(x.dtype)


class InvertedResidual(nn.Module):
    """MobileNetV3 bottleneck: [1x1 expand] -> kxk depthwise -> [SE] -> 1x1
    project, residual when stride==1 and in==out."""

    expanded: int
    out_features: int
    kernel: int
    stride: int
    dilation: int = 1
    use_se: bool = False
    act: str = "relu"
    bn_momentum: float = 0.99
    fold_bn: bool = False
    # explicit SE bottleneck width — set by slimmed (channel-pruned) models,
    # whose reduced ``expanded`` must not shrink the SE squeeze dim (it was
    # sized from the original expansion)
    se_features: Optional[int] = None
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in_features = x.shape[-1]
        # dilation replaces striding in the dilated (LR-ASPP) tail
        stride = 1 if self.dilation > 1 else self.stride
        y = x
        if self.expanded != in_features:
            y = ConvBNAct(
                self.expanded, 1, act=self.act, bn_momentum=self.bn_momentum,
                fold_bn=self.fold_bn,
                dtype=self.dtype, param_dtype=self.param_dtype, name="expand",
            )(y, train)
        y = ConvBNAct(
            self.expanded, self.kernel, stride=stride, dilation=self.dilation,
            groups=self.expanded, act=self.act, bn_momentum=self.bn_momentum,
            fold_bn=self.fold_bn,
            dtype=self.dtype, param_dtype=self.param_dtype, name="depthwise",
        )(y, train)
        if self.use_se:
            y = SqueezeExcite(
                self.se_features or make_divisible(self.expanded // 4, 8),
                dtype=self.dtype, param_dtype=self.param_dtype, name="se",
            )(y)
        y = ConvBNAct(
            self.out_features, 1, act=None, bn_momentum=self.bn_momentum,
            fold_bn=self.fold_bn,
            dtype=self.dtype, param_dtype=self.param_dtype, name="project",
        )(y, train)
        if stride == 1 and in_features == self.out_features:
            y = (y.astype(jnp.float32) + x.astype(jnp.float32)).astype(self.dtype)
        return y
