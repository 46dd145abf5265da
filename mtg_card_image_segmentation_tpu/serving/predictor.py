"""Batched TPU segmentation predictor — the serving fast path.

Inference-specialized pipeline (vs the training model):
- BatchNorm folded into convs (export/fold_bn.py), params cast to bf16;
- input normalization fused into one Pallas pass (ops/pallas/preprocess.py);
- the LR-ASPP head is algebraically collapsed: the two 1x1 classifiers and
  the final bilinear upsamples are all LINEAR, so the card-vs-background
  decision reduces to a single-channel score map computed at the native
  feature strides. The per-(batch,channel) SE-style gate folds into the
  high-path classifier weights (one einsum), the stride-16 score is
  upsampled to stride 8 with tiny interpolation matmuls, and the final
  512x512 decode happens in one Pallas kernel that writes the uint8 mask
  directly (ops/pallas/decoder.py). No (B, H, W, 2) fp32 logits — and no
  (B, H/8, W/8, 128) upsampled feature tensor — ever hit HBM.

This is the component behind the >=5k img/s/chip north star (BASELINE.md)
and the TPU-side replacement for the browser's per-frame
preprocess/inference/postprocess loop (demo/src/model-inference.js:352-401).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mtg_card_image_segmentation_tpu.export import fold_batch_norm
from mtg_card_image_segmentation_tpu.models import create_model
from mtg_card_image_segmentation_tpu.models.layers import ConvBNAct, InvertedResidual
from mtg_card_image_segmentation_tpu.models.lraspp import LRASPPHead
from mtg_card_image_segmentation_tpu.models.mobilenetv3 import (
    MOBILENET_V3_LARGE_ROWS,
    MobileNetV3Backbone,
)
from mtg_card_image_segmentation_tpu.ops.pallas import (
    fused_head_decode,
    fused_mask_decode,
    fused_stem,
)
from mtg_card_image_segmentation_tpu.ops.pallas.fused_block import (
    fused_inverted_residual,
    fused_tail_chain,
)
from mtg_card_image_segmentation_tpu.ops.pallas.decoder import _interp_matrix
from mtg_card_image_segmentation_tpu.ops.resize import bilinear_resize

import flax.linen as nn


class _HeadlessSeg(nn.Module):
    """Backbone + full head WITHOUT the final full-resolution upsample — the
    reference-shaped fallback path (use_pallas=False)."""

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


# Backbone blocks executed as single fused Pallas kernels in the serving
# path (whole-image VMEM residency per grid step, ops/pallas/fused_block.py).
# Measured at 512x512 b128 on v5e: fusing the three dilated-tail blocks
# (32x32 maps, ~250 MB expanded tensors each in the XLA path) saves ~2.7 ms;
# fusing the larger-spatial blocks LOSES time (the in-kernel VPU stencil
# costs more than the saved HBM traffic), so they stay on XLA convs.
FUSED_BLOCKS = (12, 13, 14)

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _fold_normalize_into_stem(params):
    """Fold uint8->ImageNet normalization into the stem conv.

    With u = u8 - 255*mean (per channel):

      (u8/255 - mean)/std == u * a,  a_c = 1/(255*std_c)

    EXACTLY — no bias shift. That matters because the stem conv zero-pads:
    a zero-padded u represents x_norm = 0, identical to the reference path
    (a bias-shift formulation is wrong at every border output). Centering
    also keeps conv magnitudes equal to the normalized path, so bf16
    rounding stays at the same relative level. The serving graph then
    consumes the centered image with zero preprocessing passes.
    """
    stem = params["backbone"]["stem"]["conv"]
    k = np.asarray(stem["kernel"], np.float32)  # (3, 3, 3, 16)
    a = 1.0 / (255.0 * _IMAGENET_STD)
    k_new = k * a[None, None, :, None]
    b_new = np.asarray(stem["bias"], np.float32)
    new = dict(params)
    new["backbone"] = dict(params["backbone"])
    new["backbone"]["stem"] = {"conv": {"kernel": k_new, "bias": b_new}}
    return new


def _fused_backbone(bb_params, x, dtype, fused_ids=FUSED_BLOCKS,
                    stem_done=False):
    """Backbone forward with per-block fused Pallas kernels where enabled.

    Equivalent to MobileNetV3Backbone(fold_bn=True).apply (golden-tested);
    returns the same {"low", "high"} taps. With ``stem_done`` the input is
    already the stem output (the fused_stem Pallas path).
    """
    if not stem_done:
        stem = ConvBNAct(
            16, 3, stride=2, act="hardswish", fold_bn=True,
            dtype=dtype, param_dtype=dtype,
        )
        x = stem.apply({"params": bb_params["stem"]}, x)
    taps = {}
    cin = 16
    from mtg_card_image_segmentation_tpu.models.layers import make_divisible

    # Default: run the three dilated-tail blocks as ONE pallas kernel
    # (fused_tail_chain) instead of three — removes two kernel launches +
    # two inter-block DMA window pairs per grid step. Measured 22.30 ms vs
    # 22.36 e2e @512^2 b128 (equal-or-better within the chip's ~2% session
    # variance) with strictly less VMEM window pressure.
    # MTG_FUSED_CHAIN=0 opts back into per-block kernels.
    import os as _os

    chain_enabled = (
        tuple(fused_ids) == (12, 13, 14)
        and _os.environ.get("MTG_FUSED_CHAIN", "1") == "1"
    )
    chain_consumed = False

    for i, (k, exp, out, se, act, stride, in_tail) in enumerate(
        MOBILENET_V3_LARGE_ROWS
    ):
        dilation = 2 if in_tail else 1
        eff_stride = 1 if dilation > 1 else stride
        p_blk = bb_params[f"block{i}"]
        if chain_consumed and i in (13, 14):
            cin = out
            continue
        if i == 12 and chain_enabled:
            # widths come from the params, not the arch table — slim
            # (physically channel-pruned) checkpoints ride the same chain
            try:
                x = fused_tail_chain(
                    x,
                    tuple(bb_params[f"block{j}"] for j in (12, 13, 14)),
                    kernel_size=5, act="hardswish", dilation=2,
                )
                chain_consumed = True
                cin = out
                continue
            except ValueError:
                pass  # no tiling: fall through to per-block kernels
        exp_eff = int(p_blk["depthwise"]["conv"]["kernel"].shape[-1])
        fused_ok = False
        # the kernel reads its widths from the params, so slim (narrower-
        # expansion) checkpoints take the same fused path as dense ones
        if i in fused_ids:
            try:
                x_f = fused_inverted_residual(
                    x, p_blk, kernel_size=k, stride=eff_stride, act=act,
                    residual=(eff_stride == 1 and cin == out), dilation=dilation,
                )
                fused_ok = True
            except ValueError:
                # no valid (batch, h*w) tiling at this operating point —
                # this block stays on the XLA path
                fused_ok = False
        if fused_ok:
            x = x_f
        else:
            blk = InvertedResidual(
                expanded=exp_eff, out_features=out, kernel=k, stride=stride,
                dilation=dilation, use_se=se, act=act, fold_bn=True,
                se_features=make_divisible(exp // 4, 8) if se else None,
                dtype=dtype, param_dtype=dtype,
            )
            x = blk.apply({"params": p_blk}, x)
        if i == 3:
            taps["low"] = x
        cin = out
    hc = ConvBNAct(
        960, 1, act="hardswish", fold_bn=True, dtype=dtype, param_dtype=dtype
    )
    taps["high"] = hc.apply({"params": bb_params["head_conv"]}, x)
    return taps


def _head_score_s8(head_params, low, high, dtype):
    """Card-minus-background score at stride 8, exactly equal (in exact
    arithmetic) to ``logits[..., 1] - logits[..., 0]`` of LRASPPHead before
    the final upsample (models/lraspp.py:44-72, reference train/model.py:
    124-142). All linear pieces are collapsed:

      score_s8 = up2x(high_cls_diff(cbr(high) * gate(high))) + low_cls_diff(low)

    with the per-(batch, channel) gate folded into the classifier einsum.
    """
    hp = head_params
    # cbr: 3x3 conv + (folded) BN + relu at stride 16
    x = ConvBNAct(
        hp["cbr"]["conv"]["kernel"].shape[-1], 3, act="relu", fold_bn=True,
        dtype=dtype, param_dtype=dtype,
    ).apply({"params": hp["cbr"]}, high)
    # image-level gate: pool fp32 -> 1x1 (no bias) -> sigmoid, (B, C_inter)
    m = jnp.mean(high.astype(jnp.float32), axis=(1, 2))
    w_scale, w_hi_d, w_lo_d, bias_d = _head_gate_vectors(hp)
    gate = jax.nn.sigmoid(m @ w_scale)  # (B, 128)

    # gate folds into the high classifier: (x*g) @ w == x @ (g*w), per batch
    hs = jnp.einsum(
        "bhwc,bc->bhw", x.astype(jnp.float32), gate * w_hi_d[None, :],
        preferred_element_type=jnp.float32,
    )
    ls = jnp.einsum(
        "bhwc,c->bhw", low.astype(jnp.float32), w_lo_d,
        preferred_element_type=jnp.float32,
    )
    # stride16 -> stride8: half-pixel bilinear as two tiny matmuls
    uh = jnp.asarray(_interp_matrix(hs.shape[1], ls.shape[1]))
    uw = jnp.asarray(_interp_matrix(hs.shape[2], ls.shape[2]).T)
    hs = jnp.einsum("Hh,bhw,wW->bHW", uh, hs, uw)
    return hs + ls + bias_d


def _head_gate_vectors(head_params):
    """Folded classifier vectors shared by the head formulations:
    (w_scale, w_hi_d, w_lo_d, bias_d) — card-minus-background differences."""
    hp = head_params
    w_scale = hp["scale"]["kernel"]
    w_scale = w_scale.reshape(w_scale.shape[-2], -1).astype(jnp.float32)
    w_hi = hp["high_classifier"]["kernel"].reshape(-1, 2).astype(jnp.float32)
    b_hi = hp["high_classifier"]["bias"].astype(jnp.float32)
    w_lo = hp["low_classifier"]["kernel"].reshape(-1, 2).astype(jnp.float32)
    b_lo = hp["low_classifier"]["bias"].astype(jnp.float32)
    return (
        w_scale,
        w_hi[:, 1] - w_hi[:, 0],
        w_lo[:, 1] - w_lo[:, 0],
        (b_hi[1] - b_hi[0]) + (b_lo[1] - b_lo[0]),
    )


def _head_decode_mask(head_params, low, high, dtype, out_h, out_w):
    """cbr + gate in XLA, then the whole head tail + mask decode as ONE
    Pallas kernel (fused_head_decode) — same exact math as
    _head_score_s8 -> fused_mask_decode, one HBM pass over the features.

    STATUS (measured on v5e, 512x512 b128, in-process A/B): LOSES 5 ms e2e
    (30.8 vs 25.9 ms) — the head's hot op is the 3x3 960->128 cbr conv
    (~2.3 GFLOP/image, MXU-roofline ~1.7 ms/batch), which this fusion does
    not touch; the gated einsum it absorbs rides the conv's epilogue for
    ~free in XLA, while the per-image kernel re-reads the cbr features and
    adds 128 grid steps of launch/DMA overhead. Kept as an opt-in
    (``SegPredictor(fused_head=True)``) with its golden test; the serving
    default stays on the XLA head + fused_mask_decode."""
    hp = head_params
    x = ConvBNAct(
        hp["cbr"]["conv"]["kernel"].shape[-1], 3, act="relu", fold_bn=True,
        dtype=dtype, param_dtype=dtype,
    ).apply({"params": hp["cbr"]}, high)
    m = jnp.mean(high.astype(jnp.float32), axis=(1, 2))
    w_scale, w_hi_d, w_lo_d, bias_d = _head_gate_vectors(hp)
    gate = jax.nn.sigmoid(m @ w_scale)  # (B, C_inter)
    return fused_head_decode(
        x, gate * w_hi_d[None, :], low, w_lo_d, bias_d, out_h, out_w
    )


def maybe_shard_predict(predict, mesh, n_param_args: int = 1, n_outputs: int = 1):
    """jit ``predict(*param_trees, images)`` for serving, batch-sharded over
    the mesh's 'data' axis when a multi-device ``mesh`` is given.

    shard_map (not bare GSPMD): each device runs the FULL fused program —
    Pallas kernels included, which GSPMD cannot partition — on its batch
    slice, the ``n_param_args`` leading pytrees replicated, zero
    collectives (per-image computation is embarrassingly parallel). Batch
    must divide mesh.shape['data']."""
    if mesh is None or mesh.devices.size <= 1:
        return jax.jit(predict)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if "data" not in mesh.axis_names:
        raise ValueError(f"serving mesh needs a 'data' axis, got {mesh.axis_names}")
    out_specs = P("data") if n_outputs == 1 else tuple([P("data")] * n_outputs)
    return jax.jit(
        shard_map(
            predict, mesh=mesh,
            in_specs=tuple([P()] * n_param_args + [P("data")]),
            out_specs=out_specs,
            check_vma=False,
        )
    )


class _AutoLayoutExec:
    """Per-input-shape AOT executables with XLA-chosen (AUTO) input layouts.

    The default row-major uint8 image layout is NOT what the TPU backbone
    wants: XLA picks a tiled (1,2,3,0) layout and, under plain ``jit``,
    inserts a relayout copy at graph start (measured 0.73 ms of a 24.5 ms
    batch-128 512x512 forward). Compiling with ``Layout.AUTO`` surfaces the
    preferred formats so inputs can be staged into them ahead of time —
    host->device transfers can write an arbitrary layout at no extra cost,
    so a real serving pipeline gets the copy back for free (measured e2e:
    22.5 vs 24.5 ms, +9%). Param trees are staged once per input shape; on
    a backend without layout support the first failure flips ``enabled``
    off and callers fall back to their plain jit path (the same
    degrade-don't-fail policy as the demo's provider ladder).
    """

    def __init__(self, predict_fn, param_trees: tuple) -> None:
        self._fn = predict_fn
        self._trees = param_trees
        self.enabled = os.environ.get("MTG_AUTO_LAYOUT") != "0"
        self._cache: dict = {}

    def _compile(self, images_aval):
        from jax.experimental.layout import Format, Layout

        auto = Format(Layout.AUTO)
        jitted = jax.jit(
            self._fn, in_shardings=tuple([auto] * (len(self._trees) + 1))
        )
        compiled = jitted.lower(*self._trees, images_aval).compile()
        in_formats, _ = compiled.input_formats
        *tree_formats, image_format = in_formats
        staged = tuple(
            jax.tree.map(lambda a, f: jax.device_put(a, f), t, fmts)
            for t, fmts in zip(self._trees, tree_formats)
        )
        return compiled, staged, image_format

    def _entry(self, shape, dtype):
        if not self.enabled:
            return None
        key = (tuple(shape), np.dtype(dtype).name)
        entry = self._cache.get(key)
        if entry is None:
            try:
                entry = self._compile(jax.ShapeDtypeStruct(shape, dtype))
            except Exception:
                self.enabled = False
                return None
            self._cache[key] = entry
        return entry

    def stage(self, images) -> jax.Array:
        """Transfer ``images`` into the layout the compiled program wants
        (compiling for this shape if needed). Staging once lets repeated
        calls skip the relayout; unsupported backends pass through."""
        arr = images if isinstance(images, jax.Array) else np.asarray(images)
        entry = self._entry(np.shape(arr), arr.dtype)
        if entry is None:
            return jnp.asarray(images)
        _, _, image_format = entry
        if isinstance(arr, jax.Array) and getattr(arr, "format", None) == \
                image_format:
            return arr
        return jax.device_put(arr, image_format)

    def __call__(self, images):
        """Run the staged executable; None = caller takes the jit path."""
        if not self.enabled:
            return None
        images = self.stage(images)
        entry = self._entry(images.shape, images.dtype)
        if entry is None:
            return None
        compiled, staged_trees, _ = entry
        return compiled(*staged_trees, images)


def _dequant_jax(tree, dtype):
    """In-jit dequantization of a quantize_params tree (shared traversal
    with the host-side inverse — export/quantize.py)."""
    from mtg_card_image_segmentation_tpu.export.quantize import dequantize_params

    return dequantize_params(tree, dtype, xp=jnp)


class SegPredictor:
    """predict(uint8 images) -> uint8 masks, all fused on device.

    ``quantize="int8"``: per-output-channel symmetric weight quantization
    (export/quantize.py) — kernels stored int8 in HBM, dequantized on the
    fly inside the jitted program. Gate the deployment on
    :meth:`mask_agreement` >= 0.999 vs an unquantized predictor.

    ``mesh``: multi-chip batch-parallel serving. Pass a mesh with a 'data'
    axis (``make_mesh(data=-1)`` for a whole slice); the batch shards over
    it and each chip runs the full fused program on its slice (shard_map —
    zero collectives, near-linear scaling). Batch must be a multiple of the
    'data' axis size.
    """

    def __init__(
        self,
        params,
        batch_stats,
        height: int,
        width: int,
        use_pallas: bool = True,
        dtype=jnp.bfloat16,
        fused_blocks=FUSED_BLOCKS,
        fused_head: bool = False,
        quantize: Optional[str] = None,
        mesh=None,
        auto_layout: bool = True,
    ) -> None:
        folded = fold_batch_norm(params, batch_stats)
        if use_pallas:
            folded = _fold_normalize_into_stem(folded)
        if quantize == "int8":
            from mtg_card_image_segmentation_tpu.export.quantize import (
                quantize_params,
            )

            qtree = quantize_params(jax.tree.map(np.asarray, folded))

            def put(a):
                a = np.asarray(a)
                if a.dtype == np.int8:  # quantized kernels stay int8 in HBM
                    return jnp.asarray(a)
                if a.ndim == 1 and a.dtype == np.float32:  # scales/biases
                    return jnp.asarray(a, jnp.float32)
                return jnp.asarray(a, dtype)

            self._params = jax.tree.map(put, qtree)
        elif quantize is not None:
            raise ValueError(f"unknown quantize mode {quantize!r}")
        else:
            self._params = jax.tree.map(lambda a: jnp.asarray(a, dtype), folded)
        self._quantize = quantize
        self.height, self.width = height, width

        # non-lane-aligned operating points (e.g. 320x240: H/16*W/16 = 300)
        # are handled inside fused_inverted_residual by batching images per
        # grid step until bt*h*w % 8 == 0; blocks with no valid tiling fall
        # back to XLA per-block in _fused_backbone.

        if use_pallas:

            # The space-to-depth stem kernel (ops/pallas/stem.py) is
            # measured SLOWER end-to-end (27.2 vs 24.8 ms @512x512 b128):
            # its matmul is ~free but the depth-to-space back to NHWC costs
            # ~2.4 ms in-context and Mosaic cannot fold it into the kernel
            # (lane-restructuring reshapes unsupported). XLA's own stem wins
            # because the layout engine folds the surrounding transposes.
            # Opt-in kept for future s2d-layout backbones.
            stem_ok = (
                height % 8 == 0 and width % 8 == 0
                and os.environ.get("MTG_FUSED_STEM") == "1"
            )

            def predict(p, images_u8):
                if quantize == "int8":
                    p = _dequant_jax(p, dtype)
                # normalization is folded into the stem weights; the
                # centering constant makes zero padding == ImageNet zero
                center = jnp.asarray(255.0 * _IMAGENET_MEAN, jnp.float32)
                if stem_ok:
                    # fused u8 -> centered -> conv3x3s2 -> hardswish Pallas
                    # kernel (XLA runs the C=3 stem conv at 3/128 MXU lane
                    # occupancy — measured 5.9ms of a 25.7ms forward pass)
                    stem_p = p["backbone"]["stem"]["conv"]
                    x = fused_stem(
                        images_u8, stem_p["kernel"], stem_p["bias"], center,
                        out_dtype=dtype,
                    )
                else:
                    x = (images_u8.astype(jnp.float32) - center).astype(dtype)
                taps = _fused_backbone(p["backbone"], x, dtype, fused_blocks,
                                       stem_done=stem_ok)
                if fused_head:
                    return _head_decode_mask(
                        p["head"], taps["low"], taps["high"], dtype,
                        height, width,
                    )
                score = _head_score_s8(p["head"], taps["low"], taps["high"], dtype)
                return fused_mask_decode(score, height, width)

        else:
            model = _HeadlessSeg(dtype=dtype, param_dtype=dtype)

            def predict(p, images_u8):
                if quantize == "int8":
                    p = _dequant_jax(p, dtype)
                x = (images_u8.astype(jnp.float32) / 255.0).astype(dtype)
                mean = jnp.asarray([0.485, 0.456, 0.406], dtype)
                std = jnp.asarray([0.229, 0.224, 0.225], dtype)
                x = (x - mean) / std
                logits = model.apply({"params": p}, x, train=False)
                full = bilinear_resize(logits.astype(jnp.float32), height, width)
                return jnp.argmax(full, axis=-1).astype(jnp.uint8)

        self.mesh = mesh
        self._predict = maybe_shard_predict(predict, mesh)
        # AUTO-layout staging (single-device serving only: shard_map'd
        # programs get formats per shard, not worth the complexity).
        self._auto = (
            _AutoLayoutExec(predict, (self._params,))
            if auto_layout and (mesh is None or mesh.devices.size <= 1)
            else None
        )

    @classmethod
    def from_checkpoint(
        cls, checkpoint_dir: str, name: str, height: int, width: int, **kw
    ) -> "SegPredictor":
        # template-free params read: serving needs no train state, and on
        # the remote-compile relay the throwaway model.init + eager tx.init
        # cost minutes of server startup
        from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

        params, batch_stats, _ = ckpt_lib.load_params(checkpoint_dir, name)
        return cls(params, batch_stats, height, width, **kw)

    def stage(self, images_u8) -> jax.Array:
        """Transfer ``images_u8`` into the layout the compiled program
        prefers (see :class:`_AutoLayoutExec`)."""
        if self._auto is None:
            return jnp.asarray(images_u8)
        return self._auto.stage(images_u8)

    def predict(self, images_u8) -> jax.Array:
        """(B, H, W, 3) uint8 (already at model resolution) -> (B, H, W)
        uint8 {0,1} masks."""
        if self._auto is not None:
            out = self._auto(images_u8)
            if out is not None:
                return out
        return self._predict(self._params, jnp.asarray(images_u8))

    def mask_agreement(self, other: "SegPredictor", images_u8) -> float:
        """Fraction of pixels whose class decision matches ``other`` — the
        int8 deployment gate (>= 0.999 vs the bf16 predictor)."""
        a = np.asarray(self.predict(images_u8))
        b = np.asarray(other.predict(images_u8))
        return float((a == b).mean())
