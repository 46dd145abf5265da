"""Mini ONNX executor — the export parity harness.

The environment has no onnxruntime, so the parity gate
(train/export.py:131-165: exported-vs-source max|diff| < 1e-4) is enforced
with our own executor: parse the serialized .onnx file back
(export/onnx_proto.py) and run it with jax ops. The whole node loop is
traced under jit, so execution is one XLA program.

Supports exactly the op set our exporter emits: Conv, Relu, Sigmoid,
HardSigmoid, Mul, Add, GlobalAveragePool, Resize(linear, half_pixel,
sizes), Cast, ConvTranspose, Concat, MaxPool, Softmax.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from mtg_card_image_segmentation_tpu.export import onnx_proto as op
from mtg_card_image_segmentation_tpu.ops.resize import bilinear_resize

_ONNX_DTYPE_TO_JNP = {
    op.FLOAT: jnp.float32,
    op.FLOAT16: jnp.float16,
    op.INT64: jnp.int64,
    op.INT32: jnp.int32,
    op.UINT8: jnp.uint8,
    op.BOOL: jnp.bool_,
}


def _conv(x, w, b, attrs, transpose=False):
    strides = tuple(attrs.get("strides", [1, 1]))
    pads = attrs.get("pads", [0, 0, 0, 0])
    dil = tuple(attrs.get("dilations", [1, 1]))
    groups = int(attrs.get("group", 1))
    padding = [(pads[0], pads[2]), (pads[1], pads[3])]
    dn = ("NCHW", "OIHW", "NCHW")
    if transpose:
        # ConvTranspose (stride s, pad p, kernel k): lhs-dilated conv with
        # flipped kernel; weights are (I, O/g, kH, kW)
        kh, kw = w.shape[2], w.shape[3]
        w_flip = jnp.flip(w, axis=(2, 3))
        w_t = jnp.swapaxes(w_flip, 0, 1)  # -> (O/g, I, kH, kW)
        out = jax.lax.conv_general_dilated(
            x, w_t, window_strides=(1, 1),
            padding=[(kh - 1 - pads[0], kh - 1 - pads[2]),
                     (kw - 1 - pads[1], kw - 1 - pads[3])],
            lhs_dilation=strides, rhs_dilation=dil,
            dimension_numbers=dn, feature_group_count=groups,
        )
    else:
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=padding, rhs_dilation=dil,
            dimension_numbers=dn, feature_group_count=groups,
        )
    if b is not None:
        out = out + b.reshape(1, -1, 1, 1)
    return out


def _resize(x, out_hw, attrs):
    mode = attrs.get("mode", "linear")
    ctm = attrs.get("coordinate_transformation_mode", "half_pixel")
    out_h, out_w = out_hw
    nhwc = jnp.moveaxis(x, 1, -1)
    if mode == "linear":
        assert ctm == "half_pixel", ctm
        out = bilinear_resize(nhwc.astype(jnp.float32), out_h, out_w)
    else:
        # nearest: our exporter emits torch convention (asymmetric + floor,
        # ops/resize.py nearest_resize); half_pixel+round_prefer_floor is
        # numerically identical for the integer upscale factors we emit
        assert ctm in ("asymmetric", "half_pixel"), ctm
        assert attrs.get("nearest_mode", "round_prefer_floor") in (
            "floor", "round_prefer_floor"
        )
        from mtg_card_image_segmentation_tpu.ops.resize import nearest_resize

        out = nearest_resize(nhwc, out_h, out_w)
    return jnp.moveaxis(out.astype(x.dtype), -1, 1)


def run_model(model: op.Model, feeds: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
    """Execute the graph eagerly-traced (call under jit for speed)."""
    env: Dict[str, jax.Array] = {}
    for t in model.initializers:
        arr = t.array
        env[t.name] = jnp.asarray(
            arr.astype(np.float32) if arr.dtype == np.float16 else arr
        ).astype(jnp.float16 if arr.dtype == np.float16 else arr.dtype)
    for name, value in feeds.items():
        env[name] = jnp.asarray(value)

    for node in model.nodes:
        ins = [env[i] if i else None for i in node.inputs]
        a = node.attributes
        t = node.op_type
        if t == "Conv":
            out = _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a)
        elif t == "ConvTranspose":
            out = _conv(ins[0], ins[1], ins[2] if len(ins) > 2 else None, a, transpose=True)
        elif t == "Relu":
            out = jnp.maximum(ins[0], 0)
        elif t == "Sigmoid":
            out = jax.nn.sigmoid(ins[0].astype(jnp.float32)).astype(ins[0].dtype)
        elif t == "HardSigmoid":
            alpha = a.get("alpha", 0.2)
            beta = a.get("beta", 0.5)
            out = jnp.clip(ins[0] * alpha + beta, 0.0, 1.0)
        elif t == "Mul":
            out = ins[0] * ins[1]
        elif t == "Add":
            out = ins[0] + ins[1]
        elif t == "GlobalAveragePool":
            out = jnp.mean(ins[0].astype(jnp.float32), axis=(2, 3), keepdims=True).astype(ins[0].dtype)
        elif t == "Resize":
            if len(node.inputs) > 3 and node.inputs[3]:
                sizes = np.asarray(model_init(model, node.inputs[3]))
                out_hw = (int(sizes[2]), int(sizes[3]))
            else:
                # dynamic-batch graphs size spatially via the `scales`
                # input (ONNX: out = floor(in * scale))
                scales = np.asarray(model_init(model, node.inputs[2]))
                out_hw = (
                    int(np.floor(ins[0].shape[2] * float(scales[2]))),
                    int(np.floor(ins[0].shape[3] * float(scales[3]))),
                )
            out = _resize(ins[0], out_hw, a)
        elif t == "Cast":
            out = ins[0].astype(_ONNX_DTYPE_TO_JNP[int(a["to"])])
        elif t == "Concat":
            out = jnp.concatenate(ins, axis=int(a.get("axis", 1)))
        elif t == "MaxPool":
            k = tuple(a["kernel_shape"])
            s = tuple(a.get("strides", k))
            pads = a.get("pads", [0, 0, 0, 0])
            out = jax.lax.reduce_window(
                ins[0], -jnp.inf, jax.lax.max, (1, 1, *k), (1, 1, *s),
                [(0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])],
            )
        elif t == "Softmax":
            out = jax.nn.softmax(ins[0], axis=int(a.get("axis", -1)))
        elif t == "Reshape":
            out = jnp.reshape(
                ins[0], tuple(int(d) for d in np.asarray(model_init(model, node.inputs[1])))
            )
        elif t == "Transpose":
            out = jnp.transpose(ins[0], tuple(a["perm"]))
        elif t == "MatMul":
            out = jnp.matmul(ins[0], ins[1])
        elif t == "Sub":
            out = ins[0] - ins[1]
        elif t == "DequantizeLinear":
            axis = int(a.get("axis", 1))
            scale = ins[1]
            shape = [1] * ins[0].ndim
            shape[axis] = -1
            zp = ins[2].astype(jnp.float32) if len(ins) > 2 and ins[2] is not None else 0.0
            out = (ins[0].astype(jnp.float32) - zp) * scale.reshape(shape)
        elif t == "Slice":
            starts = np.asarray(model_init(model, node.inputs[1]))
            ends = np.asarray(model_init(model, node.inputs[2]))
            axes = np.asarray(model_init(model, node.inputs[3]))
            idx = [slice(None)] * ins[0].ndim
            for s, e, ax in zip(starts, ends, axes):
                dim = ins[0].shape[int(ax)]
                idx[int(ax)] = slice(
                    int(np.clip(s, -dim, dim)), int(np.clip(e, -dim, dim))
                )
            out = ins[0][tuple(idx)]
        else:
            raise NotImplementedError(f"op {t}")
        env[node.outputs[0]] = out

    return {name: env[name] for name, _, _ in model.outputs}


def model_init(model: op.Model, name: str) -> np.ndarray:
    for t in model.initializers:
        if t.name == name:
            return t.array
    raise KeyError(name)


def make_runner(model: op.Model):
    """jit-compiled single-input runner for the common 1-in/1-out case."""
    in_name = model.inputs[0][0]
    out_name = model.outputs[0][0]

    @jax.jit
    def run(x):
        return run_model(model, {in_name: x})[out_name]

    return run
