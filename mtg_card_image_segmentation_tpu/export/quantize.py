"""int8 weight quantization: QDQ ONNX export + param-tree quantization.

The north star names a "Pruned + bf16/int8 export pipeline" (BASELINE.json
config #5). Two consumers:

- :func:`convert_to_int8`: fp32 ONNX graph -> QDQ form. Every Conv /
  ConvTranspose weight is replaced by a per-output-channel symmetric int8
  tensor + a DequantizeLinear node (the standard ONNX quantization format;
  ONNX Runtime executes and kernel-fuses it, and the file shrinks ~4x —
  most of the win for the browser demo's model download). Compute stays
  fp32, so accuracy is governed by the weight rounding alone; exports are
  gated on mask agreement vs the fp32 graph (export_seg.py --int8).
- :func:`quantize_params`: same per-channel scheme on the folded Flax param
  tree for the serving predictor's int8 weight mode (weights live in HBM as
  int8 + fp32 scales, dequantized on the fly).

Symmetric per-channel: scale_o = max|W[..., o]| / 127, W_q = round(W/scale).

Why weights-only (no int8 MXU compute): measured on the real v5e, int8 x
int8 -> int32 dot_general is SLOWER than bf16 for this model's matmul
shapes (M=128K-512K, K=80-960: 0.15x-0.70x the bf16 rate) — the int8 MXU
path only pays off at far larger contraction dims. int8 here is a memory
play (4x smaller HBM weights / ONNX download), not a FLOP play.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from mtg_card_image_segmentation_tpu.export import onnx_proto as op


def _quantize_channelwise(w: np.ndarray, axis: int) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8: returns (w_int8, scales along ``axis``)."""
    red = tuple(i for i in range(w.ndim) if i != axis)
    amax = np.maximum(np.abs(w).max(axis=red), 1e-12)
    scale = (amax / 127.0).astype(np.float32)
    shape = [1] * w.ndim
    shape[axis] = -1
    q = np.clip(np.round(w / scale.reshape(shape)), -127, 127).astype(np.int8)
    return q, scale


def convert_to_int8(model: op.Model) -> op.Model:
    """fp32 ONNX -> QDQ int8-weight ONNX (opset must be >= 13 for per-axis
    DequantizeLinear; the exporters emit 17/19)."""
    assert model.opset >= 13, model.opset
    # weight initializers consumed (only) as Conv/ConvTranspose input 1
    weight_users: Dict[str, list] = {}
    for n in model.nodes:
        for slot, i in enumerate(n.inputs):
            weight_users.setdefault(i, []).append((n.op_type, slot))

    inits, nodes = [], []
    for t in model.initializers:
        users = weight_users.get(t.name, [])
        is_conv_weight = (
            t.array.dtype == np.float32
            and t.array.ndim == 4
            and users
            and all(u == ("Conv", 1) or u == ("ConvTranspose", 1) for u in users)
        )
        if not is_conv_weight:
            inits.append(t)
            continue
        # Conv weights are OIHW (axis 0 = output channel); ConvTranspose are
        # IOHW (axis 1). Mixed consumption can't happen (name is unique).
        axis = 0 if users[0][0] == "Conv" else 1
        q, scale = _quantize_channelwise(t.array, axis)
        qname, sname = t.name + "_q", t.name + "_qscale"
        inits.append(op.Tensor(qname, q))
        inits.append(op.Tensor(sname, scale))
        nodes.append(
            op.Node(
                "DequantizeLinear", [qname, sname], [t.name],
                t.name + "_dq", {"axis": axis},
            )
        )
    return op.Model(
        model.graph_name, nodes + list(model.nodes), inits,
        list(model.inputs), list(model.outputs), model.opset,
        model.producer, model.doc,
    )


def quantize_params(folded: Dict, min_size: int = 512) -> Dict:
    """Folded Flax param tree -> same tree with every conv kernel of >=
    ``min_size`` elements replaced by {"kernel_q": int8, "kernel_scale":
    (O,) fp32} (HWIO, per-output-channel). Small kernels (biases, 1x1
    classifiers) stay fp32 — no accuracy risk for negligible bytes."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (
                k == "kernel"
                and hasattr(v, "ndim")
                and v.ndim == 4
                and v.size >= min_size
            ):
                q, scale = _quantize_channelwise(np.asarray(v, np.float32), 3)
                out["kernel_q"] = q
                out["kernel_scale"] = scale
            else:
                out[k] = rec(v)
        return out

    return rec(folded)


def dequantize_params(tree: Dict, dtype=np.float32, xp=np) -> Dict:
    """Inverse of :func:`quantize_params` (materializes dense kernels).

    ``xp=np`` for host-side use; pass ``xp=jax.numpy`` to run inside a
    jitted program (the int8 serving mode: kernels live in HBM as int8 and
    XLA fuses the scale multiply into the weight load)."""

    def rec(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "kernel_q":
                out["kernel"] = (
                    xp.asarray(v, xp.float32) * node["kernel_scale"]
                ).astype(dtype)
            elif k == "kernel_scale":
                continue
            else:
                out[k] = rec(v)
        return out

    return rec(tree)
