"""Torch-backed ONNX executor — the *independent* half of the export parity
evidence.

The mini JAX runtime (onnx_runtime_mini.py) shares authorship and numerics
with the exporter, so a bug present in both would pass the in-repo gate
(train/export.py:131-165 analog). This executor re-interprets every node
with torch CPU kernels (F.conv2d / F.conv_transpose2d / F.interpolate /
F.hardsigmoid ...), whose padding, stride, kernel-flip and resize semantics
are implemented by an unrelated codebase. Agreement of
JAX-model == mini-runtime == torch-runner within the fp32 gate is therefore
evidence the .onnx file means what ONNX says it means, not merely what this
repo thinks it means.

Torch is CPU-only here (baked into the image); graphs are executed eagerly
node by node.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from mtg_card_image_segmentation_tpu.export import onnx_proto as op


def run_model(model: op.Model, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    import torch
    import torch.nn.functional as F

    env: Dict[str, "torch.Tensor"] = {}
    for t in model.initializers:
        arr = t.array
        env[t.name] = torch.from_numpy(
            arr.astype(np.float32) if arr.dtype == np.float16
            else np.ascontiguousarray(arr).copy()
        )
    for name, value in feeds.items():
        env[name] = torch.from_numpy(np.ascontiguousarray(value).copy())

    for node in model.nodes:
        ins = [env[i] if i else None for i in node.inputs]
        a = node.attributes
        t = node.op_type
        if t == "Conv":
            pads = a.get("pads", [0, 0, 0, 0])
            assert pads[0] == pads[2] and pads[1] == pads[3], pads
            out = F.conv2d(
                ins[0], ins[1], ins[2] if len(ins) > 2 else None,
                stride=tuple(a.get("strides", [1, 1])),
                padding=(pads[0], pads[1]),
                dilation=tuple(a.get("dilations", [1, 1])),
                groups=int(a.get("group", 1)),
            )
        elif t == "ConvTranspose":
            pads = a.get("pads", [0, 0, 0, 0])
            assert pads[0] == pads[2] and pads[1] == pads[3], pads
            out = F.conv_transpose2d(
                ins[0], ins[1], ins[2] if len(ins) > 2 else None,
                stride=tuple(a.get("strides", [1, 1])),
                padding=(pads[0], pads[1]),
            )
        elif t == "Relu":
            out = F.relu(ins[0])
        elif t == "Sigmoid":
            out = torch.sigmoid(ins[0])
        elif t == "HardSigmoid":
            alpha = a.get("alpha", 0.2)
            beta = a.get("beta", 0.5)
            if abs(alpha - 1.0 / 6.0) < 1e-6 and abs(beta - 0.5) < 1e-6:
                out = F.hardsigmoid(ins[0])  # torch's own kernel
            else:
                out = torch.clamp(ins[0] * alpha + beta, 0.0, 1.0)
        elif t == "Mul":
            out = ins[0] * ins[1]
        elif t == "Add":
            out = ins[0] + ins[1]
        elif t == "GlobalAveragePool":
            out = F.adaptive_avg_pool2d(ins[0], 1)
        elif t == "Resize":
            if len(node.inputs) > 3 and node.inputs[3]:
                sizes = env[node.inputs[3]].numpy()
                size = (int(sizes[2]), int(sizes[3]))
            else:
                # dynamic-batch graphs use the `scales` input
                # (ONNX: out = floor(in * scale))
                import math

                scales = env[node.inputs[2]].numpy()
                size = (
                    int(math.floor(ins[0].shape[2] * float(scales[2]))),
                    int(math.floor(ins[0].shape[3] * float(scales[3]))),
                )
            mode = a.get("mode", "linear")
            ctm = a.get("coordinate_transformation_mode", "half_pixel")
            if mode == "linear":
                assert ctm == "half_pixel", ctm
                out = F.interpolate(
                    ins[0], size=size, mode="bilinear", align_corners=False
                )
            else:
                # torch 'nearest' == ONNX asymmetric + floor
                assert ctm == "asymmetric", ctm
                assert a.get("nearest_mode", "floor") == "floor"
                out = F.interpolate(ins[0], size=size, mode="nearest")
        elif t == "Cast":
            to = int(a["to"])
            out = ins[0].to(
                {op.FLOAT: torch.float32, op.FLOAT16: torch.float16,
                 op.INT64: torch.int64, op.INT32: torch.int32}[to]
            )
            if to == op.FLOAT16:
                # keep executing in fp32 after recording the precision loss
                out = out.to(torch.float32)
        elif t == "Concat":
            out = torch.cat(ins, dim=int(a.get("axis", 1)))
        elif t == "MaxPool":
            k = tuple(a["kernel_shape"])
            s = tuple(a.get("strides", k))
            pads = a.get("pads", [0, 0, 0, 0])
            out = F.max_pool2d(ins[0], k, s, (pads[0], pads[1]))
        elif t == "Softmax":
            out = F.softmax(ins[0], dim=int(a.get("axis", -1)))
        elif t == "Reshape":
            out = ins[0].reshape(
                tuple(int(d) for d in env[node.inputs[1]].numpy())
            )
        elif t == "Transpose":
            out = ins[0].permute(tuple(a["perm"]))
        elif t == "MatMul":
            out = torch.matmul(ins[0], ins[1])
        elif t == "Sub":
            out = ins[0] - ins[1]
        elif t == "DequantizeLinear":
            axis = int(a.get("axis", 1))
            shape = [1] * ins[0].ndim
            shape[axis] = -1
            zp = ins[2].to(torch.float32) if len(ins) > 2 and ins[2] is not None else 0.0
            out = (ins[0].to(torch.float32) - zp) * ins[1].reshape(shape)
        elif t == "Slice":
            starts = env[node.inputs[1]].numpy()
            ends = env[node.inputs[2]].numpy()
            axes = env[node.inputs[3]].numpy()
            out = ins[0]
            # the exporter only emits explicit in-bounds non-negative indices
            for s, e, ax in zip(starts, ends, axes):
                dim = out.shape[int(ax)]
                start, end = int(s), int(min(e, dim))
                out = out.narrow(int(ax), start, end - start)
        else:
            raise NotImplementedError(f"op {t}")
        env[node.outputs[0]] = out

    return {
        name: env[name].detach().numpy() for name, _, _ in model.outputs
    }
