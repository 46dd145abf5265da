"""Seg-model -> ONNX graph exporter.

Produces the reference's deployment contract (train/export.py:315-343,
demo/src/model-inference.js:12-17): input "input" (N,3,H,W) fp32
ImageNet-normalized NCHW, output "output" (N,num_classes,H,W) logits — so
the reference's ONNX-Runtime-Web browser demo is a drop-in consumer.

The graph is emitted from the *BN-folded* param tree (export/fold_bn.py):
Conv(+bias) / Relu / HardSigmoid / Mul / Add / Sigmoid / GlobalAveragePool /
Resize(linear, half_pixel) only — no BatchNormalization nodes, and
hardswish is decomposed as x*HardSigmoid(x) (torch opset-11/13 convention;
the demo notes the WebGL HardSigmoid gap and falls back to WASM,
demo/README.md:46-48).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from mtg_card_image_segmentation_tpu.export import onnx_proto as op
from mtg_card_image_segmentation_tpu.models.mobilenetv3 import (
    HIGH_CHANNELS,
    LOW_TAP_ROW,
    MOBILENET_V3_LARGE_ROWS,
)
from mtg_card_image_segmentation_tpu.models.layers import make_divisible


class GraphBuilder:
    def __init__(self) -> None:
        self.nodes: List[op.Node] = []
        self.initializers: List[op.Tensor] = []
        self._counter = 0

    def fresh(self, hint: str) -> str:
        self._counter += 1
        return f"{hint}_{self._counter}"

    def init_tensor(self, name: str, array: np.ndarray) -> str:
        self.initializers.append(op.Tensor(name, np.ascontiguousarray(array)))
        return name

    def node(self, op_type: str, inputs: List[str], hint: str, **attrs) -> str:
        out = self.fresh(hint)
        self.nodes.append(op.Node(op_type, inputs, [out], out, attrs))
        return out

    # -- layer helpers -----------------------------------------------------

    def conv(
        self, x: str, kernel_hwio: np.ndarray, bias: Optional[np.ndarray],
        hint: str, stride: int = 1, dilation: int = 1, groups: int = 1,
    ) -> str:
        k = kernel_hwio.shape[0]
        pad = (k - 1) // 2 * dilation
        w = self.init_tensor(
            self.fresh(hint + "_w"),
            np.transpose(kernel_hwio, (3, 2, 0, 1)).astype(kernel_hwio.dtype),
        )
        inputs = [x, w]
        if bias is not None:
            inputs.append(self.init_tensor(self.fresh(hint + "_b"), bias))
        return self.node(
            "Conv", inputs, hint,
            kernel_shape=[k, k], strides=[stride, stride],
            pads=[pad, pad, pad, pad], dilations=[dilation, dilation],
            group=groups,
        )

    def hardsigmoid(self, x: str, hint: str = "hsig") -> str:
        # torch hardsigmoid: relu6(x+3)/6 == HardSigmoid(alpha=1/6, beta=0.5)
        return self.node("HardSigmoid", [x], hint, alpha=1.0 / 6.0, beta=0.5)

    def hardswish(self, x: str, hint: str = "hswish") -> str:
        return self.node("Mul", [x, self.hardsigmoid(x, hint + "_hs")], hint)

    def act(self, x: str, act: Optional[str], hint: str) -> str:
        if act is None:
            return x
        if act == "relu":
            return self.node("Relu", [x], hint + "_relu")
        if act == "hardswish":
            return self.hardswish(x, hint + "_hswish")
        if act == "sigmoid":
            return self.node("Sigmoid", [x], hint + "_sig")
        raise ValueError(act)

    def resize_to(self, x: str, n: int, c: int, h: int, w: int, hint: str) -> str:
        sizes = self.init_tensor(
            self.fresh(hint + "_sizes"), np.asarray([n, c, h, w], np.int64)
        )
        return self.node(
            "Resize", [x, "", "", sizes], hint,
            mode="linear", coordinate_transformation_mode="half_pixel",
        )

    def global_avg_pool(self, x: str, hint: str = "gap") -> str:
        return self.node("GlobalAveragePool", [x], hint)


def _np(tree, *path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node, np.float32)


def export_seg_model(
    folded_params: Dict,
    input_hw: Tuple[int, int] = (320, 240),
    num_classes: int = 2,
    inter_channels: int = 128,
    batch: int = 1,
    opset: int = 17,
) -> op.Model:
    """Folded seg params (fold_bn=True layout) -> ONNX Model."""
    h, w = input_hw
    g = GraphBuilder()
    bb = folded_params["backbone"]
    head = folded_params["head"]

    x = "input"
    # stem
    x = g.conv(x, _np(bb, "stem", "conv", "kernel"), _np(bb, "stem", "conv", "bias"),
               "stem", stride=2)
    x = g.act(x, "hardswish", "stem")

    in_ch = 16
    low_name = None
    for i, (k, exp, out_c, se, act, stride, in_tail) in enumerate(
        MOBILENET_V3_LARGE_ROWS
    ):
        blk = bb[f"block{i}"]
        dilation = 2 if in_tail else 1
        eff_stride = 1 if dilation > 1 else stride
        residual_src = x
        y = x
        if exp != in_ch:
            y = g.conv(y, _np(blk, "expand", "conv", "kernel"),
                       _np(blk, "expand", "conv", "bias"), f"b{i}_expand")
            y = g.act(y, act, f"b{i}_expand")
        y = g.conv(y, _np(blk, "depthwise", "conv", "kernel"),
                   _np(blk, "depthwise", "conv", "bias"), f"b{i}_dw",
                   stride=eff_stride, dilation=dilation, groups=exp)
        y = g.act(y, act, f"b{i}_dw")
        if se:
            s = g.global_avg_pool(y, f"b{i}_se_gap")
            s = g.conv(s, _np(blk, "se", "fc1", "kernel"), _np(blk, "se", "fc1", "bias"),
                       f"b{i}_se_fc1")
            s = g.node("Relu", [s], f"b{i}_se_relu")
            s = g.conv(s, _np(blk, "se", "fc2", "kernel"), _np(blk, "se", "fc2", "bias"),
                       f"b{i}_se_fc2")
            s = g.hardsigmoid(s, f"b{i}_se")
            y = g.node("Mul", [y, s], f"b{i}_se_mul")
        y = g.conv(y, _np(blk, "project", "conv", "kernel"),
                   _np(blk, "project", "conv", "bias"), f"b{i}_proj")
        if eff_stride == 1 and in_ch == out_c:
            y = g.node("Add", [y, residual_src], f"b{i}_res")
        x = y
        in_ch = out_c
        if i == LOW_TAP_ROW:
            low_name = x

    x = g.conv(x, _np(bb, "head_conv", "conv", "kernel"),
               _np(bb, "head_conv", "conv", "bias"), "head_conv")
    high = g.act(x, "hardswish", "head_conv")

    # LR-ASPP head (train/model.py:124-142 dataflow)
    cbr = g.conv(high, _np(head, "cbr", "conv", "kernel"),
                 _np(head, "cbr", "conv", "bias"), "cbr")
    cbr = g.node("Relu", [cbr], "cbr_relu")
    s = g.global_avg_pool(high, "scale_gap")
    s = g.conv(s, _np(head, "scale", "kernel"), None, "scale")
    s = g.node("Sigmoid", [s], "scale_sig")
    gated = g.node("Mul", [cbr, s], "gate")
    h8, w8 = h // 8, w // 8
    up = g.resize_to(gated, batch, inter_channels, h8, w8, "up_s8")
    low_logits = g.conv(low_name, _np(head, "low_classifier", "kernel"),
                        _np(head, "low_classifier", "bias"), "low_cls")
    high_logits = g.conv(up, _np(head, "high_classifier", "kernel"),
                         _np(head, "high_classifier", "bias"), "high_cls")
    merged = g.node("Add", [low_logits, high_logits], "merge")
    out = g.resize_to(merged, batch, num_classes, h, w, "up_full")
    # rename final node output to the contract name
    g.nodes[-1].outputs = ["output"]

    return op.Model(
        graph_name="card_segmentation",
        nodes=g.nodes,
        initializers=g.initializers,
        inputs=[("input", op.FLOAT, (batch, 3, h, w))],
        outputs=[("output", op.FLOAT, (batch, num_classes, h, w))],
        opset=opset,
        doc=(
            "LR-ASPP MobileNetV3-Large card segmentation, exported by "
            "mtg_card_image_segmentation_tpu (BN folded). Input: ImageNet-"
            "normalized NCHW fp32. Output: class logits (0=background, 1=card)."
        ),
    )


def convert_to_fp16(model: op.Model, keep_io_types: bool = True) -> op.Model:
    """fp32 -> fp16 weight/compute conversion with fp32 I/O casts
    (onnx_fp16_converter.py:66-79 semantics: keep_io_types default)."""
    inits = []
    for t in model.initializers:
        if t.array.dtype == np.float32:
            inits.append(op.Tensor(t.name, t.array.astype(np.float16)))
        else:
            inits.append(t)
    nodes = [op.Node(n.op_type, list(n.inputs), list(n.outputs), n.name, dict(n.attributes)) for n in model.nodes]
    inputs = list(model.inputs)
    outputs = list(model.outputs)
    if keep_io_types:
        # input cast fp32 -> fp16
        for idx, (name, elem, shape) in enumerate(inputs):
            cast_out = name + "_fp16"
            for n in nodes:
                n.inputs = [cast_out if i == name else i for i in n.inputs]
            nodes.insert(
                0, op.Node("Cast", [name], [cast_out], cast_out, {"to": op.FLOAT16})
            )
        # output cast fp16 -> fp32
        for idx, (name, elem, shape) in enumerate(outputs):
            pre = name + "_fp16"
            for n in nodes:
                n.outputs = [pre if o == name else o for o in n.outputs]
            nodes.append(op.Node("Cast", [pre], [name], name + "_cast", {"to": op.FLOAT}))
    else:
        inputs = [(n, op.FLOAT16, s) for n, e, s in inputs]
        outputs = [(n, op.FLOAT16, s) for n, e, s in outputs]
    return op.Model(
        model.graph_name, nodes, inits, inputs, outputs, model.opset,
        model.producer, model.doc,
    )
