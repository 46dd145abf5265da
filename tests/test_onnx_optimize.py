"""ONNX graph-optimization passes (export/onnx_optimize.py) — semantics
preserved, junk removed (reference train/export.py:102-129 ships
onnxoptimizer-processed copies; ours is gated the same way, by executing
the optimized graph)."""

import numpy as np
import pytest

from mtg_card_image_segmentation_tpu.export import onnx_proto as op
from mtg_card_image_segmentation_tpu.export.onnx_optimize import optimize
from mtg_card_image_segmentation_tpu.export.onnx_runtime_mini import run_model


def _model(nodes, inits, inputs, outputs):
    return op.Model("t", nodes, inits, inputs, outputs)


def test_identity_and_dead_node_elimination():
    nodes = [
        op.Node("Identity", ["x"], ["x_id"]),
        op.Node("Relu", ["x_id"], ["y"]),
        op.Node("Sigmoid", ["x_id"], ["unused"]),  # dead
    ]
    m = _model(nodes, [], [("x", op.FLOAT, (1, 4))], [("y", op.FLOAT, (1, 4))])
    stats = optimize(m)
    assert stats["identity_removed"] == 1
    assert stats["dead_nodes_removed"] == 1
    assert [n.op_type for n in m.nodes] == ["Relu"]
    x = np.array([[-1.0, 0.0, 2.0, -3.0]], np.float32)
    out = np.asarray(run_model(m, {"x": x})["y"])
    np.testing.assert_array_equal(out, np.maximum(x, 0))


def test_identity_feeding_graph_output_renamed():
    nodes = [
        op.Node("Relu", ["x"], ["h"]),
        op.Node("Identity", ["h"], ["y"]),
    ]
    m = _model(nodes, [], [("x", op.FLOAT, (2,))], [("y", op.FLOAT, (2,))])
    optimize(m)
    assert [n.op_type for n in m.nodes] == ["Relu"]
    assert m.nodes[0].outputs == ["y"]
    out = np.asarray(run_model(m, {"x": np.array([-1.0, 5.0], np.float32)})["y"])
    np.testing.assert_array_equal(out, [0.0, 5.0])


def test_nop_cast_removed_and_widening_chain_collapsed():
    nodes = [
        op.Node("Cast", ["x"], ["a"], attributes={"to": op.FLOAT}),  # no-op
        op.Node("Cast", ["a"], ["b"], attributes={"to": op.FLOAT16}),
        op.Node("Relu", ["b"], ["y"]),
    ]
    m = _model(nodes, [], [("x", op.FLOAT, (4,))], [("y", op.FLOAT16, (4,))])
    stats = optimize(m)
    assert stats["nop_cast_removed"] >= 1
    assert sum(n.op_type == "Cast" for n in m.nodes) == 1


def test_lossy_cast_chain_not_collapsed():
    # f32 -> f16 -> f32 must keep the f16 rounding
    nodes = [
        op.Node("Cast", ["x"], ["a"], attributes={"to": op.FLOAT16}),
        op.Node("Cast", ["a"], ["b"], attributes={"to": op.FLOAT}),
        op.Node("Relu", ["b"], ["y"]),
    ]
    m = _model(nodes, [], [("x", op.FLOAT, (2,))], [("y", op.FLOAT, (2,))])
    optimize(m)
    assert sum(n.op_type == "Cast" for n in m.nodes) == 2


def test_constant_folding_precomputes_initializer_math():
    w = np.arange(6, dtype=np.float32).reshape(2, 3)
    s = np.array(2.0, np.float32)
    nodes = [
        op.Node("Mul", ["w", "s"], ["w_scaled"]),
        op.Node("Transpose", ["w_scaled"], ["w_t"], attributes={"perm": [1, 0]}),
        op.Node("Add", ["x", "w_t"], ["y"]),
    ]
    m = _model(
        nodes,
        [op.Tensor("w", w), op.Tensor("s", s)],
        [("x", op.FLOAT, (3, 2))],
        [("y", op.FLOAT, (3, 2))],
    )
    stats = optimize(m)
    assert stats["constants_folded"] == 2
    assert [n.op_type for n in m.nodes] == ["Add"]
    # only the folded result remains as an initializer
    assert {t.name for t in m.initializers} == {"w_t"}
    x = np.zeros((3, 2), np.float32)
    out = np.asarray(run_model(m, {"x": x})["y"])
    np.testing.assert_allclose(out, (w * 2.0).T)


def test_dedupe_initializers():
    a = np.ones((4,), np.float32)
    nodes = [
        op.Node("Add", ["x", "c1"], ["h"]),
        op.Node("Add", ["h", "c2"], ["y"]),
    ]
    m = _model(
        nodes,
        [op.Tensor("c1", a), op.Tensor("c2", a.copy())],
        [("x", op.FLOAT, (4,))],
        [("y", op.FLOAT, (4,))],
    )
    stats = optimize(m)
    assert stats["initializers_deduped"] == 1
    assert len(m.initializers) == 1
    out = np.asarray(run_model(m, {"x": np.zeros(4, np.float32)})["y"])
    np.testing.assert_array_equal(out, 2 * a)


def test_optimized_seg_export_parity():
    """End-to-end: optimize the real (tiny) seg export, assert identical
    outputs through the mini executor and a smaller/equal graph."""
    import jax
    import jax.numpy as jnp

    from mtg_card_image_segmentation_tpu.export import fold_batch_norm
    from mtg_card_image_segmentation_tpu.export.onnx_export import (
        export_seg_model,
    )
    from mtg_card_image_segmentation_tpu.models import create_model

    h, w = 64, 48
    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, h, w, 3)), train=False)
    )(jax.random.key(0))
    folded = fold_batch_norm(variables["params"], variables["batch_stats"])
    onnx_model = export_seg_model(folded, input_hw=(h, w))
    n_before = len(onnx_model.nodes)
    x = np.random.default_rng(0).standard_normal((1, 3, h, w)).astype(np.float32)
    ref = np.asarray(run_model(onnx_model, {"input": x})["output"])
    optimize(onnx_model)
    got = np.asarray(run_model(onnx_model, {"input": x})["output"])
    np.testing.assert_array_equal(ref, got)
    assert len(onnx_model.nodes) <= n_before
