"""YOLO12n-pose ONNX export: graph parity vs the Flax decode (the
reference's YOLO export contract, *_yolo12n/model.py:266-310), wire-format
roundtrip, independent torch-runner agreement, fp16 conversion."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.export import fold_batch_norm
from mtg_card_image_segmentation_tpu.export import onnx_proto as op
from mtg_card_image_segmentation_tpu.export.onnx_runtime_mini import make_runner
from mtg_card_image_segmentation_tpu.export.onnx_yolo import export_yolo_model
from mtg_card_image_segmentation_tpu.models.yolo12_pose import YOLO12Pose

IMGSZ = 128


def _expected_output0(boxes, scores, kpts):
    """Assemble flax decode outputs into the exported (1, rows, A) layout."""
    b = np.asarray(boxes)[0].T  # (4, A)
    s = np.asarray(scores)[0].T  # (nc, A)
    k = np.transpose(np.asarray(kpts)[0], (1, 2, 0)).reshape(-1, b.shape[1])
    return np.concatenate([b, s, k], axis=0)[None]


@pytest.fixture(scope="module")
def yolo_export():
    model = YOLO12Pose(fold_bn=False, dtype=jnp.float32)
    variables = jax.jit(
        lambda key: model.init(key, jnp.zeros((1, IMGSZ, IMGSZ, 3)), train=True)
    )(jax.random.key(0))
    # move BN stats off init so folding is non-trivial
    _, mutated = model.apply(
        variables,
        jnp.asarray(np.random.default_rng(1).random((2, IMGSZ, IMGSZ, 3)), jnp.float32),
        train=True, mutable=["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
    folded = fold_batch_norm(variables["params"], variables["batch_stats"])
    onnx_model = export_yolo_model(folded, imgsz=IMGSZ)

    folded_model = YOLO12Pose(fold_bn=True, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    x_nchw = rng.random((1, 3, IMGSZ, IMGSZ)).astype(np.float32)
    boxes, scores, kpts = jax.jit(
        lambda img: folded_model.apply({"params": folded}, img, train=False)
    )(jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))))
    expected = _expected_output0(boxes, scores, kpts)
    return onnx_model, x_nchw, expected


def test_yolo_export_parity_fp32(yolo_export, tmp_path):
    onnx_model, x_nchw, expected = yolo_export
    path = str(tmp_path / "yolo.onnx")
    onnx_model.save(path)
    loaded = op.Model.load(path)
    a = sum((IMGSZ // s) ** 2 for s in (8, 16, 32))
    assert loaded.outputs == [("output0", op.FLOAT, (1, 17, a))]
    out = np.asarray(make_runner(loaded)(jnp.asarray(x_nchw)))
    assert out.shape == expected.shape
    # pixel-coordinate rows scale with imgsz; gate in absolute pixels /
    # probabilities (the reference's 1e-4 logit gate scaled to px outputs)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=2e-3)


def test_yolo_torch_runner_independent_parity(yolo_export, tmp_path):
    from mtg_card_image_segmentation_tpu.export.onnx_torch_runner import (
        run_model as torch_run,
    )

    onnx_model, x_nchw, expected = yolo_export
    path = str(tmp_path / "yolo.onnx")
    onnx_model.save(path)
    loaded = op.Model.load(path)
    out = torch_run(loaded, {"input": x_nchw})["output0"]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=2e-3)


def test_yolo_export_fp16_parity(yolo_export):
    from mtg_card_image_segmentation_tpu.export.onnx_export import convert_to_fp16
    from mtg_card_image_segmentation_tpu.export.onnx_runtime_mini import run_model

    onnx_model, x_nchw, expected = yolo_export
    m16 = convert_to_fp16(onnx_model, keep_io_types=True)
    out = np.asarray(
        jax.jit(lambda x: run_model(m16, {"input": x})["output0"])(
            jnp.asarray(x_nchw)
        )
    )
    # fp16 gate: score/conf rows within 1e-2 abs; pixel rows within 1 px
    np.testing.assert_allclose(out, expected, rtol=1e-2, atol=1.0)


def test_yolo_optimized_graph_parity(yolo_export):
    """Graph-optimization (export/onnx_optimize.py, run by export_yolo.py)
    preserves the YOLO op set (SiLU, attention matmuls, Resize, Split,
    DFL) bit-exactly through the mini executor."""
    import copy

    from mtg_card_image_segmentation_tpu.export.onnx_optimize import optimize
    from mtg_card_image_segmentation_tpu.export.onnx_runtime_mini import run_model

    onnx_model, x_nchw, expected = yolo_export
    m = copy.deepcopy(onnx_model)
    ref = np.asarray(run_model(m, {"input": x_nchw})["output0"])
    n_before = len(m.nodes)
    optimize(m)
    got = np.asarray(run_model(m, {"input": x_nchw})["output0"])
    np.testing.assert_array_equal(ref, got)
    assert len(m.nodes) <= n_before


def test_yolo_dynamic_batch_parity(yolo_export, tmp_path):
    """ONE dynamic-batch artifact (symbolic batch, batch-aware attention
    reshapes, scales-based PAN upsamples) runs at batch 1 AND 3 through
    both executors and matches the Flax decode (the reference's ultralytics
    export defaults dynamic=True, model.py:266-310)."""
    from mtg_card_image_segmentation_tpu.export import onnx_torch_runner
    from mtg_card_image_segmentation_tpu.export.onnx_runtime_mini import (
        run_model,
    )

    model = YOLO12Pose(fold_bn=False, dtype=jnp.float32)
    variables = jax.jit(
        lambda key: model.init(key, jnp.zeros((1, IMGSZ, IMGSZ, 3)),
                               train=True)
    )(jax.random.key(0))
    _, mutated = model.apply(
        variables,
        jnp.asarray(np.random.default_rng(1).random((2, IMGSZ, IMGSZ, 3)),
                    jnp.float32),
        train=True, mutable=["batch_stats"],
    )
    folded = fold_batch_norm(variables["params"], mutated["batch_stats"])
    dyn = export_yolo_model(folded, imgsz=IMGSZ, dynamic_batch=True)
    path = str(tmp_path / "yolo_dynamic.onnx")
    dyn.save(path)
    loaded = op.Model.load(path)
    assert loaded.inputs[0][2][0] is None
    assert loaded.outputs[0][2][0] is None

    folded_model = YOLO12Pose(fold_bn=True, dtype=jnp.float32)
    rng = np.random.default_rng(5)
    for batch in (1, 3):
        x_nchw = rng.random((batch, 3, IMGSZ, IMGSZ)).astype(np.float32)
        boxes, scores, kpts = jax.jit(
            lambda img: folded_model.apply({"params": folded}, img,
                                           train=False)
        )(jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))))
        b = np.moveaxis(np.asarray(boxes), 1, 2)  # (N, 4, A)
        sc = np.moveaxis(np.asarray(scores), 1, 2)
        kk = np.asarray(kpts)  # (N, A, K, 3)
        kk = np.transpose(kk, (0, 2, 3, 1)).reshape(batch, -1, b.shape[2])
        expected = np.concatenate([b, sc, kk], axis=1)

        mini = np.asarray(run_model(loaded, {"input": x_nchw})["output0"])
        assert mini.shape == expected.shape
        assert np.abs(mini - expected).max() < 2e-3, batch
        torch_out = np.asarray(
            onnx_torch_runner.run_model(loaded, {"input": x_nchw})["output0"]
        )
        assert np.abs(torch_out - expected).max() < 2e-3, batch
