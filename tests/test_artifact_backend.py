"""Deployment-artifact backends behind the inference CLIs: directory
ladder walk (int8 -> fp16 -> fp32) with fallback on broken artifacts, file
execution, and StableHLO deserialization — the dual-backend contract the
reference's inference_test.py:64-139 provides via onnxruntime sessions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.export import fold_batch_norm
from mtg_card_image_segmentation_tpu.export.onnx_export import (
    convert_to_fp16,
    export_seg_model,
)
from mtg_card_image_segmentation_tpu.models import create_model
from mtg_card_image_segmentation_tpu.serving import artifact_backend


@pytest.fixture(scope="module")
def seg_package(tmp_path_factory):
    """A deployment-package directory with the seg ladder file names."""
    h, w = 64, 48
    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, h, w, 3)), train=False)
    )(jax.random.key(0))
    folded = fold_batch_norm(variables["params"], variables["batch_stats"])
    onnx_model = export_seg_model(folded, input_hw=(h, w))
    d = tmp_path_factory.mktemp("seg_pkg")
    onnx_model.save(str(d / "model.onnx"))
    convert_to_fp16(onnx_model).save(str(d / "model_fp16.onnx"))
    return model, variables, d, (h, w)


def test_ladder_prefers_first_artifact(seg_package):
    model, variables, d, (h, w) = seg_package
    fn, chosen = artifact_backend.load_onnx(str(d), "seg")
    assert chosen.endswith("model_fp16.onnx")  # int8 absent -> fp16 first
    x = np.random.default_rng(0).random((1, 3, h, w)).astype(np.float32)
    out = fn(x)
    ref = model.apply(
        variables, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)), train=False
    )
    ref = np.transpose(np.asarray(ref), (0, 3, 1, 2))
    assert np.all(np.abs(out - ref) <= 1e-3 + 1e-2 * np.abs(ref))


def test_ladder_falls_past_broken_artifact(seg_package):
    model, variables, d, (h, w) = seg_package
    # a corrupt int8 artifact at the head of the ladder must be skipped
    (d / "model_int8.onnx").write_bytes(b"not a protobuf")
    try:
        fn, chosen = artifact_backend.load_onnx(str(d), "seg")
    finally:
        (d / "model_int8.onnx").unlink()
    assert chosen.endswith("model_fp16.onnx")
    x = np.zeros((1, 3, h, w), np.float32)
    assert fn(x).shape == (1, 2, h, w)


def test_single_file_path(seg_package):
    _, _, d, (h, w) = seg_package
    fn, chosen = artifact_backend.load_onnx(str(d / "model.onnx"), "seg")
    assert chosen.endswith("model.onnx")
    assert fn(np.zeros((1, 3, h, w), np.float32)).shape == (1, 2, h, w)


def test_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        artifact_backend.load_onnx(str(tmp_path), "seg")


def test_stablehlo_backend(tmp_path):
    from mtg_card_image_segmentation_tpu.export.stablehlo import export_stablehlo

    def f(x):
        return jnp.tanh(x) * 2.0

    path = str(tmp_path / "model.stablehlo")
    export_stablehlo(f, (jnp.zeros((1, 3, 8, 8), jnp.float32),), path)
    fn, chosen = artifact_backend.load_stablehlo(str(tmp_path), "seg")
    assert chosen == path
    x = np.random.default_rng(1).standard_normal((1, 3, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(fn(x), np.tanh(x) * 2.0, atol=1e-6)
