"""Segmentation model: shapes, param count (independent closed form),
conv padding parity vs torch, dtype policy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.models import create_model
from mtg_card_image_segmentation_tpu.models.layers import ConvBNAct, hard_sigmoid, hard_swish
from mtg_card_image_segmentation_tpu.models.mobilenetv3 import (
    HIGH_CHANNELS,
    LOW_CHANNELS,
    MobileNetV3Backbone,
    expected_backbone_params,
)
from mtg_card_image_segmentation_tpu.utils import count_parameters


@pytest.fixture(scope="module")
def seg_model_vars():
    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables


def test_backbone_taps_shapes():
    model = MobileNetV3Backbone(dtype=jnp.float32)
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    taps = model.apply(variables, x)
    assert taps["low"].shape == (1, 8, 6, LOW_CHANNELS)  # stride 8
    assert taps["high"].shape == (1, 4, 3, HIGH_CHANNELS)  # stride 16 (dilated)


def test_full_model_output_shape(seg_model_vars):
    model, variables = seg_model_vars
    x = jnp.zeros((2, 64, 48, 3), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 64, 48, 2)
    assert out.dtype == jnp.float32


def test_param_count_matches_closed_form(seg_model_vars):
    _, variables = seg_model_vars
    total = count_parameters(variables["params"])
    # independent closed-form count: backbone + head
    # head: cbr 3x3 960->128 + BN, scale 1x1 960->128 (no bias),
    # low cls 40->2 (bias), high cls 128->2 (bias)
    head = (960 * 128 * 9 + 2 * 128) + 960 * 128 + (40 * 2 + 2) + (128 * 2 + 2)
    expected = expected_backbone_params() + head
    assert total == expected, f"{total} != {expected}"
    # the reference model (custom 3x3 cbr head, train/model.py:110) is ~4.2M
    assert 4.0e6 < total < 4.4e6


def test_conv_padding_matches_torch_stride2():
    """Our explicit torch-style padding must align with torch for stride-2
    convs (where XLA 'SAME' picks a different offset)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 16, 12, 3)).astype(np.float32)
    w = rng.standard_normal((8, 3, 3, 3)).astype(np.float32)  # OIHW

    block = ConvBNAct(8, 3, stride=2, act=None, use_bn=False, dtype=jnp.float32)
    variables = block.init(jax.random.key(0), jnp.asarray(x))
    # inject torch weights (OIHW -> HWIO)
    variables = {"params": {"conv": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}}}
    ours = np.asarray(block.apply(variables, jnp.asarray(x)))

    ref = torch.nn.functional.conv2d(
        torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
        torch.from_numpy(w),
        stride=2,
        padding=1,
    )
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_hard_activations_match_torch():
    torch = pytest.importorskip("torch")
    x = np.linspace(-6, 6, 101).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(hard_swish(jnp.asarray(x))),
        torch.nn.functional.hardswish(torch.from_numpy(x)).numpy(),
        rtol=1e-6, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(hard_sigmoid(jnp.asarray(x))),
        torch.nn.functional.hardsigmoid(torch.from_numpy(x)).numpy(),
        rtol=1e-6, atol=1e-6,
    )


def test_bf16_compute_fp32_params():
    model = create_model("lraspp_mobilenet_v3_large")  # bf16 compute default
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    for leaf in jax.tree.leaves(variables["params"]):
        assert leaf.dtype == jnp.float32
    out = model.apply(variables, x, train=False)
    assert out.dtype == jnp.float32  # logits promoted for the loss


def test_train_mode_updates_batch_stats(seg_model_vars):
    model, variables = seg_model_vars
    x = jnp.ones((2, 64, 48, 3), jnp.float32)
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    changed = any(not np.allclose(b, a) for b, a in zip(before, after))
    assert changed


def test_registry_unknown_model():
    with pytest.raises(KeyError):
        create_model("resnet9000")
