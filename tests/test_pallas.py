"""Pallas kernels golden-tested against their XLA reference implementations
(interpret mode on CPU; the same code compiles on TPU — verified in the
bench/serving drive)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.data.preprocess import preprocess_batch
from mtg_card_image_segmentation_tpu.ops.pallas import (
    fused_stem,
    fused_head_decode,
    fused_mask_decode,
    fused_normalize,
    upsample2x_add,
)
from mtg_card_image_segmentation_tpu.ops.resize import bilinear_resize, upsample_add


def test_fused_normalize_matches_reference():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, 40, 30, 3), dtype=np.uint8)
    ours = np.asarray(fused_normalize(jnp.asarray(img), interpret=True))
    ref = np.asarray(
        preprocess_batch(jnp.asarray(img), None, 40, 30, normalize=True)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_fused_normalize_bf16_output():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (1, 8, 16, 3), dtype=np.uint8)
    out = fused_normalize(jnp.asarray(img), out_dtype=jnp.bfloat16, interpret=True)
    assert out.dtype == jnp.bfloat16


def test_upsample2x_add_matches_reference():
    rng = np.random.default_rng(2)
    high = rng.standard_normal((2, 20, 15, 128)).astype(np.float32)
    low = rng.standard_normal((2, 40, 30, 128)).astype(np.float32)
    ours = np.asarray(upsample2x_add(jnp.asarray(high), jnp.asarray(low), interpret=True))
    ref = np.asarray(upsample_add(jnp.asarray(high), jnp.asarray(low)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_fused_mask_decode_matches_argmax_pipeline():
    rng = np.random.default_rng(3)
    logits = rng.standard_normal((2, 40, 30, 2)).astype(np.float32)
    scores = jnp.asarray(logits[..., 1] - logits[..., 0])
    ours = np.asarray(fused_mask_decode(scores, 320, 240, interpret=True))
    full = bilinear_resize(jnp.asarray(logits), 320, 240)
    ref = np.asarray(jnp.argmax(full, axis=-1)).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_fused_mask_decode_odd_sizes():
    rng = np.random.default_rng(4)
    logits = rng.standard_normal((1, 13, 9, 2)).astype(np.float32)
    scores = jnp.asarray(logits[..., 1] - logits[..., 0])
    ours = np.asarray(fused_mask_decode(scores, 100, 75, interpret=True))
    full = bilinear_resize(jnp.asarray(logits), 100, 75)
    ref = np.asarray(jnp.argmax(full, axis=-1)).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_fused_head_decode_matches_composed_pipeline():
    """fused_head_decode == gated-matvec + 2x upsample + low-matvec + bias,
    then argmax(bilinear_resize(logits)) — composed from independent XLA
    pieces (ops.resize is torch-verified)."""
    rng = np.random.default_rng(5)
    b, h16, w16, c, cl = 2, 10, 8, 24, 12
    h8, w8 = 2 * h16, 2 * w16
    x = jnp.asarray(rng.standard_normal((b, h16, w16, c)), jnp.float32)
    gw = jnp.asarray(rng.standard_normal((b, c)), jnp.float32)
    low = jnp.asarray(rng.standard_normal((b, h8, w8, cl)), jnp.float32)
    w_lo = jnp.asarray(rng.standard_normal(cl), jnp.float32)
    bias = jnp.float32(0.17)

    ours = np.asarray(
        fused_head_decode(x, gw, low, w_lo, bias, 160, 128, interpret=True)
    )

    hs = jnp.einsum("bhwc,bc->bhw", x, gw)
    hs = bilinear_resize(hs[..., None], h8, w8)[..., 0]
    score = hs + jnp.einsum("bhwc,c->bhw", low, w_lo) + bias
    full = bilinear_resize(score[..., None], 160, 128)[..., 0]
    ref = (np.asarray(full) > 0).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def _xla_stem(imgs_u8, kernel, bias, center, dtype=jnp.float32):
    """Reference: centered conv3x3 stride-2 SAME + bias + hardswish."""
    x = imgs_u8.astype(jnp.float32) - center
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), jnp.asarray(kernel, dtype),
        window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(bias, dtype)
    yf = y.astype(jnp.float32)
    return yf * (jnp.clip(yf + 3.0, 0.0, 6.0) / 6.0)


@pytest.mark.parametrize("fold_d2s", [False, True])
@pytest.mark.parametrize("hw", [(64, 64), (40, 24)])
def test_fused_stem_matches_conv(hw, fold_d2s):
    """Space-to-depth stem kernel == conv3x3s2(u8 - center) + hardswish
    (serving stem with BN + ImageNet normalization folded in,
    serving/predictor.py). fold_d2s exercises the in-kernel
    depth-to-space variant (interpret-only today — see stem.py STATUS)."""
    h, w = hw
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (3, h, w, 3), dtype=np.uint8)
    kernel = (rng.standard_normal((3, 3, 3, 16)) * 0.1).astype(np.float32)
    bias = (rng.standard_normal((16,)) * 0.1).astype(np.float32)
    center = (255.0 * np.array([0.485, 0.456, 0.406])).astype(np.float32)
    ours = np.asarray(
        fused_stem(jnp.asarray(imgs), jnp.asarray(kernel), jnp.asarray(bias),
                   jnp.asarray(center), out_dtype=jnp.float32, interpret=True,
                   fold_d2s=fold_d2s),
        np.float32,
    )
    ref = np.asarray(
        _xla_stem(jnp.asarray(imgs), kernel, bias, jnp.asarray(center),
                  dtype=jnp.bfloat16),
        np.float32,
    )
    assert ours.shape == ref.shape == (3, h // 2, w // 2, 16)
    # both sides compute in bf16 but the kernel centers in bf16 (double
    # rounding) and accumulates in a different order: allow one bf16 ulp
    # at the activation magnitude (~160 -> ulp 1.0). A placement bug would
    # blow up the mean, not the tail.
    np.testing.assert_allclose(ours, ref, rtol=0.02, atol=1.0)
    assert float(np.abs(ours - ref).mean()) < 0.1


def test_fused_stem_batch_split_invariance():
    """images_per_step grid tiling must not change the result."""
    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    kernel = (rng.standard_normal((3, 3, 3, 16)) * 0.1).astype(np.float32)
    bias = np.zeros((16,), np.float32)
    center = np.full((3,), 120.0, np.float32)
    outs = [
        np.asarray(
            fused_stem(jnp.asarray(imgs), jnp.asarray(kernel),
                       jnp.asarray(bias), jnp.asarray(center),
                       out_dtype=jnp.float32, images_per_step=bt,
                       interpret=True)
        )
        for bt in (1, 2, 4)
    ]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])
