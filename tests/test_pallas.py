"""Pallas kernels golden-tested against their XLA reference implementations
(interpret mode on CPU; the same code compiles on TPU — verified in the
bench/serving drive)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.data.preprocess import preprocess_batch
from mtg_card_image_segmentation_tpu.ops.pallas import (
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
