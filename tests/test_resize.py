"""Golden tests: our resize ops vs torch F.interpolate (the reference's
decoder op, train/model.py:140) on CPU."""

import numpy as np
import pytest

import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.ops import (
    bilinear_resize,
    nearest_resize,
    upsample_add,
)

torch = pytest.importorskip("torch")


def _torch_resize(x_nhwc, out_h, out_w, mode):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    y = torch.nn.functional.interpolate(
        t,
        size=(out_h, out_w),
        mode=mode,
        align_corners=False if mode == "bilinear" else None,
    )
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((20, 15), (40, 30)),  # LR-ASPP stride16 -> stride8 upsample
        ((40, 30), (320, 240)),  # head -> input-size upsample
        ((17, 13), (33, 29)),  # non-integer ratios
        ((33, 29), (17, 13)),  # downscale (no antialias)
        ((8, 8), (8, 8)),  # identity
    ],
)
def test_bilinear_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *in_hw, 3), dtype=np.float32)
    ours = np.asarray(bilinear_resize(jnp.asarray(x), *out_hw))
    ref = _torch_resize(x, *out_hw, mode="bilinear")
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((10, 10), (20, 20)), ((7, 9), (14, 18))])
def test_nearest_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, *in_hw, 4), dtype=np.float32)
    ours = np.asarray(nearest_resize(jnp.asarray(x), *out_hw))
    ref = _torch_resize(x, *out_hw, mode="nearest")
    np.testing.assert_array_equal(ours, ref)


def test_upsample_add():
    rng = np.random.default_rng(2)
    high = rng.standard_normal((1, 20, 15, 2), dtype=np.float32)
    low = rng.standard_normal((1, 40, 30, 2), dtype=np.float32)
    out = np.asarray(upsample_add(jnp.asarray(high), jnp.asarray(low)))
    ref = _torch_resize(high, 40, 30, mode="bilinear") + low
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_hwc_rank3_input():
    x = np.arange(4 * 6 * 1, dtype=np.float32).reshape(4, 6, 1)
    out = np.asarray(bilinear_resize(jnp.asarray(x), 8, 12))
    assert out.shape == (8, 12, 1)
