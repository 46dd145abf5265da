"""Augmentation policies / TTA + StableHLO export."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.data.aug_policies import (
    DEFAULT_WEIGHTS,
    POLICIES,
    choose_policy,
    progressive_config,
    progressive_policy,
    tta_batch,
    tta_merge_masks,
)


def test_policies_exist_and_ordered_by_intensity():
    assert set(POLICIES) == {"none", "light", "medium", "heavy", "geometric", "color"}
    assert POLICIES["light"].rotate_limit_deg < POLICIES["medium"].rotate_limit_deg
    assert POLICIES["medium"].rotate_limit_deg < POLICIES["heavy"].rotate_limit_deg
    assert POLICIES["color"].affine_prob == 0.0
    assert POLICIES["geometric"].color_jitter_prob == 0.0


def test_choose_policy_respects_weights():
    rng = np.random.default_rng(0)
    picks = [choose_policy(rng) for _ in range(500)]
    counts = {k: picks.count(k) / 500 for k in DEFAULT_WEIGHTS}
    assert abs(counts["medium"] - 0.4) < 0.1
    assert abs(counts["light"] - 0.3) < 0.1


def test_progressive_schedule():
    assert progressive_policy(0, 100) == "light"
    assert progressive_policy(50, 100) == "medium"
    assert progressive_policy(90, 100) == "heavy"
    cfg_early = progressive_config(5, 100)
    cfg_late = progressive_config(95, 100)
    assert cfg_early.rotate_limit_deg < cfg_late.rotate_limit_deg


def test_tta_roundtrip():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (2, 16, 12, 3)), jnp.float32)
    transformed = tta_batch(images)
    assert set(transformed) == {
        "identity", "hflip", "brightness_up", "brightness_down", "contrast_up", "blur",
    }
    np.testing.assert_array_equal(
        np.asarray(transformed["hflip"]), np.asarray(images)[:, :, ::-1]
    )
    # identical per-transform logits merge to the identity logits
    logits = {name: images for name in transformed}
    logits["hflip"] = images[:, :, ::-1]
    merged = tta_merge_masks(logits)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(images), atol=1e-6)


@pytest.mark.slow
def test_stablehlo_export_roundtrip(tmp_path):
    from mtg_card_image_segmentation_tpu.export.stablehlo import export_stablehlo
    from mtg_card_image_segmentation_tpu.models import create_model

    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x, train=False))(jax.random.key(0))

    def fwd(images):
        return model.apply(variables, images, train=False)

    path = str(tmp_path / "seg.stablehlo")
    info = export_stablehlo(fwd, (x,), path)
    assert info["self_test_pass"]
    assert info["bytes"] > 1_000_000  # weights embedded
    assert (tmp_path / "seg.stablehlo.json").is_file()
