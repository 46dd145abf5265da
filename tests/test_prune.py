"""Pruning: global threshold semantics, structured channels, masked
optimizer sparsity preservation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mtg_card_image_segmentation_tpu.compression import (
    apply_masks,
    magnitude_prune,
    masked_optimizer,
    sparsity_report,
    structured_channel_prune,
)


def _toy_params():
    rng = np.random.default_rng(0)
    return {
        "block": {
            "conv": {"kernel": jnp.asarray(rng.standard_normal((3, 3, 8, 16)), jnp.float32)},
            "bn": {"scale": jnp.ones((16,)), "bias": jnp.zeros((16,))},
        },
        "head": {
            "conv": {
                "kernel": jnp.asarray(rng.standard_normal((1, 1, 16, 4)), jnp.float32),
                "bias": jnp.asarray(rng.standard_normal((4,)), jnp.float32),
            }
        },
    }


def test_magnitude_prune_global_threshold():
    params = _toy_params()
    pruned, masks = magnitude_prune(params, amount=0.3)
    rep = sparsity_report(pruned)
    assert abs(rep["global_sparsity"] - 0.3) < 0.02
    # global: per-layer sparsities differ but the kept weights are the
    # globally largest — verify one threshold across layers
    k1 = np.asarray(pruned["block"]["conv"]["kernel"])
    k2 = np.asarray(pruned["head"]["conv"]["kernel"])
    kept_min = min(
        np.abs(k1[k1 != 0]).min(initial=np.inf), np.abs(k2[k2 != 0]).min(initial=np.inf)
    )
    orig1 = np.asarray(params["block"]["conv"]["kernel"])
    dropped_max = np.abs(orig1[np.asarray(masks["block"]["conv"]["kernel"]) == 0]).max()
    assert dropped_max <= kept_min + 1e-6
    # BN / bias untouched
    np.testing.assert_array_equal(
        np.asarray(pruned["block"]["bn"]["scale"]), np.ones((16,))
    )
    np.testing.assert_array_equal(
        np.asarray(pruned["head"]["conv"]["bias"]),
        np.asarray(params["head"]["conv"]["bias"]),
    )


def test_structured_prune_zeroes_whole_channels():
    params = _toy_params()
    pruned, masks = structured_channel_prune(params, amount=0.25)
    k = np.asarray(pruned["block"]["conv"]["kernel"])  # (3,3,8,16)
    ch_zero = (k == 0).all(axis=(0, 1, 2))
    assert ch_zero.sum() == 4  # 25% of 16
    # zeroed channels are the smallest-norm ones
    orig = np.asarray(params["block"]["conv"]["kernel"])
    norms = np.linalg.norm(orig.reshape(-1, 16), axis=0)
    assert set(np.where(ch_zero)[0]) == set(np.argsort(norms)[:4])


def test_masked_optimizer_preserves_sparsity():
    params = _toy_params()
    pruned, masks = magnitude_prune(params, amount=0.5)
    tx = masked_optimizer(optax.adamw(1e-2, weight_decay=1e-2), masks)
    opt_state = tx.init(pruned)

    def loss_fn(p):
        return sum(jnp.sum(x**2) * 0.5 + jnp.sum(x) for x in jax.tree.leaves(p))

    p = pruned
    for _ in range(5):
        grads = jax.grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
    rep = sparsity_report(p)
    assert rep["global_sparsity"] >= 0.49  # zeros stayed zero through adamw+wd
    # and non-masked weights actually moved
    moved = np.abs(
        np.asarray(p["head"]["conv"]["kernel"]) - np.asarray(pruned["head"]["conv"]["kernel"])
    ).max()
    assert moved > 1e-4


def test_pruned_model_still_runs():
    from mtg_card_image_segmentation_tpu.models import create_model

    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    pruned, _ = magnitude_prune(variables["params"], 0.3)
    rep = sparsity_report(pruned)
    assert abs(rep["global_sparsity"] - 0.3) < 0.01
    # reference claim: ~30% prune -> ~2.2M of 3.2M params left; ours: 4.2M
    # prunable conv weights -> ~70% remain
    out = model.apply(
        {"params": pruned, "batch_stats": variables["batch_stats"]}, x, train=False
    )
    assert out.shape == (1, 32, 32, 2)
    assert bool(jnp.isfinite(out).all())
