"""BN folding: folded fold_bn=True model must match the eval-mode original."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.export import fold_batch_norm
from mtg_card_image_segmentation_tpu.models import create_model


@pytest.mark.slow
def test_folded_model_matches_original():
    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    folded_model = create_model(
        "lraspp_mobilenet_v3_large", compute_dtype="float32", fold_bn=True
    )
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 48, 3)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x, train=False)
    # push running stats away from init so folding is non-trivial
    _, mutated = model.apply(variables, x * 2.0 + 0.3, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}

    ref = model.apply(variables, x, train=False)
    folded_params = fold_batch_norm(variables["params"], variables["batch_stats"])
    # folded model has no batch_stats collection
    out = folded_model.apply({"params": folded_params}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_folded_param_structure():
    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    folded_model = create_model(
        "lraspp_mobilenet_v3_large", compute_dtype="float32", fold_bn=True
    )
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    folded_params = fold_batch_norm(variables["params"], variables["batch_stats"])
    expected = folded_model.init(jax.random.key(0), x, train=False)
    # same tree structure as a natively-initialized folded model
    a = jax.tree.structure(folded_params)
    b = jax.tree.structure(expected["params"])
    assert a == b, f"\n{a}\n!=\n{b}"
    assert "batch_stats" not in expected
