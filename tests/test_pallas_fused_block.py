"""Fused inverted-residual kernel vs the Flax module (folded), interpret
mode on CPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.export import fold_batch_norm
from mtg_card_image_segmentation_tpu.models.layers import InvertedResidual
from mtg_card_image_segmentation_tpu.ops.pallas.fused_block import (
    fused_inverted_residual,
)


def _folded_block(cin, exp, cout, k, stride, se, act, seed=0, h=16, w=16):
    module = InvertedResidual(
        expanded=exp, out_features=cout, kernel=k, stride=stride,
        use_se=se, act=act, dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal((2, h, w, cin)), jnp.float32
    )
    variables = module.init(jax.random.key(seed), x, train=False)
    # move BN stats off init
    _, mutated = module.apply(variables, x * 1.5 + 0.2, train=True, mutable=["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
    folded_module = InvertedResidual(
        expanded=exp, out_features=cout, kernel=k, stride=stride,
        use_se=se, act=act, dtype=jnp.float32, fold_bn=True,
    )
    folded = fold_batch_norm(variables["params"], variables["batch_stats"])
    ref = folded_module.apply({"params": folded}, x, train=False)
    return x, folded, np.asarray(ref)


@pytest.mark.parametrize(
    "cin,exp,cout,k,stride,se,act,residual",
    [
        (16, 16, 16, 3, 1, False, "relu", True),    # block0 (no expand, residual)
        (16, 64, 24, 3, 2, False, "relu", False),   # block1 (stride 2)
        (24, 72, 24, 3, 1, False, "relu", True),    # block2
        (24, 72, 40, 5, 2, True, "relu", False),    # block3 (k=5, SE, stride 2)
        (40, 120, 40, 5, 1, True, "relu", True),    # block4
        (80, 184, 80, 3, 1, False, "hardswish", True),  # hardswish block
    ],
)
def test_fused_block_matches_module(cin, exp, cout, k, stride, se, act, residual):
    x, folded, ref = _folded_block(cin, exp, cout, k, stride, se, act)
    out = np.asarray(
        fused_inverted_residual(
            x, folded, kernel_size=k, stride=stride, act=act,
            residual=residual, interpret=True,
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)  # bf16 expanded path


@pytest.mark.parametrize("stencil", ["concat", "scratch"])
def test_fused_block_stencil_modes_agree(stencil):
    """Both stencil implementations (shift/concat materialization vs the
    zero-padded bf16 scratch with static-slice taps) must match the Flax
    module on a stride-1 SE block."""
    x, folded, ref = _folded_block(40, 120, 40, 5, 1, True, "relu")
    out = np.asarray(
        fused_inverted_residual(
            x, folded, kernel_size=5, stride=1, act="relu",
            residual=True, interpret=True, stencil=stencil,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def _folded_dilated_block(cin, exp, cout, k, se, act, dilation, seed=0,
                          h=16, w=16):
    """Folded dilated tail block (the serving FUSED_BLOCKS shape class:
    stride-1, dilation-2 k=5 SE hardswish)."""
    module = InvertedResidual(
        expanded=exp, out_features=cout, kernel=k, stride=1,
        dilation=dilation, use_se=se, act=act, dtype=jnp.float32,
    )
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal((2, h, w, cin)),
        jnp.float32,
    )
    variables = module.init(jax.random.key(seed), x, train=False)
    _, mutated = module.apply(
        variables, x * 1.5 + 0.2, train=True, mutable=["batch_stats"]
    )
    folded = fold_batch_norm(variables["params"], mutated["batch_stats"])
    folded_module = InvertedResidual(
        expanded=exp, out_features=cout, kernel=k, stride=1,
        dilation=dilation, use_se=se, act=act, dtype=jnp.float32,
        fold_bn=True,
    )
    ref = folded_module.apply({"params": folded}, x, train=False)
    return x, folded, np.asarray(ref)


@pytest.mark.parametrize("stencil", ["concat", "scratch"])
def test_fused_block_dilated_tail(stencil):
    """The dilation-2 k=5 tail shape (serving FUSED_BLOCKS 12-14) through
    both stencils. At dilation 2 every scratch slice offset is even —
    the sublane-packing-aligned case the scratch path is built for."""
    x, folded, ref = _folded_dilated_block(
        24, 72, 24, 5, True, "hardswish", dilation=2
    )
    out = np.asarray(
        fused_inverted_residual(
            x, folded, kernel_size=5, stride=1, act="hardswish",
            residual=True, dilation=2, interpret=True, stencil=stencil,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_fused_tail_chain_matches_sequential_blocks():
    """The 3-block chained megakernel == the three Flax tail blocks run in
    sequence (block12: 112->160 no residual; 13/14: 160->160 residual),
    dilation 2, k=5, SE, hardswish — the serving FUSED_BLOCKS chain."""
    from mtg_card_image_segmentation_tpu.ops.pallas.fused_block import (
        fused_tail_chain,
    )

    rng = np.random.default_rng(0)
    h = w = 16
    # narrow stand-ins for (112,672,160) / (160,960,160): same topology
    specs = [(24, 64, 40), (40, 96, 40), (40, 96, 40)]
    x = jnp.asarray(rng.standard_normal((2, h, w, specs[0][0])), jnp.float32)
    params_list, ref = [], x
    for si, (cin, exp, cout) in enumerate(specs):
        module = InvertedResidual(
            expanded=exp, out_features=cout, kernel=5, stride=1, dilation=2,
            use_se=True, act="hardswish", dtype=jnp.float32,
        )
        variables = module.init(jax.random.key(si), ref, train=False)
        _, mutated = module.apply(
            variables, ref * 1.2 + 0.1, train=True, mutable=["batch_stats"]
        )
        folded = fold_batch_norm(variables["params"], mutated["batch_stats"])
        folded_module = InvertedResidual(
            expanded=exp, out_features=cout, kernel=5, stride=1, dilation=2,
            use_se=True, act="hardswish", dtype=jnp.float32, fold_bn=True,
        )
        ref = folded_module.apply({"params": folded}, ref, train=False)
        params_list.append(folded)

    out = np.asarray(
        fused_tail_chain(
            x, tuple(params_list), kernel_size=5, act="hardswish",
            dilation=2, interpret=True,
        )
    )
    np.testing.assert_allclose(out, np.asarray(ref), rtol=0.06, atol=0.06)
