"""Weight pruning on functional param pytrees.

Behavioral spec: train/prune.py — global L1 unstructured pruning over all
conv weights (:68-72), or per-conv structured channel pruning (:76-93),
sparsity statistics + compression ratio (:115-141), fine-tune at 0.1x lr
(:172-239), permanent mask removal (:102-113).

Functional re-design: pruning returns (pruned_params, masks) pytrees; the
fine-tune loop keeps sparsity exact by composing ``masked_optimizer`` into
the optax chain (updates and params are re-masked every step — the
equivalent of torch's forward-pre-hook masks, but with zero runtime cost
after XLA fuses the multiply). "Mask removal" is a no-op here: the params
are literally zero.

Note on TPU performance: unstructured sparsity does NOT speed up dense MXU
matmuls — it is a compression/regularization tool (same as on the
reference's GPU). Structured channel pruning zeroes whole output channels,
which XLA also keeps dense; true speedups come from exporting with channels
physically removed (export pipeline).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def _is_prunable(path: Tuple, leaf) -> bool:
    """Prune conv/dense kernels only (reference prunes Conv2d weights,
    train/prune.py:55-66) — never biases or BN scales."""
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    return names[-1] == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2


def magnitude_prune(
    params: Dict[str, Any], amount: float = 0.3
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Global L1 unstructured pruning: zero the ``amount`` fraction of
    smallest-magnitude weights across ALL prunable kernels (one global
    threshold — torch prune.global_unstructured semantics)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves, treedef = flat
    prunable = [jnp.abs(l.ravel()) for p, l in leaves if _is_prunable(p, l)]
    if not prunable:
        raise ValueError("no prunable kernels found")
    all_mags = jnp.concatenate(prunable)
    threshold = jnp.quantile(all_mags.astype(jnp.float32), amount)

    new_leaves = []
    masks = []
    for path, leaf in leaves:
        if _is_prunable(path, leaf):
            mask = (jnp.abs(leaf) >= threshold).astype(leaf.dtype)
            new_leaves.append(leaf * mask)
            masks.append(mask)
        else:
            new_leaves.append(leaf)
            masks.append(jnp.ones_like(leaf))
    rebuild = jax.tree_util.tree_unflatten(treedef, new_leaves)
    mask_tree = jax.tree_util.tree_unflatten(treedef, masks)
    return rebuild, mask_tree


def structured_channel_prune(
    params: Dict[str, Any], amount: float = 0.3, ord: int = 2
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Per-kernel structured pruning: zero the ``amount`` fraction of output
    channels with the smallest L-``ord`` norm (torch ln_structured(dim=0)
    on OIHW == the last axis of our HWIO kernels)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves, masks = [], []
    for path, leaf in flat:
        if _is_prunable(path, leaf) and leaf.shape[-1] > 1:
            norms = jnp.linalg.norm(
                leaf.reshape(-1, leaf.shape[-1]).astype(jnp.float32), ord=ord, axis=0
            )
            k = int(np.floor(amount * leaf.shape[-1]))
            if k == 0:
                new_leaves.append(leaf)
                masks.append(jnp.ones_like(leaf))
                continue
            # prune exactly the k smallest-norm channels (argsort indices,
            # not a threshold compare — ties at the cut must not over-prune,
            # matching torch ln_structured which removes exactly k)
            pruned_idx = jnp.argsort(norms)[:k]
            ch_mask = (
                jnp.ones_like(norms).at[pruned_idx].set(0.0).astype(leaf.dtype)
            )
            mask = jnp.broadcast_to(ch_mask, leaf.shape)
            new_leaves.append(leaf * mask)
            masks.append(mask)
        else:
            new_leaves.append(leaf)
            masks.append(jnp.ones_like(leaf))
    return (
        jax.tree_util.tree_unflatten(treedef, new_leaves),
        jax.tree_util.tree_unflatten(treedef, masks),
    )


def apply_masks(params: Dict[str, Any], masks: Dict[str, Any]) -> Dict[str, Any]:
    return jax.tree.map(lambda p, m: p * m, params, masks)


def masked_optimizer(
    tx: optax.GradientTransformation, masks: Dict[str, Any]
) -> optax.GradientTransformation:
    """Compose sparsity preservation into an optax chain: gradients are
    masked before the update and params stay exactly zero at masked
    positions (weight decay can't resurrect them)."""

    def init(params):
        return tx.init(params)

    def update(updates, state, params=None):
        updates = jax.tree.map(lambda u, m: u * m, updates, masks)
        updates, state = tx.update(updates, state, params)
        updates = jax.tree.map(lambda u, m: u * m, updates, masks)
        return updates, state

    return optax.GradientTransformation(init, update)


def sparsity_report(params: Dict[str, Any]) -> Dict[str, Any]:
    """Per-layer + global sparsity stats (train/prune.py:115-141)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    layers = {}
    total = 0
    zeros = 0
    for path, leaf in flat:
        if not _is_prunable(path, leaf):
            continue
        name = "/".join(str(getattr(p, "key", getattr(p, "name", ""))) for p in path)
        z = int(np.sum(np.asarray(leaf) == 0))
        n = int(np.prod(leaf.shape))
        layers[name] = {"sparsity": z / n, "params": n}
        total += n
        zeros += z
    return {
        "global_sparsity": zeros / max(total, 1),
        "prunable_params": total,
        "nonzero_params": total - zeros,
        "compression_ratio": total / max(total - zeros, 1),
        "layers": layers,
    }
