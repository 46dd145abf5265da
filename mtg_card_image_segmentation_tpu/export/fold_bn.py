"""BatchNorm folding: trained (params, batch_stats) -> inference params for
the same architecture built with ``fold_bn=True``.

For every ConvBNAct module subtree {"conv": {kernel[, bias]}, "bn": {scale,
bias}} with running stats {"bn": {mean, var}}:

    g = scale / sqrt(var + eps)            (per output channel)
    kernel' = kernel * g                    (broadcast over HWIO -> O)
    bias'   = bn_bias - mean * g  [+ conv_bias * g]

The folded model then runs conv-with-bias only — no normalization layers,
no fp32 round-trips, ~one fused op per block. This is both the inference
fast path (bench/serving) and the export path's canonical form (an ONNX
graph without BatchNormalization nodes).

eps matches the models' BatchNorm epsilon (1e-3, torchvision MobileNetV3).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-3


def _fold_one(conv: Dict[str, Any], bn_params: Dict[str, Any], bn_stats: Dict[str, Any]):
    g = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + BN_EPS)
    kernel = conv["kernel"] * g  # HWIO * (O,)
    bias = bn_params["bias"] - bn_stats["mean"] * g
    if "bias" in conv:
        bias = bias + conv["bias"] * g
    return {"kernel": kernel, "bias": bias}


def fold_batch_norm(params: Dict[str, Any], batch_stats: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively fold every sibling (conv, bn) pair. Returns a new params
    tree compatible with the ``fold_bn=True`` model (bn subtrees removed,
    conv gains a bias). Deconv pairs (``deconvN`` + ``deconv_bnN``, pose
    head) are folded the same way."""

    def rec(p: Any, s: Any) -> Any:
        if not isinstance(p, dict):
            return p
        out: Dict[str, Any] = {}
        handled = set()
        if "conv" in p and "bn" in p and isinstance(p.get("bn"), dict):
            out["conv"] = _fold_one(p["conv"], p["bn"], (s or {}).get("bn", {}))
            handled |= {"conv", "bn"}
        for key in p:
            if key in handled:
                continue
            if key.startswith("deconv_bn"):
                continue  # consumed below with its deconv
            if key.startswith("deconv") and f"deconv_bn{key[len('deconv'):]}" in p:
                bn_key = f"deconv_bn{key[len('deconv'):]}"
                out[key] = _fold_one(p[key], p[bn_key], (s or {}).get(bn_key, {}))
                handled.add(bn_key)
                continue
            out[key] = rec(p[key], (s or {}).get(key) if isinstance(s, dict) else None)
        return out

    return rec(params, batch_stats)
