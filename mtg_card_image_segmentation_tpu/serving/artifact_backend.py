"""Deployment-artifact inference backends for the CLIs.

The reference inference CLI runs either the checkpoint or the exported
``.onnx`` with an fp16-session fallback ladder
(train-pose-estimation_custom/inference_test.py:64-139); the browser demo
walks a model ladder int8 -> fp16 -> fp32 on wasm
(demo/src/model-inference.js). This module is the TPU-repo analog: load a
shipped artifact file — or walk the package directory's int8 -> fp16 ->
fp32 ladder — behind one ``fn(x_nchw) -> output`` callable, executed by
the in-repo dependency-free ONNX executor (export/onnx_runtime_mini.py)
or, for ``.stablehlo`` artifacts, by ``jax.export`` deserialization.

Every artifact the export CLIs ship (model/pose/yolo x fp32/fp16/int8/
dynamic ONNX + StableHLO) is smoke-runnable from disk through this path.
"""

from __future__ import annotations

import os
from typing import Callable, List, Tuple

import numpy as np

# package-directory ladders, preferred artifact first (smallest download
# that still clears the export parity gates — mirrors the demo's wasm
# model ladder int8 -> fp16 -> fp32)
ONNX_LADDERS = {
    "seg": ["model_int8.onnx", "model_fp16.onnx", "model.onnx",
            "model_dynamic.onnx"],
    "hrnet": ["pose_int8.onnx", "pose_fp16.onnx", "pose.onnx",
              "pose_dynamic.onnx"],
    "yolo": ["yolo_int8.onnx", "yolo_fp16.onnx", "yolo.onnx",
             "yolo_dynamic.onnx"],
}
STABLEHLO_NAMES = {"seg": "model.stablehlo", "hrnet": "pose.stablehlo",
                   "yolo": "yolo.stablehlo"}


def _onnx_candidates(path: str, family: str) -> List[str]:
    if os.path.isdir(path):
        return [
            os.path.join(path, n)
            for n in ONNX_LADDERS[family]
            if os.path.exists(os.path.join(path, n))
        ]
    return [path]


def load_onnx(path: str, family: str) -> Tuple[Callable, str]:
    """``path`` is an .onnx file or a deployment-package directory.
    Directories walk the family's int8 -> fp16 -> fp32 ladder, falling to
    the next artifact if one fails to load or execute (the reference's
    session fallback ladder, inference_test.py:102-129). Returns
    (runner, chosen_path); runner maps fp32 NCHW numpy -> numpy output."""
    from mtg_card_image_segmentation_tpu.export import onnx_proto as op
    from mtg_card_image_segmentation_tpu.export.onnx_runtime_mini import (
        make_runner,
    )

    candidates = _onnx_candidates(path, family)
    if not candidates:
        raise FileNotFoundError(
            f"no {family} ONNX artifacts in {path} "
            f"(looked for {ONNX_LADDERS[family]})"
        )
    errors = []
    for cand in candidates:
        try:
            model = op.Model.load(cand)
            runner = make_runner(model)
            # probe-execute at the declared input shape (dynamic/symbolic
            # batch -> 1) so artifacts that parse but cannot run — e.g. an
            # op outside the executor's set — also fall down the ladder,
            # like the reference's session-create probe
            shape = tuple(
                1 if not isinstance(d, int) or d <= 0 else d
                for d in model.inputs[0][2]
            )
            runner(np.zeros(shape, np.float32))

            def fn(x, _runner=runner):
                return np.asarray(_runner(np.asarray(x, np.float32)))

            return fn, cand
        except Exception as e:  # fall down the ladder, remember why
            errors.append(f"{os.path.basename(cand)}: {e}")
    raise RuntimeError(
        "every ONNX artifact in the ladder failed: " + "; ".join(errors)
    )


def load_stablehlo(path: str, family: str) -> Tuple[Callable, str]:
    """``path`` is a .stablehlo file or a package directory. Returns
    (runner, chosen_path); runner maps fp32 NCHW numpy -> numpy output."""
    from jax import export as jax_export

    if os.path.isdir(path):
        path = os.path.join(path, STABLEHLO_NAMES[family])
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def fn(x):
        return np.asarray(exported.call(np.asarray(x, np.float32)))

    return fn, path
