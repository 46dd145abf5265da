"""Fused TPU serving path for the HRNet corner-pose model.

The pose analog of :class:`~...serving.predictor.SegPredictor` (the
reference's deployment flow is inference_test.py: preprocess -> model ->
peak extraction -> scale-to-original): ONE jitted program taking uint8
camera frames and returning pixel corner coordinates + confidences —
uint8 -> fused Pallas normalize (bf16) -> HRNet -> heatmap decode with
quadratic sub-pixel refinement -> input-pixel scaling. No host
round-trips between stages; BN runs in inference mode (its affine
constant-folds into the surrounding convs at compile time).

The decode (ops/heatmap.py decode_argmax_subpixel, = PoseEvaluator's
reported numbers) removes the ~2 px argmax quantization floor with a
per-axis quadratic peak fit. The reference's plain integer argmax
(inference_test.py:221-255) is available with ``refine=False``.
(A joint-NMS decode like the YOLO family's was measured WORSE here —
see ops/heatmap.py decode_joint_nms's STATUS note.)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.models import create_model
from mtg_card_image_segmentation_tpu.ops import heatmap as hm_lib
from mtg_card_image_segmentation_tpu.ops.pallas import fused_normalize

__all__ = ["PosePredictor", "YoloCornerPredictor"]


class PosePredictor:
    """predict(uint8 images) -> (corners_px (B, 4, 2), conf (B, 4)), one
    jitted program end to end."""

    def __init__(
        self,
        params,
        batch_stats,
        height: int,
        width: int,
        heatmap_hw: Tuple[int, int] = (120, 160),
        num_keypoints: int = 4,
        dtype=jnp.bfloat16,
        refine: bool = True,
        threshold: float = 0.3,
        use_pallas: bool = True,
        mesh=None,
        auto_layout: bool = True,
    ) -> None:
        model = create_model(
            "hrnet_pose", num_keypoints=num_keypoints,
            heatmap_height=heatmap_hw[0], heatmap_width=heatmap_hw[1],
            compute_dtype="bfloat16" if dtype == jnp.bfloat16 else "float32",
        )
        self._params = jax.tree.map(jnp.asarray, params)
        self._stats = jax.tree.map(jnp.asarray, batch_stats)
        self.height, self.width = height, width
        self.threshold = threshold

        def predict(params, stats, images_u8):
            if use_pallas:
                x = fused_normalize(images_u8, out_dtype=dtype)
            else:  # XLA path (CPU tests / non-TPU backends)
                from mtg_card_image_segmentation_tpu.data.preprocess import (
                    normalize_only,
                )

                x = normalize_only(
                    images_u8.astype(jnp.float32) / 255.0
                ).astype(dtype)
            heatmaps = model.apply(
                {"params": params, "batch_stats": stats}, x, train=False
            )
            # refine=True: quadratic sub-pixel fit with plausibility-gated
            # joint-NMS fallback (corner-identity repair);
            # False: reference integer argmax
            if refine:
                coords01, conf = hm_lib.decode_argmax_subpixel_gated(heatmaps)
            else:
                coords01, conf = hm_lib.decode_argmax(heatmaps)
            px = hm_lib.coords01_to_pixels(coords01, (height, width))
            return px, conf.astype(jnp.float32)

        # multi-chip: batch-sharded over the mesh's 'data' axis (see
        # predictor.maybe_shard_predict)
        from mtg_card_image_segmentation_tpu.serving.predictor import (
            _AutoLayoutExec,
            maybe_shard_predict,
        )

        self._predict = maybe_shard_predict(
            predict, mesh, n_param_args=2, n_outputs=2
        )
        # AUTO-layout input/param staging (predictor._AutoLayoutExec):
        # kills the graph-entry relayout copy on single-device serving
        self._auto = (
            _AutoLayoutExec(predict, (self._params, self._stats))
            if auto_layout and (mesh is None or mesh.devices.size <= 1)
            else None
        )

    @classmethod
    def from_checkpoint(
        cls, checkpoint_dir: str, name: str, height: int, width: int, **kw
    ) -> "PosePredictor":
        # template-free params read: no model.init compile, no optimizer
        # state (serving needs neither; on the remote-compile relay the
        # throwaway train state costs minutes of startup)
        from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

        params, batch_stats, _ = ckpt_lib.load_params(checkpoint_dir, name)
        return cls(params, batch_stats, height, width, **kw)

    def predict(self, images_u8):
        """(B, H, W, 3) uint8 -> ((B, 4, 2) float32 xy input pixels,
        (B, 4) float32 peak confidences)."""
        if self._auto is not None:
            out = self._auto(images_u8)
            if out is not None:
                return out
        return self._predict(self._params, self._stats, jnp.asarray(images_u8))

    def predict_valid(self, images_u8):
        """Like predict, plus the validity mask conf >= threshold
        (inference_test.py peak-threshold semantics)."""
        px, conf = self.predict(images_u8)
        return px, conf, conf >= self.threshold

    def scale_to_original(self, px, original_hw):
        """Map (..., 2) xy coords from model-input pixels to an
        ``original_hw`` frame the input was stretch-resized from. The HRNet
        chain is align-corners end to end (heatmap targets, decode,
        coords01_to_pixels all use the size-1 convention), so the inverse
        map is the (size-1) ratio."""
        import numpy as np

        oh, ow = original_hw
        return px * np.asarray(
            [(ow - 1) / (self.width - 1), (oh - 1) / (self.height - 1)],
            dtype=np.float32,
        )


class YoloCornerPredictor:
    """YOLO-family corner serving path — same ``predict``/``predict_valid``
    interface as :class:`PosePredictor`, so the demo server's /api/corners
    endpoint serves either family.

    ONE jitted program (the reference's deployment flow is
    ``model.predict(max_det=1)`` + keypoint extraction,
    *_yolo12n/model.py:215-264 / evaluate_model.py:74-133): uint8 frames ->
    /255 (ultralytics preprocessing — no ImageNet normalization) -> YOLO12
    forward + in-graph anchor decode -> joint corner assignment over 3
    greedy-NMS peaks per channel with collision penalty + canonical
    reordering (models/yolo12_pose.py top1_detection) -> per-corner pixel
    xy + confidence.
    """

    def __init__(
        self,
        params,
        batch_stats,
        imgsz: int = 640,
        dtype=jnp.bfloat16,
        threshold: float = 0.25,
        mesh=None,
        auto_layout: bool = True,
    ) -> None:
        from mtg_card_image_segmentation_tpu.models.yolo12_pose import (
            top1_detection,
        )

        model = create_model(
            "yolo12n_pose",
            compute_dtype="bfloat16" if dtype == jnp.bfloat16 else "float32",
        )
        self._params = jax.tree.map(jnp.asarray, params)
        self._stats = jax.tree.map(jnp.asarray, batch_stats)
        self.height = self.width = imgsz
        self.threshold = threshold

        def predict(params, stats, images_u8):
            x = images_u8.astype(dtype) * (1.0 / 255.0)
            boxes, scores, kpts = model.apply(
                {"params": params, "batch_stats": stats}, x, train=False
            )
            _, _, kp = top1_detection(boxes, scores, kpts)
            return kp[..., :2].astype(jnp.float32), kp[..., 2].astype(jnp.float32)

        from mtg_card_image_segmentation_tpu.serving.predictor import (
            _AutoLayoutExec,
            maybe_shard_predict,
        )

        self._predict = maybe_shard_predict(
            predict, mesh, n_param_args=2, n_outputs=2
        )
        self._auto = (
            _AutoLayoutExec(predict, (self._params, self._stats))
            if auto_layout and (mesh is None or mesh.devices.size <= 1)
            else None
        )

    @classmethod
    def from_checkpoint(
        cls, checkpoint_dir: str, name: str, imgsz: int = 640, **kw
    ) -> "YoloCornerPredictor":
        # template-free params read (see PosePredictor.from_checkpoint)
        from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

        params, batch_stats, _ = ckpt_lib.load_params(checkpoint_dir, name)
        return cls(params, batch_stats, imgsz, **kw)

    def predict(self, images_u8):
        """(B, S, S, 3) uint8 -> ((B, 4, 2) float32 xy input pixels,
        (B, 4) float32 per-corner confidences)."""
        if self._auto is not None:
            out = self._auto(images_u8)
            if out is not None:
                return out
        return self._predict(self._params, self._stats, jnp.asarray(images_u8))

    def predict_valid(self, images_u8):
        px, conf = self.predict(images_u8)
        return px, conf, conf >= self.threshold

    def scale_to_original(self, px, original_hw):
        """Map (..., 2) xy coords from model-input pixels to an
        ``original_hw`` frame the input was stretch-resized from. YOLO
        coords live in the training frame's index space, and the resize is
        half-pixel (align_corners=False, both cv2.INTER_LINEAR and
        ops.resize.bilinear_resize), so the accurate inverse map is
        (x + 0.5) * scale - 0.5 — a plain (size-1) ratio drifts up to
        ~0.5 * (ow/width - 1) px at the far corners."""
        import numpy as np

        oh, ow = original_hw
        s = np.asarray(
            [ow / self.width, oh / self.height], dtype=np.float32
        )
        return (px + 0.5) * s - 0.5
