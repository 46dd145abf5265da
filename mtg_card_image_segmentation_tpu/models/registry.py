"""Model factory — the ``create_model`` entry point every pipeline shares
(replaces the three per-pipeline factories: train/model.py:145,
train-pose-estimation_custom/model.py:195, *_yolo12n/model.py:43)."""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.config import ModelConfig, PoseModelConfig

_REGISTRY: Dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def available_models():
    return sorted(_REGISTRY)


def create_model(name: str, **kwargs):
    if name not in _REGISTRY:
        raise KeyError(f"Unknown model {name!r}; available: {available_models()}")
    return _REGISTRY[name](**kwargs)


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


@register("lraspp_mobilenet_v3_large")
def _lraspp(num_classes: int = 2, inter_channels: int = 128,
            compute_dtype: str = "bfloat16", param_dtype: str = "float32",
            bn_momentum: float = 0.99, fold_bn: bool = False,
            expanded_overrides=None):
    from mtg_card_image_segmentation_tpu.models.lraspp import CardSegmentationModel

    return CardSegmentationModel(
        num_classes=num_classes,
        inter_channels=inter_channels,
        bn_momentum=bn_momentum,
        fold_bn=fold_bn,
        expanded_overrides=expanded_overrides,
        dtype=_dtype(compute_dtype),
        param_dtype=_dtype(param_dtype),
    )


@register("yolo12n_pose")
def _yolo12n_pose(num_classes: int = 1, num_keypoints: int = 4,
                  compute_dtype: str = "bfloat16", param_dtype: str = "float32",
                  fold_bn: bool = False):
    from mtg_card_image_segmentation_tpu.models.yolo12_pose import YOLO12Pose

    return YOLO12Pose(
        num_classes=num_classes,
        num_keypoints=num_keypoints,
        fold_bn=fold_bn,
        dtype=_dtype(compute_dtype),
        param_dtype=_dtype(param_dtype),
    )


@register("hrnet_pose")
def _hrnet_pose(num_keypoints: int = 4, heatmap_height: int = 120,
                heatmap_width: int = 160, compute_dtype: str = "bfloat16",
                param_dtype: str = "float32", bn_momentum: float = 0.99):
    from mtg_card_image_segmentation_tpu.models.hrnet import HRNetPose

    return HRNetPose(
        num_keypoints=num_keypoints,
        heatmap_height=heatmap_height,
        heatmap_width=heatmap_width,
        bn_momentum=bn_momentum,
        dtype=_dtype(compute_dtype),
        param_dtype=_dtype(param_dtype),
    )


def pose_from_config(cfg: PoseModelConfig, bn_momentum: float = 0.99):
    return create_model(
        cfg.name,
        num_keypoints=cfg.num_keypoints,
        heatmap_height=cfg.heatmap_height,
        heatmap_width=cfg.heatmap_width,
        compute_dtype=cfg.compute_dtype,
        param_dtype=cfg.param_dtype,
        bn_momentum=bn_momentum,
    )


def from_config(cfg: ModelConfig):
    return create_model(
        cfg.name,
        num_classes=cfg.num_classes,
        inter_channels=cfg.inter_channels,
        compute_dtype=cfg.compute_dtype,
        param_dtype=cfg.param_dtype,
    )
