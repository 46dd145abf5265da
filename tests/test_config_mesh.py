import json

import numpy as np

import jax
import jax.numpy as jnp

from mtg_card_image_segmentation_tpu.config import Config, default_config, pose_default_config
from mtg_card_image_segmentation_tpu.parallel import (
    batch_spec,
    make_mesh,
    shard_batch,
)


def test_default_config_matches_reference_operating_point():
    cfg = default_config()
    assert cfg.model.input_height == 320 and cfg.model.input_width == 240
    assert cfg.model.num_classes == 2
    assert cfg.data.batch_size == 32
    assert cfg.optimizer.name == "adamw"
    assert cfg.optimizer.learning_rate == 1e-3
    assert cfg.train.dice_weight == 0.5 and cfg.train.ce_weight == 0.5
    assert cfg.train.early_stopping_patience == 15
    assert cfg.prune.amount == 0.3
    pose = pose_default_config()
    assert pose.pose.input_height == 480 and pose.pose.heatmap_width == 160


def test_config_override_and_cli():
    cfg = default_config().override({"data": {"batch_size": 8}})
    assert cfg.data.batch_size == 8
    cfg2 = cfg.with_cli(["optimizer.learning_rate=0.01", "model.name=foo"])
    assert cfg2.optimizer.learning_rate == 0.01
    assert cfg2.model.name == "foo"
    # unknown key raises
    try:
        cfg.override({"nope": 1})
        raise AssertionError("should have raised")
    except KeyError:
        pass


def test_config_json_roundtrip(tmp_path):
    cfg = default_config().override({"train": {"num_epochs": 3}})
    p = tmp_path / "cfg.json"
    cfg.to_json(str(p))
    loaded = Config.from_json(str(p))
    assert loaded == cfg


def test_mesh_and_batch_sharding(mesh8):
    assert mesh8.shape == {"hosts": 1, "data": 4, "space": 2, "model": 1}
    x = np.zeros((8, 32, 24, 3), np.float32)
    m = np.zeros((8, 32, 24), np.int32)
    xs, ms = shard_batch(mesh8, x, m)
    assert xs.sharding.spec == batch_spec()
    # global mean over a sharded array is still the global mean
    assert float(jnp.mean(xs)) == 0.0


def test_mesh_single_device():
    mesh = make_mesh(devices=jax.devices()[:1])
    assert mesh.shape == {"hosts": 1, "data": 1, "space": 1, "model": 1}
