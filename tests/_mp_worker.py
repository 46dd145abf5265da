"""Multi-host test worker: one process of a 2-process CPU cluster.

Launched by tests/test_distributed.py as
``python _mp_worker.py <process_id> <coordinator_port>``. Runs ONE
sharded train step of the tiny seg model over a (hosts=2, data=2) global
mesh — the DCN axis spanning the two processes — feeding only this
process's local half of the global batch, then prints the loss and a
post-step parameter checksum for the parent to compare against its own
single-process reference.
"""

import json
import os
import sys

pid = int(sys.argv[1])
port = int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from mtg_card_image_segmentation_tpu.parallel import distributed, make_mesh  # noqa: E402

ok = distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert ok and jax.process_count() == 2, (ok, jax.process_count())
assert len(jax.devices()) == 8

import jax.numpy as jnp  # noqa: E402

import tiny  # noqa: E402,F401  (registers tiny_seg)

from mtg_card_image_segmentation_tpu.config import OptimizerConfig  # noqa: E402
from mtg_card_image_segmentation_tpu.models import create_model  # noqa: E402
from mtg_card_image_segmentation_tpu.training import (  # noqa: E402
    create_optimizer,
    create_seg_state,
    make_train_step,
)

mesh = make_mesh(hosts=2, data=2, space=2)

model = create_model("tiny_seg")
tx, _ = create_optimizer(OptimizerConfig(), num_epochs=1, steps_per_epoch=1)
state = create_seg_state(model, tx, (1, 32, 32, 3), jax.random.key(0))

rng = np.random.default_rng(0)
images = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
masks = (images[..., 0] > 0).astype(np.int32)
# this process's half of the global batch only
lo, hi = pid * 4, (pid + 1) * 4
images_d, masks_d = distributed.global_batch(mesh, images[lo:hi], masks[lo:hi])
assert images_d.shape == (8, 32, 32, 3)

step = make_train_step(mesh=mesh, donate=False)
state, stats = step(state, images_d, masks_d)
jax.block_until_ready(stats)

checksum = float(
    sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in jax.tree_util.tree_leaves(state.params))
)
print("MPRESULT " + json.dumps({"loss": float(stats["loss"]), "checksum": checksum}))

# multi-host coordinated checkpoint: orbax collective save + lead-only
# write-then-swap behind barriers (training/checkpoint.py) — a worker that
# hangs or crashes here fails the parent's timeout
import shutil  # noqa: E402

from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib  # noqa: E402

ckpt_dir = f"/tmp/mp_ckpt_{port}"
if pid == 0:
    shutil.rmtree(ckpt_dir, ignore_errors=True)
saved = ckpt_lib.save_checkpoint(ckpt_dir, "best_model", state, epoch=1)
assert os.path.isdir(os.path.join(ckpt_dir, "best_model")), saved
assert not os.path.isdir(os.path.join(ckpt_dir, "best_model.staging"))
print("MPCKPT OK")

# the other persistence direction (VERDICT r4 task 7): a checkpoint written
# by a SINGLE process must restore under the 2-process cluster with every
# array intact — the step above is deterministic, so the restored params
# must equal this cluster's own post-step params exactly
if len(sys.argv) > 3:
    sp_params, _, _ = ckpt_lib.load_params(sys.argv[3], "sp_model")
    restored_checksum = float(
        sum(
            jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)))
            for x in jax.tree_util.tree_leaves(sp_params)
        )
    )
    print("MPRESTORE " + json.dumps({"checksum": restored_checksum}))
