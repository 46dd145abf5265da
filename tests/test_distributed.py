"""Multi-host scale-out (SURVEY.md:118-125, 376-379): jax.distributed over
loopback with two CPU processes must produce the same train step as a
single process — the DCN ``hosts`` axis is numerically transparent."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _checksum(tree) -> float:
    return float(
        sum(
            jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)))
            for x in jax.tree_util.tree_leaves(tree)
        )
    )


def _single_process_reference(save_dir=None):
    """Same step as tests/_mp_worker.py on this process's 8-device mesh.
    With ``save_dir``, also persists the post-step state as ``sp_model``
    (the single-process side of the cross-topology checkpoint test)."""
    import tiny  # noqa: F401

    from mtg_card_image_segmentation_tpu.config import OptimizerConfig
    from mtg_card_image_segmentation_tpu.models import create_model
    from mtg_card_image_segmentation_tpu.parallel import make_mesh, shard_batch
    from mtg_card_image_segmentation_tpu.training import (
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
    images_d, masks_d = shard_batch(mesh, images, masks)
    step = make_train_step(mesh=mesh, donate=False)
    state, stats = step(state, images_d, masks_d)
    if save_dir is not None:
        from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

        ckpt_lib.save_checkpoint(save_dir, "sp_model", state, epoch=1)
    return float(stats["loss"]), _checksum(state.params)


def test_two_process_step_matches_single_process(tmp_path):
    port = _free_port()

    # single-process reference first: its checkpoint is restored INSIDE the
    # cluster by the workers (single-save -> cluster-restore direction)
    sp_dir = str(tmp_path / "sp_ckpt")
    ref_loss, ref_checksum = _single_process_reference(save_dir=sp_dir)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    worker = os.path.join(REPO, "tests", "_mp_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), sp_dir],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    results, restores = [], []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("MPRESULT ")]
        assert line, out[-4000:]
        results.append(json.loads(line[-1][len("MPRESULT "):]))
        rline = [ln for ln in out.splitlines() if ln.startswith("MPRESTORE ")]
        assert rline, out[-4000:]
        restores.append(json.loads(rline[-1][len("MPRESTORE "):]))

    # both processes computed the same global step
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["checksum"] == pytest.approx(results[1]["checksum"], rel=1e-6)

    assert results[0]["loss"] == pytest.approx(ref_loss, rel=1e-5)
    assert results[0]["checksum"] == pytest.approx(ref_checksum, rel=1e-5)

    # single-save -> cluster-restore: every worker restored the full
    # parameter set (a half-written or half-read checkpoint changes the
    # checksum)
    for r in restores:
        assert r["checksum"] == pytest.approx(ref_checksum, rel=1e-6)

    # cluster-save -> single-process restore (VERDICT r4 task 7: catches
    # "process 1 wrote half the arrays"): the checkpoint the 2-process
    # cluster wrote collectively must restore whole in THIS process and
    # match the reference step's parameters
    from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

    mp_params, mp_stats, meta = ckpt_lib.load_params(
        f"/tmp/mp_ckpt_{port}", "best_model"
    )
    assert meta.get("epoch") == 1
    assert _checksum(mp_params) == pytest.approx(ref_checksum, rel=1e-6)
    assert mp_stats is not None and jax.tree_util.tree_leaves(mp_stats)


def test_process_shard_partitions():
    from mtg_card_image_segmentation_tpu.parallel import distributed

    items = list(range(10))
    a = distributed.process_shard(items, index=0, count=3)
    b = distributed.process_shard(items, index=1, count=3)
    c = distributed.process_shard(items, index=2, count=3)
    assert sorted(a + b + c) == items
    assert a == [0, 3, 6, 9]


def test_file_pipeline_steps_agree_across_processes(monkeypatch):
    """steps_per_epoch must be identical on every process (all join the
    same collectives each step): computed from the GLOBAL count, not the
    per-process strided shard whose lengths differ by one."""
    import mtg_card_image_segmentation_tpu.data.pipeline as pl

    class _DS:
        def __len__(self):
            return 31

    steps = []
    for rank in (0, 1):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda r=rank: r)
        pipe = pl.FilePipeline.__new__(pl.FilePipeline)
        pipe.dataset = _DS()
        pipe.batch_size = 16
        pipe._local_bs = 8
        pipe.drop_last = True
        steps.append(pipe.steps_per_epoch)
    assert steps[0] == steps[1] == 31 // 16
