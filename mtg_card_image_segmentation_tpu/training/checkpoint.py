"""Orbax checkpointing with the reference's best/periodic/final policy.

Replaces the torch.save state-dict triple (train/utils.py:227-280) and the
richer pose-variant checkpoint embedding config+history
(train-pose-estimation_custom/train.py:223-265). One checkpoint = the whole
functional train state (params, batch_stats, opt_state, step) + a JSON
metadata sidecar (epoch, best_metric, history, config) so resume restores
optimizer momentum, schedules and early-stopping context exactly.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def jnp_asarray(x):
    return jnp.asarray(x)


def _state_tree(state) -> Dict[str, Any]:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }


def save_checkpoint(
    checkpoint_dir: str,
    name: str,
    state,
    epoch: int,
    best_metric: Optional[float] = None,
    history: Optional[dict] = None,
    config: Optional[dict] = None,
    retries: int = 1,
) -> str:
    """Write checkpoint ``name`` (e.g. 'best_model', 'checkpoint_epoch_10',
    'final_model') under ``checkpoint_dir``.

    Crash-safe: the save goes to a sibling ``<name>.staging`` dir and the
    existing checkpoint is only replaced after the new save fully succeeds
    (write-then-swap), so a failed save can never destroy the previous
    best_model. Stale staging/orbax-tmp leftovers of an interrupted save
    are removed first (a stale tmp dir from a killed process makes orbax's
    atomic-rename step fail with tensorstore NOT_FOUND errors), and the
    save is retried once from a clean slate on failure."""
    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    staging = path + ".staging"
    os.makedirs(checkpoint_dir, exist_ok=True)

    # Multi-host: the orbax save itself is coordinated across processes,
    # but the host-side filesystem steps (stale cleanup, write-then-swap,
    # meta write) must run on exactly ONE process over the shared dir —
    # an uncoordinated swap races: a lagging process's rmtree(path) could
    # delete the checkpoint process 0 just renamed into place. Barriers
    # fence cleanup-before-save and save-before-swap; retries are
    # single-process only (a per-process retry would desynchronize the
    # collective save and deadlock the barriers).
    multi = jax.process_count() > 1
    lead = jax.process_index() == 0
    if multi:
        from jax.experimental import multihost_utils

        retries = 0

    def _clean_stale():
        for entry in os.listdir(checkpoint_dir):
            if entry == name + ".staging" or (
                entry.startswith(name + ".") and ".orbax-checkpoint-tmp" in entry
            ):
                shutil.rmtree(os.path.join(checkpoint_dir, entry), ignore_errors=True)

    # Failure semantics: orbax save errors are effectively collective (the
    # commit protocol is coordinated), so all processes raise together and
    # the barriers stay matched; a truly one-sided host failure desyncs the
    # job like any other collective would.
    last_err: Optional[BaseException] = None
    for _ in range(retries + 1):
        if not multi:
            _clean_stale()
        else:
            if lead:
                _clean_stale()
            multihost_utils.sync_global_devices(f"ckpt-cleaned-{name}-{epoch}")
        try:
            ckptr = ocp.StandardCheckpointer()
            ckptr.save(staging, _state_tree(state))
            ckptr.wait_until_finished()
            last_err = None
            break
        except Exception as e:  # clean up and retry once
            last_err = e
    if last_err is not None:
        raise last_err
    if multi:
        multihost_utils.sync_global_devices(f"ckpt-saved-{name}-{epoch}")
    if not multi or lead:
        # swap: drop the old checkpoint only now that the new one is complete
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)
        os.rename(staging, path)
        meta = {
            "epoch": int(epoch),
            "best_metric": None if best_metric is None else float(best_metric),
            "history": history or {},
            "config": config or {},
        }
        with open(os.path.join(checkpoint_dir, name + ".meta.json"), "w") as f:
            json.dump(meta, f, indent=2)
    if multi:
        multihost_utils.sync_global_devices(f"ckpt-swapped-{name}-{epoch}")
    return path


def try_save_checkpoint(log, *args, **kwargs) -> Optional[str]:
    """Non-fatal save for mid-training best/periodic checkpoints: an
    hours-long run must survive a transient filesystem/orbax failure (the
    reference's trainers likewise guard the loop with try/except,
    train-pose-estimation_custom/train.py:461-466). Returns the path or
    None on failure (logged)."""
    try:
        return save_checkpoint(*args, **kwargs)
    except Exception:
        log.exception("checkpoint save failed (continuing training)")
        return None


def _restore_numpy_subtree(path: str, keys: Tuple[str, ...]) -> Dict[str, Any]:
    """Template-free partial restore of top-level ``keys`` as host numpy
    (platform-portable: no sharding metadata, so TPU-written checkpoints
    load in CPU tools). Subtrees not named (e.g. opt_state, 2x the params
    bytes for Adam) are never read from disk."""
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    if meta is None:
        # orbax returns a metadata-less result (instead of raising) when the
        # directory is absent or holds no PyTree payload — e.g. a checkpoint
        # whose binaries are gitignored and only the .meta.json survives.
        raise FileNotFoundError(
            f"no orbax checkpoint at {path!r} (directory missing or empty — "
            "checkpoint binaries are not tracked in git; re-run training or "
            "point --checkpoint at a real run)"
        )
    meta_tree = meta.tree
    want = {k: meta_tree[k] for k in keys}
    return ckptr.restore(
        path,
        args=ocp.args.PyTreeRestore(
            item=want,
            restore_args=jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), want
            ),
            partial_restore=True,
        ),
    )


def _read_meta(checkpoint_dir: str, name: str) -> Dict[str, Any]:
    meta_path = os.path.join(checkpoint_dir, name + ".meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def load_checkpoint(
    checkpoint_dir: str, name: str, state, params_only: bool = False
) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the (freshly created) ``state`` template. Returns
    (state, metadata).

    ``params_only`` restores just params/batch_stats/step — use from
    inference/eval/export consumers, whose optimizer (and therefore
    opt_state pytree structure) may differ from the trainer that wrote the
    checkpoint."""
    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    if params_only:
        # adopt only params/batch_stats/step; the writer's opt_state
        # structure is irrelevant (and is never read from disk)
        raw = _restore_numpy_subtree(path, ("params", "batch_stats", "step"))
        state = state.replace(
            params=jax.tree.map(jnp_asarray, raw["params"]),
            batch_stats=jax.tree.map(jnp_asarray, raw["batch_stats"]),
            step=raw["step"],
        )
    else:
        ckptr = ocp.StandardCheckpointer()
        template = jax.tree.map(ocp.utils.to_shape_dtype_struct, _state_tree(state))
        restored = ckptr.restore(path, template)
        state = state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
    return state, _read_meta(checkpoint_dir, name)


def load_params(
    checkpoint_dir: str, name: str
) -> Tuple[Any, Any, Dict[str, Any]]:
    """Template-free read of just (params, batch_stats, meta).

    For inference/serving consumers that need no train state at all: unlike
    ``load_checkpoint(params_only=True)`` this requires NO freshly-created
    state — i.e. no ``model.init`` compile and no eager ``tx.init`` (which
    on the remote-compile TPU relay dispatches one compile per optimizer
    leaf — minutes of startup for zero value). The opt_state subtree (2x
    the params bytes for Adam) is not even read from disk. Restored as host
    numpy (platform-portable), then converted to default-device jax arrays
    ONCE here — handing numpy trees to consumers would silently re-upload
    every weight on each jitted call."""
    path = os.path.abspath(os.path.join(checkpoint_dir, name))
    raw = _restore_numpy_subtree(path, ("params", "batch_stats"))
    params = jax.tree.map(jnp_asarray, raw["params"])
    batch_stats = jax.tree.map(jnp_asarray, raw["batch_stats"])
    return params, batch_stats, _read_meta(checkpoint_dir, name)


def latest_checkpoint_name(checkpoint_dir: str) -> Optional[str]:
    """Most recently written checkpoint under ``checkpoint_dir`` (for
    --resume without an explicit name)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    candidates = [
        d
        for d in os.listdir(checkpoint_dir)
        if os.path.isdir(os.path.join(checkpoint_dir, d))
    ]
    if not candidates:
        return None
    return max(
        candidates, key=lambda d: os.path.getmtime(os.path.join(checkpoint_dir, d))
    )
