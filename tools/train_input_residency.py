#!/usr/bin/env python
"""Pin down WHERE the train-step wall time goes: device compute vs input
residency through the axon relay (round-5 follow-up to VERDICT r4 task 3).

The r5 profiled trace of the b32 320x240 train step shows ~2.4 ms of
device-busy time per 50.35 ms wall step, and the BENCH_TRAIN_r05 sweep's
wall time scales with input BYTES (b32 50 ms, b64 104, b128 192, b256 426
~= 780 MB/s), not with compute. Hypothesis: arrays created with
``jnp.asarray(host_data)`` stay host-backed on this remote-relay platform
and are re-shipped on EVERY execute, while device-PRODUCED arrays (the
real trainer's on-device synthetic datagen, serving's staged inputs) run
at device speed. This tool measures the same compiled train step with:

  host_asarray   inputs from jnp.asarray(numpy)   (the r4/r5 bench's way)
  device_put     inputs via jax.device_put(numpy)
  device_gen     inputs produced by a jitted on-device PRNG program
                 (what training actually does — data/synthetic.py f(key))

-> runs/perf_r5/train_residency.json

Waits for /tmp/queue_r5_eval_done (or PERF_RES_FLAG) before measuring so
the timed loops never overlap the yolo eval; compiles immediately.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

FLAG = os.environ.get("PERF_RES_FLAG", "/tmp/queue_r5_eval_done")
DEADLINE = int(os.environ.get("PERF_RES_DEADLINE", "1787288900"))  # ~05:08


def log(msg):
    print(f"[residency {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()

    from mtg_card_image_segmentation_tpu.config import default_config
    from mtg_card_image_segmentation_tpu.models import registry
    from mtg_card_image_segmentation_tpu.training import (
        create_optimizer,
        make_train_step,
    )
    from mtg_card_image_segmentation_tpu.training.state import create_seg_state

    cfg = default_config()
    H, W, B = cfg.model.input_height, cfg.model.input_width, 32
    model = registry.from_config(cfg.model)
    tx, _ = create_optimizer(cfg.optimizer, cfg.train.num_epochs, 100)

    init_fn = jax.jit(lambda k: create_seg_state(model, tx, (1, H, W, 3), k))
    key_aval = jax.eval_shape(lambda: jax.random.key(0))
    t0 = time.perf_counter()
    init_c = init_fn.lower(key_aval).compile()
    state_aval = jax.eval_shape(init_fn, key_aval)
    log(f"init compiled {time.perf_counter() - t0:.0f}s")

    key_c = jax.jit(lambda: jax.random.key(0)).lower().compile()

    def gen(k):
        ki, km = jax.random.split(k)
        images = jax.random.uniform(ki, (B, H, W, 3), jnp.float32)
        masks = jax.random.randint(km, (B, H, W), 0, 2, jnp.int32)
        return images, masks

    t0 = time.perf_counter()
    gen_c = jax.jit(gen).lower(key_aval).compile()
    log(f"gen compiled {time.perf_counter() - t0:.0f}s")

    step = make_train_step(
        dice_weight=cfg.train.dice_weight, ce_weight=cfg.train.ce_weight,
        num_classes=cfg.model.num_classes, donate=True,
    )
    t0 = time.perf_counter()
    step_c = step.lower(
        state_aval,
        jax.ShapeDtypeStruct((B, H, W, 3), jnp.float32),
        jax.ShapeDtypeStruct((B, H, W), jnp.int32),
    ).compile()
    log(f"step compiled {time.perf_counter() - t0:.0f}s")

    log(f"waiting for {FLAG}")
    while not os.path.exists(FLAG):
        if time.time() > DEADLINE - 120:
            log("deadline while waiting; exiting")
            return
        time.sleep(10)
    time.sleep(5)

    state = init_c(key_c())
    rng = np.random.default_rng(0)
    img_np = rng.random((B, H, W, 3)).astype(np.float32)
    mask_np = rng.integers(0, 2, (B, H, W)).astype(np.int32)

    variants = {
        "host_asarray": lambda: (jnp.asarray(img_np), jnp.asarray(mask_np)),
        "device_put": lambda: (jax.device_put(img_np), jax.device_put(mask_np)),
        "device_gen": lambda: gen_c(key_c()),
    }
    results = {}
    iters = 15
    for name, make in variants.items():
        if time.time() > DEADLINE:
            log("deadline; stopping")
            break
        images, masks = make()
        for _ in range(3):
            state, stats = step_c(state, images, masks)
        _ = np.asarray(stats["loss"])
        t0 = time.perf_counter()
        for _ in range(iters):
            state, stats = step_c(state, images, masks)
        _ = np.asarray(stats["loss"])
        dt = (time.perf_counter() - t0) / iters
        results[name] = {
            "step_ms": round(dt * 1e3, 2),
            "steps_per_sec": round(1.0 / dt, 2),
            "img_per_sec": round(B / dt, 1),
        }
        log(f"{name}: {dt * 1e3:.2f} ms/step -> {B / dt:.0f} img/s")
        del images, masks

    os.makedirs("runs/perf_r5", exist_ok=True)
    with open("runs/perf_r5/train_residency.json", "w") as f:
        json.dump({"batch": B, "hw": [H, W], "iters": iters,
                   "results": results}, f, indent=2)
    log("written runs/perf_r5/train_residency.json")


if __name__ == "__main__":
    main()
