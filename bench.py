"""Headline benchmark: batched segmentation inference throughput at 512x512.

North star (BASELINE.json): >= 5,000 images/sec/chip at 512x512 on v5e with
mIoU parity. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_SEC = 5000.0


def _time_fn(fn, args, iters: int, warmup: int = 5) -> float:
    """Honest step timing: device execution is in-order, so materializing a
    scalar from the *last* output on the host lower-bounds completion of all
    dispatched steps. (block_until_ready alone reports early through the
    axon remote relay — do not trust it for timing.)"""
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jax.jit(jnp.sum)(out))  # fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.jit(jnp.sum)(out))  # fence: waits for all iters
    return (time.perf_counter() - t0) / iters


def bench_train(args) -> None:
    """Train-step benchmark: the jitted seg train step (forward + loss +
    backward + optimizer + metric stats, donated buffers) at the reference
    operating point (320x240 b32, train/README.md:275's training budget)
    and at the 512^2 serving resolution. Reports step/s, img/s and achieved
    TFLOP/s (XLA cost analysis / measured step time) vs the chip's measured
    ~174 TFLOP/s bf16 peak. Random-init params + random batches: throughput
    is shape-dependent, not weight-dependent, so the number is reproducible
    without a checkpoint."""
    import jax
    import jax.numpy as jnp

    from mtg_card_image_segmentation_tpu.config import default_config
    from mtg_card_image_segmentation_tpu.models import registry
    from mtg_card_image_segmentation_tpu.training import (
        create_optimizer,
        make_train_step,
    )
    from mtg_card_image_segmentation_tpu.training.state import create_seg_state

    cfg = default_config()
    points = [
        ("ref_320x240", cfg.model.input_height, cfg.model.input_width, 32),
        (f"{args.size}x{args.size}", args.size, args.size, 32),
    ]
    # --batches sweeps larger batches at the reference resolution (the
    # r4 verdict's open question: how much of the 2.1% train MFU is b32
    # under-occupancy vs fundamental)
    for b in args.batches:
        if b != 32:
            points.append(
                (f"ref_320x240", cfg.model.input_height, cfg.model.input_width, b)
            )
    results = []
    for name, h, w, batch in points:
        model = registry.from_config(cfg.model)
        tx, _ = create_optimizer(cfg.optimizer, cfg.train.num_epochs, 100)
        state = jax.jit(
            lambda k: create_seg_state(model, tx, (1, h, w, 3), k)
        )(jax.random.key(0))
        step = make_train_step(
            dice_weight=cfg.train.dice_weight, ce_weight=cfg.train.ce_weight,
            num_classes=cfg.model.num_classes, donate=True,
        )
        rng = np.random.default_rng(0)
        images = jnp.asarray(rng.random((batch, h, w, 3)), jnp.float32)
        masks = jnp.asarray(rng.integers(0, 2, (batch, h, w)), jnp.int32)

        flops = None
        try:
            cost = step.lower(state, images, masks).compile().cost_analysis()
            if cost:
                flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass

        # warmup (compile) + honest fence (bench._time_fn rationale)
        for _ in range(3):
            state, stats = step(state, images, masks)
        _ = np.asarray(jax.jit(jnp.sum)(stats["loss"]))
        if args.profile:
            from mtg_card_image_segmentation_tpu.utils.profiling import trace

            with trace(args.profile):
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    state, stats = step(state, images, masks)
                _ = np.asarray(jax.jit(jnp.sum)(stats["loss"]))
                dt = (time.perf_counter() - t0) / args.iters
        else:
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, stats = step(state, images, masks)
            _ = np.asarray(jax.jit(jnp.sum)(stats["loss"]))
            dt = (time.perf_counter() - t0) / args.iters

        entry = {
            "metric": f"seg_train_step_{name}_b{batch}",
            "value": round(1.0 / dt, 2),
            "unit": "steps/sec/chip",
            "img_per_sec": round(batch / dt, 1),
            "step_ms": round(dt * 1e3, 2),
        }
        if flops:
            entry["achieved_tflops"] = round(flops / dt / 1e12, 1)
            entry["vs_peak_174_tflops"] = round(flops / dt / 174e12, 3)
        results.append(entry)
        if args.verbose:
            print(f"# {name} b{batch}: {dt * 1e3:.2f} ms/step -> "
                  f"{batch / dt:.0f} img/s"
                  + (f", {entry['achieved_tflops']} TFLOP/s" if flops else ""))
        # donated-state hygiene: drop everything before the next point
        del state, stats
    for entry in results:
        print(json.dumps(entry))
    if args.out:
        # the r4 verdict's complaint: the numbers were measured but
        # recorded nowhere — persist the sweep next to BENCH_r*.json
        payload = {"platform": jax.devices()[0].platform, "results": results}
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"# recorded -> {args.out}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--batches", type=int, nargs="*", default=[32, 64, 128])
    parser.add_argument("--iters", type=int, default=30)
    parser.add_argument("--checkpoint", default=None,
                        help="bench a trained checkpoint instead of random init")
    parser.add_argument("--slim", action="store_true",
                        help="physically remove dead expansion channels first "
                             "(expansion-pruned checkpoints)")
    parser.add_argument("--int8", action="store_true",
                        help="int8-weight serving mode (per-channel symmetric "
                             "quantized kernels in HBM, dequantized in-jit; "
                             "BASELINE config #5 'bf16/int8 pipeline')")
    parser.add_argument("--mesh-data", type=int, default=1,
                        help="batch-shard serving over a data mesh of this "
                             "size (-1 = all local devices); 1 = single chip "
                             "(the driver's headline configuration)")
    parser.add_argument("--xla-only", action="store_true",
                        help="reference-shaped XLA path, no Pallas kernels "
                             "(the TPU fast path needs a TPU; this enables "
                             "CPU smoke runs)")
    parser.add_argument("--train", action="store_true",
                        help="benchmark the jitted seg TRAIN step instead "
                             "of inference (320x240 b32 reference point + "
                             "--size^2); no checkpoint needed")
    parser.add_argument("--out", default=None, metavar="JSON",
                        help="with --train: also write the sweep results "
                             "to this JSON file (e.g. BENCH_TRAIN.json)")
    parser.add_argument("--profile", default=None, metavar="DIR",
                        help="capture a TensorBoard-loadable jax.profiler "
                             "trace of the timed loop into DIR")
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()  # make JAX_PLATFORMS=cpu binding (sitecustomize
    # registers the TPU plugin in every process; env alone is not enough)
    if args.train:
        bench_train(args)
        return
    from mtg_card_image_segmentation_tpu.models import create_model
    from mtg_card_image_segmentation_tpu.serving import SegPredictor

    model = create_model("lraspp_mobilenet_v3_large")
    init_x = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, init_x, train=False))(
        jax.random.key(0)
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    if args.checkpoint:
        import os

        from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib

        ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
        params, batch_stats, _ = ckpt_lib.load_params(ckpt_dir or ".", name)
    if args.slim:
        from mtg_card_image_segmentation_tpu.compression.slim import slim_seg_state

        params, batch_stats, overrides = slim_seg_state(params, batch_stats)
        n_slim = sum(o is not None for o in overrides)
        if args.verbose:
            print(f"# slim: {n_slim} blocks narrowed")
    mesh = None
    if args.mesh_data != 1:
        from mtg_card_image_segmentation_tpu.parallel import make_mesh

        mesh = make_mesh(data=args.mesh_data)
    # the serving fast path: folded BN + bf16 + fused Pallas normalize/decode,
    # uint8 in -> uint8 mask out (what a deployed consumer sends/receives)
    predictor = SegPredictor(
        params, batch_stats, args.size, args.size,
        use_pallas=not args.xla_only,
        quantize="int8" if args.int8 else None,
        mesh=mesh,
    )

    def forward(images_u8):
        return predictor.predict(images_u8)

    best = 0.0
    best_batch = 0
    rng = np.random.default_rng(0)
    for batch in args.batches:
        # stage() transfers into the layout the compiled program prefers —
        # a host->device transfer writes any layout at the same cost, so a
        # deployed pipeline gets this for free on ingest; staging outside
        # the timed loop keeps the measurement device-compute-only (the
        # same contract as the pre-transferred default-layout array before)
        images = predictor.stage(
            rng.integers(0, 256, (batch, args.size, args.size, 3)).astype(
                np.uint8
            )
        )
        if args.profile:
            from mtg_card_image_segmentation_tpu.utils.profiling import trace

            with trace(args.profile):
                dt = _time_fn(forward, (images,), args.iters)
        else:
            dt = _time_fn(forward, (images,), args.iters)
        ips = batch / dt
        if args.verbose:
            print(f"# batch={batch}: {dt * 1e3:.2f} ms -> {ips:.0f} img/s")
        if ips > best:
            best, best_batch = ips, batch

    # with a data mesh the timed loop measures AGGREGATE mesh throughput;
    # report per-chip (the unit and the 5k/chip baseline are per-chip) and
    # mark the mesh size in the metric name
    n_chips = int(mesh.devices.size) if mesh is not None else 1
    per_chip = best / n_chips
    print(
        json.dumps(
            {
                "metric": "seg_inference_images_per_sec_"
                          f"{args.size}x{args.size}_b{best_batch}"
                          + ("_int8" if args.int8 else "")
                          + (f"_mesh{n_chips}" if n_chips > 1 else ""),
                "value": round(per_chip, 1),
                "unit": "images/sec/chip",
                "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC, 3),
            }
        )
    )
    if n_chips > 1 and args.verbose:
        print(f"# aggregate over {n_chips} chips: {best:.0f} img/s")


if __name__ == "__main__":
    main()
