#!/usr/bin/env python
"""Pose (HRNet heatmap) ONNX export CLI
(reference: python train-pose-estimation_custom/export_onnx.py).

Creates a deployment package from a trained pose checkpoint:
  pose.onnx          fp32 ONNX graph (BN folded), opset 19
  pose_fp16.onnx     fp16 weights, fp32 I/O (auto-mixed-precision analog)
  pose_int8.onnx     QDQ per-channel int8 weights (~4x smaller download)
  pose_dynamic.onnx  fp32 with a symbolic batch axis (gated at b1 AND b4)
  pose.stablehlo     jax.export StableHLO + .json sidecar (<1e-5 self-test)
  pose_info.json     IO contract + parity results

Parity gates: fp32 max|diff| < 1e-4; fp16 at the reference's
auto_convert_mixed_precision tolerance rtol 0.01 / atol 0.001
(train-pose-estimation_custom/export_onnx.py:104).

  python export_pose.py --checkpoint runs/pose_full/checkpoints/best_model
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output-dir", default="exported_models_pose")
    parser.add_argument("--set", nargs="*", default=[], metavar="a.b=v")
    parser.add_argument("--skip-verify", action="store_true")
    parser.add_argument("--info", action="store_true",
                        help="print checkpoint info and exit (export_onnx.py --info)")
    parser.add_argument(
        "--dynamic-batch", action=argparse.BooleanOptionalAction, default=True,
        help="also emit pose_dynamic.onnx with a symbolic batch axis "
        "(the reference exports dynamic batch by default, "
        "export_onnx.py:74-95)",
    )
    args = parser.parse_args()

    import jax

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()
    import jax.numpy as jnp
    import numpy as np

    from mtg_card_image_segmentation_tpu.config import pose_default_config
    from mtg_card_image_segmentation_tpu.export import fold_batch_norm
    from mtg_card_image_segmentation_tpu.export import onnx_proto as op
    from mtg_card_image_segmentation_tpu.export.onnx_export import (
        convert_to_fp16,
        export_pose_model,
    )
    from mtg_card_image_segmentation_tpu.export.onnx_runtime_mini import make_runner
    from mtg_card_image_segmentation_tpu.models import registry
    from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib
    from mtg_card_image_segmentation_tpu.utils import count_parameters

    cfg = pose_default_config()
    if args.set:
        cfg = cfg.with_cli(args.set)
    h, w = cfg.pose.input_height, cfg.pose.input_width
    hm_h, hm_w = cfg.pose.heatmap_height, cfg.pose.heatmap_width
    k = cfg.pose.num_keypoints

    import dataclasses

    # fp32 compute for the parity reference (the deployed consumer is true fp32)
    model = registry.pose_from_config(
        dataclasses.replace(cfg.pose, compute_dtype="float32")
    )
    # template-free params read — no init compile, no throwaway optimizer
    ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
    params, batch_stats, meta = ckpt_lib.load_params(ckpt_dir or ".", name)
    if args.info:
        print(json.dumps({
            "epoch": meta.get("epoch"), "best_metric": meta.get("best_metric"),
            "parameters": count_parameters(params),
            "input": [1, 3, h, w], "heatmaps": [1, k, hm_h, hm_w],
        }, indent=2))
        return
    print(f"loaded {args.checkpoint} (epoch {meta.get('epoch')})")

    folded = fold_batch_norm(params, batch_stats)
    onnx_model = export_pose_model(
        folded, input_hw=(h, w), heatmap_hw=(hm_h, hm_w),
        num_keypoints=k, opset=19,
    )
    from mtg_card_image_segmentation_tpu.export.onnx_optimize import optimize

    opt_stats = optimize(onnx_model)  # verified by the parity gates below
    if sum(opt_stats.values()):
        print(f"graph optimization: {opt_stats}")
    os.makedirs(args.output_dir, exist_ok=True)
    fp32_path = os.path.join(args.output_dir, "pose.onnx")
    onnx_model.save(fp32_path)
    print(f"pose.onnx ({os.path.getsize(fp32_path) / 1e6:.1f} MB)")

    fp16_model = convert_to_fp16(onnx_model, keep_io_types=True)
    fp16_path = os.path.join(args.output_dir, "pose_fp16.onnx")
    fp16_model.save(fp16_path)
    print(f"pose_fp16.onnx ({os.path.getsize(fp16_path) / 1e6:.1f} MB, "
          f"{os.path.getsize(fp32_path) / os.path.getsize(fp16_path):.2f}x smaller)")

    # int8 QDQ export (BASELINE.json config #5 "bf16/int8 pipeline"): per-
    # output-channel symmetric weight quantization + DequantizeLinear nodes
    from mtg_card_image_segmentation_tpu.export.quantize import convert_to_int8

    int8_model = convert_to_int8(onnx_model)
    int8_path = os.path.join(args.output_dir, "pose_int8.onnx")
    int8_model.save(int8_path)
    print(f"pose_int8.onnx ({os.path.getsize(int8_path) / 1e6:.1f} MB, "
          f"{os.path.getsize(fp32_path) / os.path.getsize(int8_path):.2f}x smaller)")

    dyn_path = None
    if args.dynamic_batch:
        dyn_model = export_pose_model(
            folded, input_hw=(h, w), heatmap_hw=(hm_h, hm_w),
            num_keypoints=k, opset=19, dynamic_batch=True,
        )
        optimize(dyn_model)
        dyn_path = os.path.join(args.output_dir, "pose_dynamic.onnx")
        dyn_model.save(dyn_path)
        print(f"pose_dynamic.onnx ({os.path.getsize(dyn_path) / 1e6:.1f} MB, "
              f"symbolic batch axis)")

    # StableHLO second serialization format (reference packages TorchScript
    # alongside ONNX, train/export.py:167-244)
    from mtg_card_image_segmentation_tpu.export.stablehlo import export_stablehlo

    def _nchw_fn(x_nchw):
        xx = jnp.transpose(x_nchw, (0, 2, 3, 1))
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, xx, train=False
        )
        return jnp.transpose(out, (0, 3, 1, 2))

    shlo_path = os.path.join(args.output_dir, "pose.stablehlo")
    with jax.default_matmul_precision("float32"):
        shlo_info = export_stablehlo(
            _nchw_fn, (jnp.zeros((1, 3, h, w), jnp.float32),), shlo_path,
            platforms=("cpu", "tpu"),
        )
    print(f"pose.stablehlo ({shlo_info['bytes'] / 1e6:.1f} MB, self-test "
          f"max|diff|={shlo_info['self_test_max_diff']:.2e} "
          f"{'PASS' if shlo_info['self_test_pass'] else 'FAIL'})")

    parity = {}
    if not args.skip_verify:
        with jax.default_matmul_precision("float32"):
            rng = np.random.default_rng(0)
            x_nchw = rng.random((1, 3, h, w)).astype(np.float32)  # [0,1] domain
            ref = model.apply(
                {"params": params, "batch_stats": batch_stats},
                jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))), train=False,
            )
            ref_nchw = np.transpose(np.asarray(ref), (0, 3, 1, 2))
            out32 = np.asarray(
                make_runner(op.Model.load(fp32_path))(jnp.asarray(x_nchw))
            )
            d32 = float(np.abs(out32 - ref_nchw).max())
            ok32 = d32 < cfg.export.parity_atol_fp32
            print(f"fp32 parity: max|diff|={d32:.2e} "
                  f"(< {cfg.export.parity_atol_fp32}) {'PASS' if ok32 else 'FAIL'}")
            out16 = np.asarray(
                make_runner(op.Model.load(fp16_path))(jnp.asarray(x_nchw))
            )
            d16 = float(np.abs(out16 - ref_nchw).max())
            ok16 = bool(np.all(
                np.abs(out16 - ref_nchw)
                <= cfg.export.parity_atol_fp16
                + cfg.export.parity_rtol_fp16 * np.abs(ref_nchw)
            ))
            print(f"fp16 parity: max|diff|={d16:.2e} {'PASS' if ok16 else 'FAIL'}")
        # int8 gate is FUNCTIONAL, on a synthetic card render (not noise —
        # heatmap peaks on a noise probe are arbitrary; negative_prob=0 +
        # keep_in_frame guarantee the probe actually contains a card):
        # decoded corner peaks of the int8 graph must not move by more than
        # one heatmap pixel vs the fp32 ONNX graph — isolating quantization
        # error from exporter error, both runs through the same executor.
        from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_batch

        with jax.default_matmul_precision("float32"):
            card01 = np.asarray(
                jax.jit(
                    lambda k: synthetic_batch(
                        k, 1, h, w, negative_prob=0.0, keep_in_frame=True
                    ).image
                )(jax.random.key(11))
            )
            card_nchw = np.transpose(card01, (0, 3, 1, 2)).astype(np.float32)
            ref_card = np.asarray(
                make_runner(op.Model.load(fp32_path))(jnp.asarray(card_nchw))
            )
            out8 = np.asarray(
                make_runner(op.Model.load(int8_path))(jnp.asarray(card_nchw))
            )

        def _peaks(hms):  # (1, K, H, W) -> (K, 2) [x, y] heatmap px
            kk = hms.shape[1]
            flat = hms.reshape(kk, -1).argmax(-1)
            return np.stack([flat % hms.shape[3], flat // hms.shape[3]], -1)

        shift8 = float(np.abs(_peaks(out8) - _peaks(ref_card)).max())
        d8 = float(np.abs(out8 - ref_card).max())
        ok8 = shift8 <= 1.0
        print(f"int8 parity: heatmap max|diff|={d8:.2e}, "
              f"peak shift={shift8:.0f} hm-px (<= 1) "
              f"{'PASS' if ok8 else 'FAIL'}")
        parity = {
            "fp32_max_abs_diff": d32, "fp32_pass": bool(ok32),
            "fp16_max_abs_diff": d16, "fp16_pass": bool(ok16),
            "int8_max_abs_diff": d8, "int8_peak_shift_hm_px": shift8,
            "int8_pass": bool(ok8),
        }
        okdyn = True
        if dyn_path:
            from mtg_card_image_segmentation_tpu.export import onnx_torch_runner

            dyn_loaded = op.Model.load(dyn_path)
            dyn_results = {}
            with jax.default_matmul_precision("float32"):
                for nb in (1, 4):
                    xb = rng.random((nb, 3, h, w)).astype(np.float32)
                    refb = model.apply(
                        {"params": params, "batch_stats": batch_stats},
                        jnp.asarray(np.transpose(xb, (0, 2, 3, 1))),
                        train=False,
                    )
                    refb = np.transpose(np.asarray(refb), (0, 3, 1, 2))
                    dmini = float(np.abs(np.asarray(
                        make_runner(dyn_loaded)(jnp.asarray(xb))
                    ) - refb).max())
                    dtorch = float(np.abs(onnx_torch_runner.run_model(
                        dyn_loaded, {"input": xb})["heatmaps"] - refb).max())
                    okb = max(dmini, dtorch) < cfg.export.parity_atol_fp32
                    okdyn = okdyn and okb
                    dyn_results[f"batch{nb}"] = {
                        "mini_max_abs_diff": dmini,
                        "torch_runner_max_abs_diff": dtorch,
                        "pass": bool(okb),
                    }
                    print(f"dynamic-batch parity b{nb}: mini={dmini:.2e} "
                          f"torch={dtorch:.2e} {'PASS' if okb else 'FAIL'}")
            parity["dynamic_batch"] = dyn_results
        if not (ok32 and ok16 and ok8 and okdyn):
            raise SystemExit("parity gate FAILED")
        from export_seg import _independent_checks

        parity.update(_independent_checks(fp32_path, x_nchw, ref_nchw, "heatmaps"))

    info = {
        "model": cfg.pose.name,
        "input": {"name": "input", "shape": [1, 3, h, w], "dtype": "float32",
                  "normalization": "/255 only (no ImageNet normalization)"},
        "output": {
            "name": "heatmaps", "shape": [1, k, hm_h, hm_w],
            "decode": "per-channel argmax -> (x, y); for the reported "
                      "sub-pixel accuracy refine each peak by the "
                      "quadratic fit x += 0.5*(f[x+1]-f[x-1]) / "
                      "(2f[x]-f[x+1]-f[x-1]) per axis (interior peaks "
                      "only), then scale by (input_size-1)/(heatmap_size-1)",
            "robustness": "if exactly one channel's peak value is < 0.2 "
                          "while the other three are > 0.5 (a dead "
                          "channel), reconstruct that corner as the "
                          "parallelogram completion c[k] = c[k+1] + "
                          "c[k-1] - c[k+2] of the live corners "
                          "(ops/heatmap.py complete_dead_corner)",
        },
        "parameters": count_parameters(params),
        "opset": 19,
        "stablehlo": shlo_info,
        "dynamic_batch_artifact": os.path.basename(dyn_path) if dyn_path else None,
        "checkpoint_epoch": meta.get("epoch"),
        "best_metric": meta.get("best_metric"),
        "parity": parity,
    }
    with open(os.path.join(args.output_dir, "pose_info.json"), "w") as f:
        json.dump(info, f, indent=2)
    print(f"deployment package -> {args.output_dir}/")


if __name__ == "__main__":
    main()
