#!/usr/bin/env python
"""YOLO12n-pose ONNX export CLI
(reference: ultralytics .export(format='onnx', opset 11, simplify, dynamic,
half) driven from train-pose-estimation_yolo12n/model.py:266-310).

Creates a deployment package from a trained YOLO corner checkpoint:
  yolo.onnx          fp32 ONNX graph (BN folded, decode in-graph), opset 19
  yolo_fp16.onnx     fp16 weights, fp32 I/O
  yolo_int8.onnx     QDQ per-channel int8 conv weights (~4x smaller download)
  yolo_dynamic.onnx  fp32 with a symbolic batch axis (ultralytics dynamic=True)
  yolo.stablehlo     jax.export StableHLO + .json sidecar (<1e-5 self-test)
  yolo_info.json     IO contract + parity results

Output contract: "output0" (1, 17, A) — rows [x1,y1,x2,y2,score,
(kx,ky,kconf)x4] in input pixels (see export/onnx_yolo.py). Parity gates:
fp32 max|diff| < 2e-3 px on a 640px graph (the reference's 1e-4 logit gate
scaled to pixel-valued outputs); fp16 within 1 px / 1e-2 on probability
rows; independent torch-kernel re-execution; protoc wire-format decode.

  python export_yolo.py --checkpoint runs/yolo_full_r3/checkpoints/best_model
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--output-dir", default="exported_models_yolo")
    parser.add_argument("--imgsz", type=int, default=640)
    parser.add_argument("--skip-verify", action="store_true")
    parser.add_argument("--info", action="store_true",
                        help="print checkpoint info and exit")
    parser.add_argument(
        "--dynamic-batch", action=argparse.BooleanOptionalAction, default=True,
        help="also emit yolo_dynamic.onnx with a symbolic batch axis "
        "(the reference's ultralytics export defaults dynamic=True, "
        "model.py:266-310)",
    )
    args = parser.parse_args()

    import jax

    from mtg_card_image_segmentation_tpu.utils import apply_platform_env

    apply_platform_env()
    import jax.numpy as jnp
    import numpy as np

    from mtg_card_image_segmentation_tpu.config import default_config
    from mtg_card_image_segmentation_tpu.export import fold_batch_norm
    from mtg_card_image_segmentation_tpu.export import onnx_proto as op
    from mtg_card_image_segmentation_tpu.export.onnx_export import convert_to_fp16
    from mtg_card_image_segmentation_tpu.export.onnx_runtime_mini import make_runner
    from mtg_card_image_segmentation_tpu.export.onnx_yolo import export_yolo_model
    from mtg_card_image_segmentation_tpu.models import create_model
    from mtg_card_image_segmentation_tpu.models.yolo12_pose import YOLO12Pose
    from mtg_card_image_segmentation_tpu.training import checkpoint as ckpt_lib
    from mtg_card_image_segmentation_tpu.utils import count_parameters

    size = args.imgsz
    cfg = default_config()
    model = create_model("yolo12n_pose", compute_dtype="float32")
    # template-free params read — no init compile, no throwaway optimizer
    ckpt_dir, name = os.path.split(os.path.normpath(args.checkpoint))
    params, batch_stats, meta = ckpt_lib.load_params(ckpt_dir or ".", name)
    if args.info:
        print(json.dumps({
            "epoch": meta.get("epoch"), "best_metric": meta.get("best_metric"),
            "parameters": count_parameters(params),
            "input": [1, 3, size, size],
            "output0": [1, 17, sum((size // s) ** 2 for s in (8, 16, 32))],
        }, indent=2))
        return
    print(f"loaded {args.checkpoint} (epoch {meta.get('epoch')})")

    folded = fold_batch_norm(params, batch_stats)
    onnx_model = export_yolo_model(folded, imgsz=size, opset=19)
    from mtg_card_image_segmentation_tpu.export.onnx_optimize import optimize

    opt_stats = optimize(onnx_model)  # verified by the parity gates below
    if sum(opt_stats.values()):
        print(f"graph optimization: {opt_stats}")
    os.makedirs(args.output_dir, exist_ok=True)
    fp32_path = os.path.join(args.output_dir, "yolo.onnx")
    onnx_model.save(fp32_path)
    print(f"yolo.onnx ({os.path.getsize(fp32_path) / 1e6:.1f} MB)")

    fp16_model = convert_to_fp16(onnx_model, keep_io_types=True)
    fp16_path = os.path.join(args.output_dir, "yolo_fp16.onnx")
    fp16_model.save(fp16_path)
    print(f"yolo_fp16.onnx ({os.path.getsize(fp16_path) / 1e6:.1f} MB, "
          f"{os.path.getsize(fp32_path) / os.path.getsize(fp16_path):.2f}x smaller)")

    # int8 QDQ export (BASELINE.json config #5 "bf16/int8 pipeline")
    from mtg_card_image_segmentation_tpu.export.quantize import convert_to_int8

    int8_model = convert_to_int8(onnx_model)
    int8_path = os.path.join(args.output_dir, "yolo_int8.onnx")
    int8_model.save(int8_path)
    print(f"yolo_int8.onnx ({os.path.getsize(int8_path) / 1e6:.1f} MB, "
          f"{os.path.getsize(fp32_path) / os.path.getsize(int8_path):.2f}x smaller)")

    dyn_path = None
    if args.dynamic_batch:
        dyn_model = export_yolo_model(folded, imgsz=size, opset=19,
                                      dynamic_batch=True)
        optimize(dyn_model)
        dyn_path = os.path.join(args.output_dir, "yolo_dynamic.onnx")
        dyn_model.save(dyn_path)
        print(f"yolo_dynamic.onnx ({os.path.getsize(dyn_path) / 1e6:.1f} MB, "
              f"symbolic batch axis)")

    # StableHLO second serialization format (reference packages TorchScript
    # alongside ONNX in the seg path, train/export.py:167-244); the YOLO
    # artifact carries the same output0 layout as the ONNX graph
    from mtg_card_image_segmentation_tpu.export.stablehlo import export_stablehlo

    shlo_model = YOLO12Pose(fold_bn=True, dtype=jnp.float32)

    def _output0_fn(x_nchw):
        boxes, scores, kpts = shlo_model.apply(
            {"params": folded}, jnp.transpose(x_nchw, (0, 2, 3, 1)),
            train=False,
        )
        b = jnp.moveaxis(boxes, 1, 2)
        sc = jnp.moveaxis(scores, 1, 2)
        kk = jnp.transpose(kpts, (0, 2, 3, 1)).reshape(
            x_nchw.shape[0], -1, b.shape[2]
        )
        return jnp.concatenate([b, sc, kk], axis=1)

    shlo_path = os.path.join(args.output_dir, "yolo.stablehlo")
    with jax.default_matmul_precision("float32"):
        shlo_info = export_stablehlo(
            _output0_fn, (jnp.zeros((1, 3, size, size), jnp.float32),),
            shlo_path, platforms=("cpu", "tpu"),
        )
    print(f"yolo.stablehlo ({shlo_info['bytes'] / 1e6:.1f} MB, self-test "
          f"max|diff|={shlo_info['self_test_max_diff']:.2e} "
          f"{'PASS' if shlo_info['self_test_pass'] else 'FAIL'})")

    atol32, atol16 = 2e-3, 1.0
    parity = {}
    if not args.skip_verify:
        folded_model = YOLO12Pose(fold_bn=True, dtype=jnp.float32)
        with jax.default_matmul_precision("float32"):
            rng = np.random.default_rng(0)
            x_nchw = rng.random((1, 3, size, size)).astype(np.float32)
            boxes, scores, kpts = jax.jit(
                lambda img: folded_model.apply({"params": folded}, img, train=False)
            )(jnp.asarray(np.transpose(x_nchw, (0, 2, 3, 1))))
            a = np.asarray(boxes)[0].T
            s = np.asarray(scores)[0].T
            kk = np.transpose(np.asarray(kpts)[0], (1, 2, 0)).reshape(-1, a.shape[1])
            ref = np.concatenate([a, s, kk], axis=0)[None]

            out32 = np.asarray(
                make_runner(op.Model.load(fp32_path))(jnp.asarray(x_nchw))
            )
            d32 = float(np.abs(out32 - ref).max())
            ok32 = d32 < atol32
            print(f"fp32 parity: max|diff|={d32:.2e} (< {atol32}) "
                  f"{'PASS' if ok32 else 'FAIL'}")
            out16 = np.asarray(
                make_runner(op.Model.load(fp16_path))(jnp.asarray(x_nchw))
            )
            # per-row-type gates (a uniform atol=1.0 would be vacuous for
            # the [0,1] probability rows): rows 0-3 boxes px, row 4 score,
            # kpt rows 5.. repeat (x px, y px, conf)
            n_rows = out16.shape[1]
            prob_rows = [4] + [i for i in range(5, n_rows) if (i - 5) % 3 == 2]
            px_rows = [i for i in range(n_rows) if i not in prob_rows]
            diff16 = np.abs(out16 - ref)
            d16_px = float(diff16[:, px_rows].max())
            d16_prob = float(diff16[:, prob_rows].max())
            d16 = float(diff16.max())
            ok16 = d16_px <= atol16 and d16_prob <= 1e-2
            print(f"fp16 parity: px max|diff|={d16_px:.2e} (< {atol16} px), "
                  f"prob max|diff|={d16_prob:.2e} (< 1e-2) "
                  f"{'PASS' if ok16 else 'FAIL'}")

            # independent torch-kernel re-execution (export_seg.py rationale)
            from mtg_card_image_segmentation_tpu.export import onnx_torch_runner

            got = onnx_torch_runner.run_model(
                op.Model.load(fp32_path), {"input": x_nchw}
            )["output0"]
            dt = float(np.abs(got - ref).max())
            okt = dt < atol32
            print(f"independent torch-runner parity: max|diff|={dt:.2e} "
                  f"{'PASS' if okt else 'FAIL'}")
            # int8 gate is FUNCTIONAL, on a synthetic card render with known
            # ground-truth corners: the int8 graph's client-decoded corner
            # error vs GT must not exceed the fp32 graph's by more than 2 px.
            # GT-relative (not decode-vs-decode) on purpose — on hard poses
            # the joint decode can collapse two corners onto one peak for
            # one graph and not the other, making a raw corner-shift gate
            # report a huge "diff" even when the int8 decode is the BETTER
            # one (observed: fp32 duplicated a corner, int8 recovered the
            # true quadrilateral, naive shift read 219 px).
            from mtg_card_image_segmentation_tpu.data.synthetic import (
                synthetic_batch,
            )
            from mtg_card_image_segmentation_tpu.export.yolo_client_decode import (
                decode as client_decode,
            )

            # negative_prob=0 + keep_in_frame: the probe must actually
            # contain an in-frame card for decoded corners to be meaningful
            probe = jax.jit(
                lambda key: synthetic_batch(
                    key, 1, size, size,
                    negative_prob=0.0, keep_in_frame=True,
                )
            )(jax.random.key(11))
            card01 = np.asarray(probe.image)
            gt = np.asarray(probe.corners[0], np.float64)  # (4,2) TL TR BR BL
            card_nchw = np.transpose(card01, (0, 3, 1, 2)).astype(np.float32)
            ref_card = np.asarray(
                make_runner(op.Model.load(fp32_path))(jnp.asarray(card_nchw))
            )
            out8 = np.asarray(
                make_runner(op.Model.load(int8_path))(jnp.asarray(card_nchw))
            )
            c_ref = np.asarray(client_decode(ref_card)[2][:, :2], np.float64)
            c_int8 = np.asarray(client_decode(out8)[2][:, :2], np.float64)
            err_ref = float(np.sqrt(((c_ref - gt) ** 2).sum(-1)).mean())
            err_int8 = float(np.sqrt(((c_int8 - gt) ** 2).sum(-1)).mean())
            ok8 = err_int8 <= err_ref + 2.0
            print(f"int8 parity: decoded corner error vs GT "
                  f"{err_int8:.2f} px (fp32 graph: {err_ref:.2f} px, "
                  f"gate <= +2) {'PASS' if ok8 else 'FAIL'}")
        parity = {
            "fp32_max_abs_diff": d32, "fp32_pass": bool(ok32),
            "fp16_max_abs_diff": d16, "fp16_px_max_abs_diff": d16_px,
            "fp16_prob_max_abs_diff": d16_prob, "fp16_pass": bool(ok16),
            "torch_runner_max_abs_diff": dt, "torch_runner_pass": bool(okt),
            "int8_corner_err_vs_gt_px": err_int8,
            "fp32_corner_err_vs_gt_px": err_ref,
            "int8_pass": bool(ok8),
        }
        import shutil
        import subprocess

        if shutil.which("protoc"):
            schema_dir = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "tools"
            )
            with open(fp32_path, "rb") as f:
                proc = subprocess.run(
                    ["protoc", f"-I{schema_dir}", "--decode=onnx.ModelProto",
                     "onnx_schema.proto"],
                    stdin=f, capture_output=True, text=True, timeout=120,
                )
            parity["protoc_decode_pass"] = proc.returncode == 0
            print("independent protoc decode: "
                  + ("PASS" if parity["protoc_decode_pass"]
                     else "FAIL: " + proc.stderr[:200]))
        okdyn = True
        if dyn_path:
            dyn_loaded = op.Model.load(dyn_path)
            dyn_results = {}
            with jax.default_matmul_precision("float32"):
                for nb in (1, 4):
                    xb = rng.random((nb, 3, size, size)).astype(np.float32)
                    boxes, scores, kpts = jax.jit(
                        lambda img: folded_model.apply(
                            {"params": folded}, img, train=False)
                    )(jnp.asarray(np.transpose(xb, (0, 2, 3, 1))))
                    bb = np.moveaxis(np.asarray(boxes), 1, 2)
                    sc = np.moveaxis(np.asarray(scores), 1, 2)
                    kk = np.transpose(np.asarray(kpts), (0, 2, 3, 1)).reshape(
                        nb, -1, bb.shape[2])
                    refb = np.concatenate([bb, sc, kk], axis=1)
                    outb = np.asarray(
                        make_runner(dyn_loaded)(jnp.asarray(xb)))
                    db = float(np.abs(outb - refb).max())
                    from mtg_card_image_segmentation_tpu.export import (
                        onnx_torch_runner as _otr,
                    )

                    dtb = float(np.abs(_otr.run_model(
                        dyn_loaded, {"input": xb})["output0"] - refb).max())
                    # torch-CPU conv algorithm selection changes with batch
                    # size, shifting fp32 accumulation order: measured
                    # 2.7e-3 at b4 vs 1.8e-3 at b1 on a trained checkpoint.
                    # Outputs are input-pixel coordinates on a 640 px scale,
                    # so 5e-3 px is ~8e-6 relative — far below any decode-
                    # visible effect. The spec-ordered mini executor keeps
                    # the tight gate.
                    okb = db < atol32 and dtb < 5e-3
                    okdyn = okdyn and okb
                    dyn_results[f"batch{nb}"] = {
                        "mini_max_abs_diff": db,
                        "torch_runner_max_abs_diff": dtb,
                        "pass": bool(okb),
                    }
                    print(f"dynamic-batch parity b{nb}: mini={db:.2e} "
                          f"torch={dtb:.2e} {'PASS' if okb else 'FAIL'}")
            parity["dynamic_batch"] = dyn_results
        if not (ok32 and ok16 and okt and ok8 and okdyn):
            raise SystemExit("parity gate FAILED")

    info = {
        "model": "yolo12n_pose",
        "input": {"name": "input", "shape": [1, 3, size, size],
                  "dtype": "float32", "normalization": "/255 only"},
        "output": {
            "name": "output0",
            "shape": [1, 17, sum((size // s) ** 2 for s in (8, 16, 32))],
            "rows": "[x1,y1,x2,y2,score,(kx,ky,kconf)x4] in input pixels",
            "decode": "use decode_yolo.py (shipped alongside): joint decode "
                      "over 3 greedy-NMS peaks per corner channel with "
                      "collision penalty + canonical reordering — a naive "
                      "per-channel argmax regresses to corner-identity "
                      "swaps on ~2% of rotated cards",
        },
        "parameters": count_parameters(params),
        "opset": 19,
        "stablehlo": shlo_info,
        "dynamic_batch_artifact": os.path.basename(dyn_path) if dyn_path else None,
        "checkpoint_epoch": meta.get("epoch"),
        "best_metric": meta.get("best_metric"),
        "parity": parity,
    }
    with open(os.path.join(args.output_dir, "yolo_info.json"), "w") as f:
        json.dump(info, f, indent=2)
    # ship the reference client decode (numpy-only): the raw graph output
    # needs the joint corner decode to reach the reported accuracy
    import shutil as _shutil

    from mtg_card_image_segmentation_tpu.export import yolo_client_decode

    _shutil.copyfile(
        yolo_client_decode.__file__,
        os.path.join(args.output_dir, "decode_yolo.py"),
    )
    print(f"deployment package -> {args.output_dir}/")


if __name__ == "__main__":
    main()
