"""Corner-keypoint evaluator: distance-threshold metrics + report generation.

Behavioral spec: train-pose-estimation_yolo12n/evaluate_model.py — Euclidean
errors :135-158, accuracy@{5,10,20}px :160-185, per-corner accuracy
:187-217, detection rate / mean/median/std / inference-time tracking
:219-326, JSON + plots + text report :489-668 — plus the custom pipeline's
3px/6px metrics (train-pose-estimation_custom/metrics.py:89-102).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import numpy as np

from mtg_card_image_segmentation_tpu.evaluation.worstk import (
    fresh_failures_dir,
    merge_worst_k,
)
from mtg_card_image_segmentation_tpu.ops import heatmap as hm_lib

CORNER_NAMES = ("top_left", "top_right", "bottom_right", "bottom_left")


class PoseEvaluator:
    def __init__(
        self,
        apply_fn,
        variables,
        image_hw: tuple[int, int],
        peak_threshold: float = 0.3,
        thresholds: Sequence[float] = (3.0, 5.0, 6.0, 10.0, 20.0),
        predict_step=None,
    ) -> None:
        """``predict_step(variables, images) -> (corners_px (B,4,2), conf
        (B,4))`` overrides the default heatmap argmax decode — the YOLO
        evaluator plugs its detection decode in through this."""
        self.variables = variables
        self.image_hw = image_hw
        self.thresholds = tuple(thresholds)
        self.peak_threshold = peak_threshold

        if predict_step is None:

            @jax.jit
            def predict_step(variables, images):
                heatmaps = apply_fn(variables, images, train=False)
                # independent sub-pixel decode, with a per-image
                # plausibility-gated fallback to the joint-NMS assignment
                # (kills the corner-identity tail without costing the mean)
                coords01, conf = hm_lib.decode_argmax_subpixel_gated(heatmaps)
                px = hm_lib.coords01_to_pixels(coords01, image_hw)
                return px, conf

        self._step = predict_step

    def evaluate(
        self,
        batches: Iterable,  # (images, _, corners_px) or (images, corners_px)
        output_dir: Optional[str] = None,
        worst_k: int = 8,
    ) -> Dict:
        all_err: List[np.ndarray] = []
        all_conf: List[np.ndarray] = []
        times: List[float] = []
        # running worst-k by max corner error: (max_err, global_idx, img, gt, pred)
        worst: List[tuple] = []
        seen = 0
        warmed_up = False
        for batch in batches:
            images, corners = batch[0], batch[-1]
            if not warmed_up:
                # untimed warmup: the first call pays JIT compilation
                # (minutes on the remote-compile relay) and must not enter
                # mean_inference_time_ms_per_image
                np.asarray(self._step(self.variables, images)[0])
                warmed_up = True
            t0 = time.perf_counter()
            px, conf = self._step(self.variables, images)
            px = np.asarray(px)  # host materialization = honest timing fence
            times.append((time.perf_counter() - t0) / images.shape[0])
            conf = np.asarray(conf)
            c = np.asarray(corners)
            err = np.sqrt(((px - c) ** 2).sum(-1))
            all_err.append(err)
            all_conf.append(conf)
            if worst_k > 0:
                per_img = err.max(axis=1)

                # error-descending candidates; images are only pulled to
                # host for cases that actually enter the buffer
                def _entry(i, base=seen):
                    return lambda: (
                        base + int(i),
                        np.asarray(images[int(i)]),
                        c[int(i)],
                        px[int(i)],
                    )

                merge_worst_k(
                    worst,
                    (
                        (float(per_img[i]), _entry(i))
                        for i in np.argsort(-per_img)[:worst_k]
                    ),
                    worst_k,
                    reverse=True,
                )
            seen += int(err.shape[0])

        err = np.concatenate(all_err)  # (N, 4)
        conf = np.concatenate(all_conf)
        detected = conf >= self.peak_threshold

        report: Dict = {
            "platform": jax.devices()[0].platform,  # where timing was measured
            "num_images": int(err.shape[0]),
            "mean_error_px": float(err.mean()),
            "median_error_px": float(np.median(err)),
            "std_error_px": float(err.std()),
            "detection_rate": float(detected.all(axis=1).mean()),
            "mean_inference_time_ms_per_image": float(np.mean(times) * 1e3),
            "per_corner": {},
        }
        for t in self.thresholds:
            report[f"accuracy_{int(t)}px"] = float((err <= t).mean() * 100.0)
        for k, name in enumerate(CORNER_NAMES):
            report["per_corner"][name] = {
                "mean_error_px": float(err[:, k].mean()),
                **{
                    f"accuracy_{int(t)}px": float((err[:, k] <= t).mean() * 100.0)
                    for t in self.thresholds
                },
            }
        # reference quality tiers (*_yolo12n/README.md:163-171)
        report["tiers"] = {
            "acc5_target>80": report["accuracy_5px"] > 80,
            "acc10_target>90": report["accuracy_10px"] > 90,
            "acc20_target>95": report["accuracy_20px"] > 95,
            "mean_err_target<8px": report["mean_error_px"] < 8,
        }

        report["worst_cases"] = [
            {"index": idx, "max_error_px": e} for e, idx, *_ in worst
        ]

        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            # wiped every run: stale worst-k panels from a previous decode
            # must not sit next to the regenerated ones
            fdir = fresh_failures_dir(output_dir)
            if worst:
                # viewable GT-vs-pred corner panels for the worst cases —
                # the pose analog of the seg failure images
                # (train/evaluate.py:240-295)
                for rank, (e, idx, img, gt, pred) in enumerate(worst):
                    path = os.path.join(fdir, f"worst_{rank:02d}_err{e:.1f}px.png")
                    self._plot_corner_panel(img, gt, pred, e, path)
                    report["worst_cases"][rank]["panel"] = os.path.relpath(
                        path, output_dir
                    )
            with open(os.path.join(output_dir, "pose_evaluation.json"), "w") as f:
                json.dump(report, f, indent=2)
            self._write_text_report(report, os.path.join(output_dir, "report.txt"))
            self._plot_error_distribution(
                err, os.path.join(output_dir, "error_distribution.png")
            )
            self._plot_accuracy_curve(
                err, os.path.join(output_dir, "accuracy_curve.png")
            )
        return report

    @staticmethod
    def _plot_accuracy_curve(err: np.ndarray, path: str) -> None:
        """Accuracy-vs-threshold sweep, overall + per corner (the reference
        evaluator's accuracy/per-corner plots, evaluate_model.py:489-668)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ts = np.linspace(0.0, 20.0, 81)
        fig, ax = plt.subplots(figsize=(7, 4.5))
        for k, name in enumerate(CORNER_NAMES):
            acc = [(err[:, k] <= t).mean() * 100.0 for t in ts]
            ax.plot(ts, acc, lw=1, alpha=0.7, label=name)
        overall = [(err <= t).mean() * 100.0 for t in ts]
        ax.plot(ts, overall, "k-", lw=2, label="overall")
        for t in (5.0, 10.0):
            ax.axvline(t, color="gray", ls=":", lw=0.8)
        ax.set_xlabel("error threshold (px)")
        ax.set_ylabel("accuracy (%)")
        ax.set_ylim(0, 102)
        ax.legend(fontsize=8)
        ax.set_title("corner accuracy vs threshold")
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)

    @staticmethod
    def _plot_corner_panel(
        img: np.ndarray, gt: np.ndarray, pred: np.ndarray, max_err: float, path: str
    ) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        disp = np.clip(np.asarray(img, np.float32), 0.0, 1.0)
        fig, ax = plt.subplots(figsize=(5, 6))
        ax.imshow(disp)
        gt_closed = np.vstack([gt, gt[:1]])
        pr_closed = np.vstack([pred, pred[:1]])
        ax.plot(gt_closed[:, 0], gt_closed[:, 1], "g-o", ms=4, label="ground truth")
        ax.plot(pr_closed[:, 0], pr_closed[:, 1], "r--x", ms=6, label="prediction")
        for k, name in enumerate(CORNER_NAMES):
            d = float(np.sqrt(((pred[k] - gt[k]) ** 2).sum()))
            ax.annotate(
                f"{name}: {d:.1f}px", pred[k], color="r", fontsize=7,
                xytext=(4, 4), textcoords="offset points",
            )
        ax.set_title(f"max corner error {max_err:.1f}px")
        ax.legend(loc="lower right", fontsize=8)
        ax.set_axis_off()
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)

    @staticmethod
    def _write_text_report(report: Dict, path: str) -> None:
        lines = [
            "CORNER DETECTION EVALUATION",
            "=" * 40,
            f"images:          {report['num_images']}",
            f"mean error:      {report['mean_error_px']:.2f} px",
            f"median error:    {report['median_error_px']:.2f} px",
            f"detection rate:  {report['detection_rate'] * 100:.1f}%",
            f"inference time:  {report['mean_inference_time_ms_per_image']:.2f} ms/img",
            "",
        ]
        for key in sorted(k for k in report if k.startswith("accuracy_")):
            lines.append(f"{key}: {report[key]:.1f}%")
        lines.append("")
        for name, d in report["per_corner"].items():
            lines.append(f"{name}: mean {d['mean_error_px']:.2f}px")
        with open(path, "w") as f:
            f.write("\n".join(lines))

    @staticmethod
    def _plot_error_distribution(err: np.ndarray, path: str) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        axes[0].hist(err.ravel(), bins=40)
        axes[0].set_title("corner error (px)")
        axes[1].boxplot(
            [err[:, k] for k in range(err.shape[1])], tick_labels=list(CORNER_NAMES)
        )
        axes[1].tick_params(axis="x", rotation=20)
        axes[1].set_title("per-corner error")
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)


def yolo_predict_step(apply_fn):
    """Build the YOLO corner-prediction step for :class:`PoseEvaluator`:
    run the decoded model (boxes/scores/kpts), take the top-1 detection
    (max_det=1, *_yolo12n/model.py:215-264), return its 4 keypoints as
    corner pixels with the detection confidence per corner.

    Mirrors evaluate_model.py:74-133 (per-image predict -> best box ->
    keypoints) as one jitted batch step.
    """
    from mtg_card_image_segmentation_tpu.models.yolo12_pose import top1_detection

    @jax.jit
    def step(variables, images):
        boxes, scores, kpts = apply_fn(variables, images, train=False)
        _, conf, kk = top1_detection(boxes, scores, kpts)
        px = kk[..., :2]  # (B, 4, 2) in input-pixel space
        conf4 = jax.numpy.broadcast_to(conf[:, None], px.shape[:2])
        return px, conf4

    return step


class CornerEvaluator(PoseEvaluator):
    """YOLO-family corner evaluator (reference CornerEvaluator,
    *_yolo12n/evaluate_model.py:42-326): same distance-threshold report
    schema as the heatmap evaluator, fed by the YOLO detection decode."""

    def __init__(
        self,
        apply_fn,
        variables,
        image_hw: tuple[int, int],
        conf_threshold: float = 0.25,
        thresholds: Sequence[float] = (3.0, 5.0, 6.0, 10.0, 20.0),
    ) -> None:
        super().__init__(
            apply_fn=None,
            variables=variables,
            image_hw=image_hw,
            peak_threshold=conf_threshold,
            thresholds=thresholds,
            predict_step=yolo_predict_step(apply_fn),
        )
