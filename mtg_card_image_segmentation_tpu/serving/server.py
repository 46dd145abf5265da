"""HTTP serving (reference demo.py parity + a native TPU inference API).

The reference's server is a FastAPI static mount: /models -> exported ONNX
files, / -> the browser demo (demo.py:16-24); all inference happens in the
browser via ONNX Runtime Web. This server reproduces that on the stdlib
(no fastapi in this environment) and ADDS a server-side TPU path:

    GET  /                      demo client (static)
    GET  /models/<file>         exported ONNX models (static)
    GET  /healthz               liveness + model info
    POST /api/segment           image bytes (jpg/png) -> JSON {mask_png_b64,
                                card_fraction, inference_ms} via SegPredictor

so deployments can choose browser-local ONNX inference or batched TPU
inference behind the same origin.
"""

from __future__ import annotations

import base64
import io
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

_CONTENT_TYPES = {
    ".html": "text/html",
    ".js": "application/javascript",
    ".css": "text/css",
    ".json": "application/json",
    ".onnx": "application/octet-stream",
    ".png": "image/png",
    ".jpg": "image/jpeg",
    ".npz": "application/octet-stream",
    ".md": "text/markdown",
}


def make_handler(demo_dir: str, models_dir: str, predictor=None, model_hw=None,
                 pose_predictor=None, pose_hw=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str = "application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Access-Control-Allow-Origin", "*")
            self.end_headers()
            if self.command != "HEAD":
                self.wfile.write(body)

        def _serve_static(self, root: str, rel: str):
            rel = rel.split("?", 1)[0].split("#", 1)[0]
            root_abs = os.path.abspath(root)
            path = os.path.normpath(os.path.join(root_abs, rel.lstrip("/")))
            # trailing-sep compare: a sibling dir whose name merely extends
            # the root (exported_models_old vs exported_models) must not pass
            if path != root_abs and not path.startswith(root_abs + os.sep):
                return self._send(403, b'{"error": "forbidden"}')
            if os.path.isdir(path):
                path = os.path.join(path, "index.html")
            if not os.path.isfile(path):
                return self._send(404, b'{"error": "not found"}')
            ext = os.path.splitext(path)[1].lower()
            with open(path, "rb") as f:
                self._send(200, f.read(), _CONTENT_TYPES.get(ext, "application/octet-stream"))

        def do_HEAD(self):
            # same routing as GET; _send suppresses the body for HEAD
            self.do_GET()

        def do_GET(self):
            if self.path.startswith("/healthz"):
                info = {
                    "status": "ok",
                    "tpu_inference": predictor is not None,
                    "model_hw": model_hw,
                    "models": sorted(os.listdir(models_dir))
                    if os.path.isdir(models_dir)
                    else [],
                }
                return self._send(200, json.dumps(info).encode())
            if self.path.startswith("/models/"):
                return self._serve_static(models_dir, self.path[len("/models/") :])
            return self._serve_static(demo_dir, self.path)

        def do_POST(self):
            if self.path == "/api/corners":
                return self._post_corners()
            if self.path != "/api/segment":
                return self._send(404, b'{"error": "not found"}')
            if predictor is None:
                return self._send(
                    503, b'{"error": "TPU predictor not loaded (start with --checkpoint)"}'
                )
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0 or length > 32 * 1024 * 1024:
                return self._send(400, b'{"error": "bad content length"}')
            data = self.rfile.read(length)
            try:
                import cv2
                import numpy as np

                arr = np.frombuffer(data, np.uint8)
                img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
                if img is None:
                    raise ValueError("undecodable image")
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                h, w = model_hw
                img = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
                t0 = time.perf_counter()
                mask = np.asarray(predictor.predict(img[None]))[0]
                dt = (time.perf_counter() - t0) * 1e3
                ok, png = cv2.imencode(".png", mask * 255)
                body = json.dumps(
                    {
                        "mask_png_b64": base64.b64encode(png.tobytes()).decode(),
                        "card_fraction": float(mask.mean()),
                        "inference_ms": round(dt, 2),
                        "shape": [int(h), int(w)],
                    }
                ).encode()
                return self._send(200, body)
            except Exception as e:  # noqa: BLE001
                return self._send(400, json.dumps({"error": str(e)}).encode())

        def _post_corners(self):
            """TPU corner detection (PosePredictor): image bytes -> JSON
            {corners: [[x, y], ...] in ORIGINAL image pixels, confidences,
            valid, inference_ms} — the reference inference_test.py flow
            (preprocess, peaks, scale-to-original) behind one endpoint."""
            if pose_predictor is None:
                return self._send(
                    503,
                    b'{"error": "pose predictor not loaded '
                    b'(start with --pose-checkpoint)"}',
                )
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0 or length > 32 * 1024 * 1024:
                return self._send(400, b'{"error": "bad content length"}')
            data = self.rfile.read(length)
            try:
                import cv2
                import numpy as np

                arr = np.frombuffer(data, np.uint8)
                img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
                if img is None:
                    raise ValueError("undecodable image")
                img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                oh, ow = img.shape[:2]
                h, w = pose_hw
                img_r = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
                t0 = time.perf_counter()
                px, conf, valid = pose_predictor.predict_valid(img_r[None])
                dt = (time.perf_counter() - t0) * 1e3
                # scale back to the original image (inference_test.py
                # scale-to-original step); the predictor knows its own
                # coordinate convention (HRNet align-corners vs YOLO
                # half-pixel)
                px = pose_predictor.scale_to_original(
                    np.asarray(px)[0], (oh, ow)
                )
                body = json.dumps(
                    {
                        "corners": [[round(float(x), 2), round(float(y), 2)]
                                    for x, y in px],
                        "confidences": [round(float(c), 4)
                                        for c in np.asarray(conf)[0]],
                        "valid": [bool(v) for v in np.asarray(valid)[0]],
                        "inference_ms": round(dt, 2),
                        "image_shape": [int(oh), int(ow)],
                    }
                ).encode()
                return self._send(200, body)
            except Exception as e:  # noqa: BLE001
                return self._send(400, json.dumps({"error": str(e)}).encode())

    return Handler


class DemoServer:
    def __init__(
        self,
        demo_dir: str,
        models_dir: str,
        port: int = 5000,
        checkpoint: Optional[str] = None,
        height: int = 320,
        width: int = 240,
        pose_checkpoint: Optional[str] = None,
        pose_height: int = 480,
        pose_width: int = 640,
        pose_family: str = "hrnet",
    ) -> None:
        predictor = None
        if checkpoint:
            from mtg_card_image_segmentation_tpu.serving.predictor import SegPredictor

            ckpt_dir, name = os.path.split(os.path.normpath(checkpoint))
            predictor = SegPredictor.from_checkpoint(
                ckpt_dir or ".", name, height, width
            )
        pose_predictor = None
        if pose_checkpoint:
            ckpt_dir, name = os.path.split(os.path.normpath(pose_checkpoint))
            if pose_family == "yolo":
                from mtg_card_image_segmentation_tpu.serving.pose_predictor import (
                    YoloCornerPredictor,
                )

                # YOLO runs on square inputs (*_yolo12n imgsz semantics)
                pose_height = pose_width = max(pose_height, pose_width)
                pose_predictor = YoloCornerPredictor.from_checkpoint(
                    ckpt_dir or ".", name, imgsz=pose_height
                )
            else:
                from mtg_card_image_segmentation_tpu.serving.pose_predictor import (
                    PosePredictor,
                )

                pose_predictor = PosePredictor.from_checkpoint(
                    ckpt_dir or ".", name, pose_height, pose_width
                )
        handler = make_handler(
            os.path.abspath(demo_dir), os.path.abspath(models_dir),
            predictor, (height, width),
            pose_predictor, (pose_height, pose_width),
        )
        self.httpd = ThreadingHTTPServer(("0.0.0.0", port), handler)
        self.port = port

    def serve_forever(self):
        print(f"serving demo on http://localhost:{self.port} "
              f"(/, /models, /healthz, POST /api/segment)")
        self.httpd.serve_forever()

    def start_background(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.httpd.shutdown()


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--demo-dir", default="demo")
    parser.add_argument("--models-dir", default="exported_models")
    parser.add_argument("--checkpoint", default=None,
                        help="enable the TPU /api/segment endpoint")
    parser.add_argument("--height", type=int, default=320)
    parser.add_argument("--width", type=int, default=240)
    parser.add_argument("--pose-checkpoint", default=None,
                        help="enable the TPU /api/corners endpoint")
    parser.add_argument("--pose-height", type=int, default=480)
    parser.add_argument("--pose-width", type=int, default=640)
    parser.add_argument("--pose-family", choices=["hrnet", "yolo"],
                        default="hrnet",
                        help="which corner model the checkpoint holds "
                             "(yolo uses square imgsz = max(h, w))")
    args = parser.parse_args()
    DemoServer(
        args.demo_dir, args.models_dir, args.port, args.checkpoint,
        args.height, args.width,
        args.pose_checkpoint, args.pose_height, args.pose_width,
        args.pose_family,
    ).serve_forever()


if __name__ == "__main__":
    main()
