"""DemoServer HTTP surface (serving/server.py): static containment,
/healthz, and the TPU inference endpoints /api/segment + /api/corners
(driven with stub predictors — the real predictors are covered by
test_serving.py; here we verify the HTTP contract)."""

import base64
import http.client
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from mtg_card_image_segmentation_tpu.serving.server import make_handler  # noqa: E402


class _StubSeg:
    def predict(self, imgs):
        b, h, w, _ = imgs.shape
        m = np.zeros((b, h, w), np.uint8)
        m[:, : h // 2] = 1
        return m


class _StubPose:
    height, width = 64, 96

    def predict_valid(self, imgs):
        b = imgs.shape[0]
        px = np.tile(np.asarray([[10.0, 20.0], [30.0, 20.0],
                                 [30.0, 40.0], [10.0, 40.0]], np.float32),
                     (b, 1, 1))
        conf = np.full((b, 4), 0.9, np.float32)
        return px, conf, conf >= 0.3

    def scale_to_original(self, px, original_hw):
        # align-corners convention (= PosePredictor.scale_to_original)
        oh, ow = original_hw
        return px * np.asarray(
            [(ow - 1) / (self.width - 1), (oh - 1) / (self.height - 1)],
            np.float32,
        )


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from http.server import ThreadingHTTPServer
    import threading

    demo_dir = tmp_path_factory.mktemp("demo")
    models_dir = tmp_path_factory.mktemp("models")
    (demo_dir / "index.html").write_text("<html>demo</html>")
    (demo_dir / "secret_sibling").mkdir()

    handler = make_handler(
        str(demo_dir), str(models_dir), _StubSeg(), (32, 24),
        _StubPose(), (64, 96),
    )
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address[1]
    httpd.shutdown()


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", path, body=body,
                 headers={"Content-Length": str(len(body))})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, data


def _jpg_bytes(h=48, w=64):
    img = np.random.default_rng(0).integers(0, 256, (h, w, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".jpg", img)
    assert ok
    return buf.tobytes()


def test_static_and_healthz(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/")
    assert conn.getresponse().read() == b"<html>demo</html>"
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    assert resp.status == 200
    json.loads(resp.read())
    # path containment: no escaping the demo root
    conn.request("GET", "/../secret_sibling/")
    assert conn.getresponse().status in (400, 403, 404)
    conn.close()


def test_api_segment(server):
    status, data = _post(server, "/api/segment", _jpg_bytes())
    assert status == 200, data
    body = json.loads(data)
    assert body["shape"] == [32, 24]
    assert 0.0 <= body["card_fraction"] <= 1.0
    png = base64.b64decode(body["mask_png_b64"])
    mask = cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (32, 24)


def test_api_corners(server):
    status, data = _post(server, "/api/corners", _jpg_bytes(h=48, w=64))
    assert status == 200, data
    body = json.loads(data)
    assert len(body["corners"]) == 4
    assert body["valid"] == [True] * 4
    assert body["image_shape"] == [48, 64]
    # scale-to-original: model coords were for (64, 96); e.g. x=10 on
    # width 96 -> 10 * (64-1)/(96-1)
    assert abs(body["corners"][0][0] - 10 * 63 / 95) < 0.05
    assert abs(body["corners"][0][1] - 20 * 47 / 63) < 0.05


def test_api_corners_bad_image(server):
    status, data = _post(server, "/api/corners", b"not an image")
    assert status == 400
    assert "error" in json.loads(data)
