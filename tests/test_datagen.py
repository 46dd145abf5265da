"""Dataset generation: corner derivation vs renderer ground truth, YOLO
conversion, watchdog, downloader plumbing (stub sessions — zero egress)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from mtg_card_image_segmentation_tpu.data.corners import (
    create_yolo_annotations,
    find_card_corners,
    order_corners,
    process_dataset,
)
from mtg_card_image_segmentation_tpu.data.synthetic import synthetic_sample
from mtg_card_image_segmentation_tpu.datagen.watchdog import run_with_watchdog

cv2 = pytest.importorskip("cv2")


def test_order_corners():
    pts = np.array([[100, 10], [10, 10], [10, 100], [100, 100]], np.float32)
    out = order_corners(pts)
    np.testing.assert_array_equal(out[0], [10, 10])  # TL
    np.testing.assert_array_equal(out[1], [100, 10])  # TR
    np.testing.assert_array_equal(out[2], [100, 100])  # BR
    np.testing.assert_array_equal(out[3], [10, 100])  # BL


def _aligned_error(derived: np.ndarray, gt: np.ndarray) -> float:
    """Min max-corner distance over cyclic rotations/reflection: the
    renderer emits CARD-frame order (semantic card-TL under any rotation)
    while mask derivation can only order in IMAGE frame — the quads must
    match as point cycles."""
    best = np.inf
    for flip in (gt, gt[::-1]):
        for r in range(4):
            cand = np.roll(flip, r, axis=0)
            best = min(best, float(np.abs(derived - cand).max()))
    return best


def test_find_card_corners_matches_renderer():
    """Derived quad vs the renderer's exact corners: within a few px after
    cyclic alignment."""
    hits = 0
    total = 0
    for seed in range(8):
        s = synthetic_sample(jax.random.key(seed), 160, 120, 0.0)
        mask = np.asarray(s.mask, np.uint8) * 255
        gt = np.asarray(s.corners)
        in_frame = ((gt[:, 0] >= 2) & (gt[:, 0] <= 117) & (gt[:, 1] >= 2) & (gt[:, 1] <= 157)).all()
        if not in_frame or mask.sum() < 255 * 100:
            continue
        total += 1
        corners = find_card_corners(mask)
        if corners is None:
            continue
        if _aligned_error(corners, gt) < 6.0:
            hits += 1
    assert total >= 2
    assert hits >= total - 1, f"{hits}/{total} derivations within 6px"


def test_find_corners_empty_mask():
    assert find_card_corners(np.zeros((64, 64), np.uint8)) is None


def test_process_dataset_and_yolo_conversion(tmp_path):
    root = tmp_path / "ds"
    for split in ("train", "test"):
        (root / split / "images").mkdir(parents=True)
        (root / split / "masks").mkdir(parents=True)
    # two synthetic samples per split
    for split, seeds in (("train", (0, 1)), ("test", (2,))):
        for seed in seeds:
            s = synthetic_sample(jax.random.key(seed), 96, 72, 0.0)
            img = (np.asarray(s.image) * 255).astype(np.uint8)
            name = f"img_{seed}"
            cv2.imwrite(str(root / split / "images" / f"{name}.jpg"),
                        cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
            cv2.imwrite(str(root / split / "masks" / f"{name}.png"),
                        np.asarray(s.mask, np.uint8) * 255)
    ann = process_dataset(str(root))
    assert set(ann) == {"train", "test"}
    assert len(ann["train"]) >= 1
    assert (root / "corner_annotations.json").is_file()
    for items in ann.values():
        for corners in items.values():
            assert np.asarray(corners).shape == (4, 2)

    yolo_root = tmp_path / "yolo"
    yaml_path = create_yolo_annotations(str(root), str(yolo_root), ann)
    assert os.path.exists(yaml_path)
    yaml_text = open(yaml_path).read()
    assert "kpt_shape: [4, 3]" in yaml_text
    assert "flip_idx: [1, 0, 3, 2]" in yaml_text
    labels = list((yolo_root / "train" / "labels").glob("*.txt"))
    assert labels
    parts = labels[0].read_text().split()
    assert parts[0] == "0" and len(parts) == 1 + 4 + 4 * 3
    vals = np.asarray(parts[1:], np.float32)
    assert (vals[vals != 2.0] <= 1.0).all() and (vals >= 0).all()


def test_watchdog_restarts_then_succeeds(tmp_path):
    flag = tmp_path / "ran"
    # first run sleeps forever (killed); a marker makes the second run exit 0
    script = tmp_path / "job.py"
    script.write_text(
        "import os, sys, time\n"
        f"flag = {str(flag)!r}\n"
        "if os.path.exists(flag):\n"
        "    sys.exit(0)\n"
        "open(flag, 'w').write('x')\n"
        "time.sleep(60)\n"
    )
    logs = []
    # timeout must exceed interpreter startup (~3s here: a sitecustomize
    # imports jax into every python process)
    code = run_with_watchdog(
        [sys.executable, "-S", str(script)], timeout_minutes=10 / 60,
        grace_seconds=1, max_restarts=3, log=logs.append,
    )
    assert code == 0
    assert any("restarting" in m for m in logs)


class _StubResponse:
    def __init__(self, payload=None, content=b"x"):
        self.status_code = 200
        self._payload = payload
        self.content = content

    def json(self):
        return self._payload


class _StubSession:
    """Offline Scryfall stub: two pages of search results."""

    def __init__(self):
        self.calls = []

    def get(self, url, timeout=None, **kw):
        self.calls.append(url)
        if "cards/search" in url:
            page2 = "page2" in url
            kind = "n" if "-is%3Afullart" in url else "f"
            data = [
                {"name": f"Card {kind}{i}{page2}",
                 "id": f"id_{kind}{i}{page2}",
                 "highres_image": True,
                 "image_uris": {"large": f"http://img/{i}"}}
                for i in range(5)
            ]
            return _StubResponse(
                {"data": data, "has_more": not page2,
                 "next_page": url + "&page2"}
            )
        return _StubResponse(content=b"JPEGDATA")


def test_scryfall_downloader_with_stub(tmp_path):
    from mtg_card_image_segmentation_tpu.datagen.downloaders import ScryfallDownloader

    dl = ScryfallDownloader(
        str(tmp_path), train_count=6, test_count=2, session=_StubSession()
    )
    counts = dl.download()
    assert counts["train"] == 6 and counts["test"] == 2
    train_files = os.listdir(tmp_path / "train")
    assert len(train_files) == 6
    # resume: second run re-counts without re-downloading
    counts2 = dl.download()
    assert counts2["train"] == 6


def test_downloader_offline_errors():
    from mtg_card_image_segmentation_tpu.datagen.downloaders import _HttpClient

    client = _HttpClient(session=None)
    client.session = None
    with pytest.raises(RuntimeError, match="no HTTP session"):
        client.get("http://example.com")


class _InpaintStubSession:
    """Offline Workers AI stub: records the payload, returns PNG-ish bytes."""

    def __init__(self):
        self.payloads = []

    def post(self, url, json=None, headers=None, timeout=None):
        self.payloads.append({"url": url, "json": json, "headers": headers})
        return _StubResponse(content=b"\x89PNG-generated")


def test_cloudflare_inpainter_stub(tmp_path):
    """Behavioral parity with dataset_generator/augmentation.py:60-125:
    image+inverted-mask payload, randomized prompt, bearer auth."""
    from PIL import Image

    from mtg_card_image_segmentation_tpu.datagen.inpaint import (
        CloudflareInpainter,
        random_prompt,
    )

    img = np.zeros((8, 8, 3), np.uint8) + 200
    mask = np.zeros((8, 8), np.uint8)
    mask[2:6, 2:6] = 255
    sess = _InpaintStubSession()
    ip = CloudflareInpainter(account_id="acct", api_token="tok", session=sess)
    out = ip.inpaint_background(img, mask, seed=7)
    assert out.startswith(b"\x89PNG")
    p = sess.payloads[0]
    assert "acct" in p["url"] and "stable-diffusion" in p["url"]
    assert p["headers"]["Authorization"] == "Bearer tok"
    body = p["json"]
    assert isinstance(body["image"], list) and isinstance(body["mask"], list)
    assert body["seed"] == 7 and body["prompt"]
    # mask was inverted: card interior (white in input) must decode to black
    inv = np.asarray(Image.open(__import__("io").BytesIO(bytes(body["mask"]))))
    assert inv[4, 4] == 0 and inv[0, 0] == 255
    # three-part prompt structure
    assert random_prompt().count(",") == 2


def test_procedural_inpaint_preserves_card():
    from mtg_card_image_segmentation_tpu.datagen.inpaint import procedural_inpaint

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (32, 24, 3), np.uint8)
    mask = np.zeros((32, 24), np.uint8)
    mask[8:20, 6:18] = 1
    out = procedural_inpaint(img, mask, seed=1)
    assert out.shape == img.shape and out.dtype == np.uint8
    # card pixels untouched, background replaced (statistically)
    np.testing.assert_array_equal(out[mask > 0], img[mask > 0])
    assert (out[mask == 0] != img[mask == 0]).mean() > 0.9
