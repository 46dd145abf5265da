"""Serving fast-path algebra tests (CPU, fp32).

The SegPredictor collapses the LR-ASPP head into a single-channel stride-8
score map and folds uint8+ImageNet normalization into the stem conv
(serving/predictor.py). These tests pin the two transformations against the
reference-shaped modules. Full uint8->mask predictor parity additionally
runs on real TPU hardware (bench.py path).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_head_score_s8_matches_lraspp_head():
    from mtg_card_image_segmentation_tpu.models.lraspp import LRASPPHead
    from mtg_card_image_segmentation_tpu.serving.predictor import _head_score_s8

    head = LRASPPHead(fold_bn=True, dtype=jnp.float32, param_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    low = jnp.asarray(rng.standard_normal((2, 16, 12, 40)), jnp.float32)
    high = jnp.asarray(rng.standard_normal((2, 8, 6, 960)), jnp.float32)
    variables = head.init(jax.random.key(0), low, high)

    logits = head.apply(variables, low, high)  # (B, 16, 12, 2)
    want = np.asarray(logits[..., 1] - logits[..., 0])
    got = np.asarray(
        _head_score_s8(variables["params"], low, high, jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fold_normalize_into_stem():
    from mtg_card_image_segmentation_tpu.models.layers import ConvBNAct
    from mtg_card_image_segmentation_tpu.serving.predictor import (
        _IMAGENET_MEAN,
        _IMAGENET_STD,
        _fold_normalize_into_stem,
    )

    stem = ConvBNAct(16, 3, stride=2, act="hardswish", fold_bn=True,
                     dtype=jnp.float32, param_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (2, 32, 24, 3)).astype(np.uint8)
    x_ex = jnp.zeros((1, 32, 24, 3), jnp.float32)
    v = stem.init(jax.random.key(1), x_ex)

    x_norm = (u8.astype(np.float32) / 255.0 - _IMAGENET_MEAN) / _IMAGENET_STD
    want = np.asarray(stem.apply(v, jnp.asarray(x_norm)))

    params = {"backbone": {"stem": v["params"]}}
    folded = _fold_normalize_into_stem(params)
    v2 = {"params": jax.tree.map(jnp.asarray, folded["backbone"]["stem"])}
    centered = jnp.asarray(u8.astype(np.float32) - 255.0 * _IMAGENET_MEAN)
    got = np.asarray(stem.apply(v2, centered))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_backbone_matches_module_cpu():
    """_fused_backbone with NO pallas blocks (pure XLA path) must equal
    MobileNetV3Backbone.apply — pins the manual block loop wiring."""
    from mtg_card_image_segmentation_tpu.models.mobilenetv3 import (
        MobileNetV3Backbone,
    )
    from mtg_card_image_segmentation_tpu.serving.predictor import _fused_backbone

    bb = MobileNetV3Backbone(
        dilated=True, fold_bn=True, dtype=jnp.float32, param_dtype=jnp.float32
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 64, 48, 3)), jnp.float32)
    v = bb.init(jax.random.key(2), x)
    want = jax.jit(lambda v, x: bb.apply(v, x, train=False))(v, x)
    got = _fused_backbone(v["params"], x, jnp.float32, fused_ids=())
    np.testing.assert_allclose(
        np.asarray(got["low"]), np.asarray(want["low"]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got["high"]), np.asarray(want["high"]), rtol=1e-5, atol=1e-5
    )


def test_demo_build_pipeline(tmp_path):
    """tools/build_demo.py mirrors the reference's rollup pipeline
    (rollup.config.js:1-66): IIFE bundle, minified + gzip, index rewrite."""
    import gzip
    import subprocess
    import sys

    out = tmp_path / "dist"
    proc = subprocess.run(
        [sys.executable, "tools/build_demo.py", "--out", str(out),
         "--models", str(tmp_path / "nope")],
        capture_output=True, text=True, timeout=60,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr
    bundle = (out / "bundle.min.js").read_text()
    # one IIFE, no module syntax left
    assert bundle.startswith("(() => {")
    assert "\nimport " not in bundle and "\nexport " not in bundle
    # all four source classes present
    for sym in ("CameraManager", "ModelInference", "ImageUtils", "requestAnimationFrame"):
        assert sym in bundle, sym
    gz = gzip.decompress((out / "bundle.min.js.gz").read_bytes()).decode()
    assert gz == bundle
    html = (out / "index.html").read_text()
    assert "bundle.min.js" in html and "src/app.js" not in html


def test_int8_quantize_roundtrip():
    """Per-channel int8 weight quantization: rel error bounded by the 127-
    level grid, dequantize_params inverts quantize_params' layout."""
    from mtg_card_image_segmentation_tpu.export.quantize import (
        dequantize_params,
        quantize_params,
    )

    rng = np.random.default_rng(0)
    tree = {
        "a": {"conv": {"kernel": rng.standard_normal((3, 3, 16, 32)).astype(np.float32),
                        "bias": rng.standard_normal(32).astype(np.float32)}},
        "tiny": {"kernel": rng.standard_normal((1, 1, 2, 2)).astype(np.float32)},
    }
    q = quantize_params(tree)
    assert q["a"]["conv"]["kernel_q"].dtype == np.int8
    assert q["a"]["conv"]["kernel_scale"].shape == (32,)
    assert "kernel" in q["tiny"]  # below min_size: untouched
    d = dequantize_params(q)
    w, w2 = tree["a"]["conv"]["kernel"], d["a"]["conv"]["kernel"]
    # symmetric 127-level grid: |err| <= scale/2 per channel
    scale = np.abs(w).max(axis=(0, 1, 2)) / 127.0
    assert (np.abs(w - w2) <= scale / 2 + 1e-7).all()
    np.testing.assert_array_equal(d["a"]["conv"]["bias"], tree["a"]["conv"]["bias"])


def test_int8_predictor_agreement():
    """SegPredictor int8 weight mode: kernels live as int8, masks agree with
    the unquantized predictor (the >=0.999 deployment gate; random-init
    weights sit closer to the decision boundary than trained ones, so the
    test floor is 0.99)."""
    from mtg_card_image_segmentation_tpu.models import create_model
    from mtg_card_image_segmentation_tpu.serving.predictor import SegPredictor

    h, w = 64, 48
    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, h, w, 3)), train=False))(
        jax.random.key(0)
    )
    kw = dict(use_pallas=False, dtype=jnp.float32)
    base = SegPredictor(variables["params"], variables["batch_stats"], h, w, **kw)
    q = SegPredictor(
        variables["params"], variables["batch_stats"], h, w,
        quantize="int8", **kw,
    )
    # int8 kernels actually present on device
    leaves = jax.tree_util.tree_leaves(q._params)
    assert any(x.dtype == jnp.int8 for x in leaves)
    images = np.random.default_rng(1).integers(0, 256, (4, h, w, 3), np.uint8)
    agreement = q.mask_agreement(base, images)
    assert agreement >= 0.99, agreement


def test_seg_predictor_mesh_sharded(mesh8):
    """Multi-chip serving: a mesh-sharded SegPredictor (batch over 'data'
    via shard_map, params replicated) produces bitwise the same masks as
    the single-device predictor, and the output really is sharded."""
    from mtg_card_image_segmentation_tpu.models import create_model
    from mtg_card_image_segmentation_tpu.serving.predictor import SegPredictor

    h, w = 64, 48
    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    variables = jax.jit(lambda k: model.init(k, jnp.zeros((1, h, w, 3)), train=False))(
        jax.random.key(0)
    )
    kw = dict(use_pallas=False, dtype=jnp.float32)
    base = SegPredictor(variables["params"], variables["batch_stats"], h, w, **kw)
    sharded = SegPredictor(
        variables["params"], variables["batch_stats"], h, w, mesh=mesh8, **kw
    )
    images = np.random.default_rng(2).integers(0, 256, (8, h, w, 3), np.uint8)
    m0 = np.asarray(base.predict(images))
    m1_dev = sharded.predict(images)
    assert len(m1_dev.sharding.device_set) == 8  # actually distributed
    np.testing.assert_array_equal(m0, np.asarray(m1_dev))


class TestPosePredictor:
    """PosePredictor (serving/pose_predictor.py): one jitted uint8 ->
    corners program, parity vs the evaluator's reference decode flow."""

    @staticmethod
    def _build(refine):
        from mtg_card_image_segmentation_tpu.models import create_model
        from mtg_card_image_segmentation_tpu.serving import PosePredictor

        h, w, hm = 64, 96, (16, 24)
        model = create_model(
            "hrnet_pose", heatmap_height=hm[0], heatmap_width=hm[1],
            compute_dtype="float32",
        )
        variables = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, h, w, 3)), train=False)
        )(jax.random.key(0))
        pred = PosePredictor(
            variables["params"], variables["batch_stats"], h, w,
            heatmap_hw=hm, dtype=jnp.float32, refine=refine,
            use_pallas=False,
        )
        return model, variables, pred, (h, w)

    def test_matches_evaluator_decode(self):
        """refine=False == reference integer argmax; refine=True (the
        default) == the PoseEvaluator's sub-pixel decode exactly."""
        from mtg_card_image_segmentation_tpu.data.preprocess import normalize_only
        from mtg_card_image_segmentation_tpu.ops import heatmap as hm_lib

        model, variables, pred, (h, w) = self._build(refine=False)
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)

        px, conf = pred.predict(jnp.asarray(imgs))
        assert px.shape == (2, 4, 2) and conf.shape == (2, 4)

        x = normalize_only(jnp.asarray(imgs, jnp.float32) / 255.0)
        heatmaps = model.apply(variables, x, train=False)
        coords01, ref_conf = hm_lib.decode_argmax(heatmaps)
        ref_px = hm_lib.coords01_to_pixels(coords01, (h, w))
        np.testing.assert_allclose(np.asarray(px), np.asarray(ref_px),
                                   rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf),
                                   rtol=1e-4, atol=1e-4)

        _, _, pred_r, _ = self._build(refine=True)
        px_r, _ = pred_r.predict(jnp.asarray(imgs))
        # refine=True is the gated decode (sub-pixel + plausibility-gated
        # joint-NMS fallback — untrained-model heatmaps routinely fail the
        # quad sanity gate, so matching the plain sub-pixel decode here
        # would be wrong)
        coords01_r, _ = hm_lib.decode_argmax_subpixel_gated(heatmaps)
        ref_px_r = hm_lib.coords01_to_pixels(coords01_r, (h, w))
        np.testing.assert_allclose(np.asarray(px_r), np.asarray(ref_px_r),
                                   rtol=1e-4, atol=1e-2)

    def test_yolo_corner_predictor_matches_evaluator_decode(self):
        """YoloCornerPredictor (uint8 path) == the CornerEvaluator's
        yolo_predict_step decode on the same float images, and per-corner
        confidences come from the joint decode's kpt conf channel."""
        from mtg_card_image_segmentation_tpu.evaluation.pose import (
            yolo_predict_step,
        )
        from mtg_card_image_segmentation_tpu.models import create_model
        from mtg_card_image_segmentation_tpu.serving import YoloCornerPredictor

        s = 64
        model = create_model("yolo12n_pose", compute_dtype="float32")
        variables = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, s, s, 3)), train=False)
        )(jax.random.key(0))
        pred = YoloCornerPredictor(
            variables["params"], variables["batch_stats"], imgsz=s,
            dtype=jnp.float32,
        )

        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 256, (2, s, s, 3), dtype=np.uint8)
        px, conf, valid = pred.predict_valid(jnp.asarray(imgs))
        assert px.shape == (2, 4, 2) and conf.shape == (2, 4)
        assert valid.shape == (2, 4)

        step = yolo_predict_step(model.apply)
        ref_px, _ = step(variables, jnp.asarray(imgs, jnp.float32) / 255.0)
        np.testing.assert_allclose(np.asarray(px), np.asarray(ref_px),
                                   rtol=1e-4, atol=1e-3)

    def test_yolo_corner_predictor_from_checkpoint(self, tmp_path):
        """from_checkpoint restores trained params (params-only, optimizer
        state discarded) and predicts identically to a directly-constructed
        predictor — guards the restore path the server's --pose-family yolo
        flag uses."""
        from mtg_card_image_segmentation_tpu.config import OptimizerConfig
        from mtg_card_image_segmentation_tpu.models import create_model
        from mtg_card_image_segmentation_tpu.serving import YoloCornerPredictor
        from mtg_card_image_segmentation_tpu.training import (
            checkpoint as ckpt_lib,
            create_optimizer,
            create_seg_state,
        )

        s = 64
        model = create_model("yolo12n_pose")
        tx, _ = create_optimizer(OptimizerConfig(), 1, 1)
        state = create_seg_state(model, tx, (1, s, s, 3), jax.random.key(7))
        ckpt_lib.save_checkpoint(
            str(tmp_path), "best_model", state, epoch=3, best_metric=1.0,
            history={}, config={},
        )

        pred = YoloCornerPredictor.from_checkpoint(
            str(tmp_path), "best_model", imgsz=s, dtype=jnp.float32
        )
        direct = YoloCornerPredictor(
            state.params, state.batch_stats, imgsz=s, dtype=jnp.float32
        )
        rng = np.random.default_rng(11)
        imgs = rng.integers(0, 256, (2, s, s, 3), dtype=np.uint8)
        px, conf = pred.predict(jnp.asarray(imgs))
        ref_px, ref_conf = direct.predict(jnp.asarray(imgs))
        np.testing.assert_array_equal(np.asarray(px), np.asarray(ref_px))
        np.testing.assert_array_equal(np.asarray(conf), np.asarray(ref_conf))

    def test_yolo_corner_predictor_mesh_sharded(self, mesh8):
        """Mesh-sharded corner serving == single-device, outputs distributed."""
        from mtg_card_image_segmentation_tpu.models import create_model
        from mtg_card_image_segmentation_tpu.serving import YoloCornerPredictor

        s = 64
        model = create_model("yolo12n_pose", compute_dtype="float32")
        variables = jax.jit(
            lambda k: model.init(k, jnp.zeros((1, s, s, 3)), train=False)
        )(jax.random.key(0))
        kw = dict(imgsz=s, dtype=jnp.float32)
        base = YoloCornerPredictor(
            variables["params"], variables["batch_stats"], **kw
        )
        sharded = YoloCornerPredictor(
            variables["params"], variables["batch_stats"], mesh=mesh8, **kw
        )
        imgs = np.random.default_rng(5).integers(0, 256, (8, s, s, 3), np.uint8)
        px0, c0 = base.predict(imgs)
        px1, c1 = sharded.predict(imgs)
        assert len(px1.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(px0), np.asarray(px1))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))

    def test_scale_to_original_conventions(self):
        """HRNet maps align-corners ((size-1) ratio: endpoints map to
        endpoints); YOLO maps half-pixel ((x+0.5)*s-0.5: pixel CENTERS map
        to pixel centers, matching cv2/bilinear_resize align_corners=False).
        The two deliberately differ — each must invert its own chain."""

        class _P:  # minimal hosts for the two unbound conventions
            width = height = 64

        from mtg_card_image_segmentation_tpu.serving import (
            PosePredictor,
            YoloCornerPredictor,
        )

        px = np.asarray([[0.0, 0.0], [63.0, 63.0]], np.float32)
        hr = PosePredictor.scale_to_original(_P(), px, (480, 640))
        np.testing.assert_allclose(hr[0], [0.0, 0.0])
        np.testing.assert_allclose(hr[1], [639.0, 479.0])

        yl = YoloCornerPredictor.scale_to_original(_P(), px, (480, 640))
        # half-pixel: x0 = (x + 0.5) * (640 / 64) - 0.5
        np.testing.assert_allclose(yl[0], [4.5, 3.25])
        np.testing.assert_allclose(yl[1], [634.5, 475.75])

    def test_subpixel_refine_stays_within_half_px(self):
        """Quadratic sub-pixel refinement moves each corner <= 0.5 heatmap
        px per axis from the integer argmax (parabola vertex of a true
        local maximum lies within its cell)."""
        from mtg_card_image_segmentation_tpu.ops import heatmap as hm_lib

        rng = np.random.default_rng(1)
        hms = jnp.asarray(rng.random((2, 16, 24, 4)), jnp.float32)
        coords01, _ = hm_lib.decode_argmax(hms)
        ref01, _ = hm_lib.decode_argmax_subpixel(hms)
        dx = np.abs(np.asarray(ref01[..., 0] - coords01[..., 0])) * (24 - 1)
        dy = np.abs(np.asarray(ref01[..., 1] - coords01[..., 1])) * (16 - 1)
        assert dx.max() <= 0.5 + 1e-5 and dy.max() <= 0.5 + 1e-5


def test_auto_layout_staged_matches_plain_jit():
    """_AutoLayoutExec (serving/predictor.py): AOT executables with
    XLA-chosen input layouts produce the same masks as the plain jit path,
    stage() round-trips host and device arrays, per-shape executables are
    cached, and an unsupported backend degrades to the jit path instead of
    failing (MTG_AUTO_LAYOUT=0 forces that branch)."""
    from mtg_card_image_segmentation_tpu.models import create_model
    from mtg_card_image_segmentation_tpu.serving.predictor import SegPredictor

    h, w = 64, 48
    model = create_model("lraspp_mobilenet_v3_large", compute_dtype="float32")
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, h, w, 3)), train=False)
    )(jax.random.key(0))
    kw = dict(use_pallas=False, dtype=jnp.float32)
    plain = SegPredictor(
        variables["params"], variables["batch_stats"], h, w,
        auto_layout=False, **kw,
    )
    auto = SegPredictor(
        variables["params"], variables["batch_stats"], h, w, **kw
    )
    assert plain._auto is None and auto._auto is not None

    rng = np.random.default_rng(4)
    imgs_np = rng.integers(0, 256, (4, h, w, 3), dtype=np.uint8)
    m_plain = np.asarray(plain.predict(imgs_np))

    # host input, device input, and pre-staged input all agree
    np.testing.assert_array_equal(np.asarray(auto.predict(imgs_np)), m_plain)
    np.testing.assert_array_equal(
        np.asarray(auto.predict(jnp.asarray(imgs_np))), m_plain
    )
    staged = auto.stage(imgs_np)
    np.testing.assert_array_equal(np.asarray(auto.predict(staged)), m_plain)
    # staging an already-staged array is idempotent (no copy storm)
    restaged = auto.stage(staged)
    np.testing.assert_array_equal(np.asarray(restaged), np.asarray(staged))

    if auto._auto.enabled:  # backend supports layouts: cache has one entry
        assert len(auto._auto._cache) == 1
        # a second batch shape compiles its own executable
        imgs2 = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            np.asarray(auto.predict(imgs2)),
            np.asarray(plain.predict(imgs2)),
        )
        assert len(auto._auto._cache) == 2

    # env kill-switch: the exec reports disabled and predict still works
    os.environ["MTG_AUTO_LAYOUT"] = "0"
    try:
        off = SegPredictor(
            variables["params"], variables["batch_stats"], h, w, **kw
        )
        assert off._auto is not None and not off._auto.enabled
        np.testing.assert_array_equal(np.asarray(off.predict(imgs_np)), m_plain)
    finally:
        del os.environ["MTG_AUTO_LAYOUT"]


def test_auto_layout_pose_predictors():
    """The corner predictors ride the same staged path: auto-layout output
    == plain output for both families (two leading param trees)."""
    from mtg_card_image_segmentation_tpu.models import create_model
    from mtg_card_image_segmentation_tpu.serving import (
        PosePredictor,
        YoloCornerPredictor,
    )

    h, w, hm = 64, 96, (16, 24)
    model = create_model(
        "hrnet_pose", heatmap_height=hm[0], heatmap_width=hm[1],
        compute_dtype="float32",
    )
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, h, w, 3)), train=False)
    )(jax.random.key(0))
    kw = dict(heatmap_hw=hm, dtype=jnp.float32, use_pallas=False)
    imgs = np.random.default_rng(6).integers(0, 256, (2, h, w, 3), np.uint8)
    base = PosePredictor(
        variables["params"], variables["batch_stats"], h, w,
        auto_layout=False, **kw,
    )
    auto = PosePredictor(
        variables["params"], variables["batch_stats"], h, w, **kw
    )
    for a, b in zip(auto.predict(imgs), base.predict(imgs)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    s = 64
    ymodel = create_model("yolo12n_pose", compute_dtype="float32")
    yvars = jax.jit(
        lambda k: ymodel.init(k, jnp.zeros((1, s, s, 3)), train=False)
    )(jax.random.key(0))
    yimgs = np.random.default_rng(7).integers(0, 256, (2, s, s, 3), np.uint8)
    ybase = YoloCornerPredictor(
        yvars["params"], yvars["batch_stats"], imgsz=s, dtype=jnp.float32,
        auto_layout=False,
    )
    yauto = YoloCornerPredictor(
        yvars["params"], yvars["batch_stats"], imgsz=s, dtype=jnp.float32
    )
    for a, b in zip(yauto.predict(yimgs), ybase.predict(yimgs)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
