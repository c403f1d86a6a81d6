import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odc_tpu.data.voc import VOC, make_synthetic_voc
from odc_tpu.eval import Detector, evaluate_model, evaluate_batched
from odc_tpu.eval.evaluator import evaluate_batched_native
from odc_tpu.models import YOLOv2


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_eval")
    make_synthetic_voc(str(root), num_train=2, num_val=3, image_hw=(96, 128))
    voc = VOC(dataset_dir=str(root))
    model = YOLOv2(image_size=(96, 128))
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 96, 128, 3), jnp.uint8)
    )
    return voc, model, variables


def test_detect_contract(setup):
    voc, model, variables = setup
    det = Detector(model, variables, conf_thre=0.3, max_keep=16)
    _, img, _ = voc.val_dataset[0]
    pred = det.detect(img)
    assert set(pred) == {
        "bbox_list", "lbl_list", "conf_score_list",
        "cls_spec_conf_score_list",
    }
    n = len(pred["bbox_list"])
    assert len(pred["lbl_list"]) == n == len(pred["conf_score_list"])
    for box in pred["bbox_list"]:
        assert len(box) == 4


def test_evaluate_model_runs(setup):
    voc, model, variables = setup
    det = Detector(model, variables, conf_thre=0.3, max_keep=16)
    res = evaluate_model(det, voc.val_dataset)
    assert "level_list" in res and len(res["level_list"]) == 10
    for c in det.cls_list:
        assert res[c].shape == (10,)
        assert np.all(np.isfinite(res[c]))


def test_evaluate_batched_runs(setup):
    voc, model, variables = setup
    det = Detector(model, variables, conf_thre=0.3, max_keep=16)
    res = evaluate_batched(
        det, voc.val_dataset, image_hw=(96, 128), batch_size=2
    )
    assert "level_list" in res
    for c in det.cls_list:
        assert np.all(np.isfinite(res[c]))


# ---------------------------------------------------------------------------
# Bucketed NATIVE-parity streaming eval (VERDICT r2 weak#8).
# ---------------------------------------------------------------------------

ODD_SIZES = [(70, 100), (96, 96), (100, 70), (65, 130), (90, 90), (96, 128)]


class _ListDataset:
    """Minimal dataset over in-memory (img_id, img, annot) triples."""

    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


@pytest.fixture(scope="module")
def odd_size_set():
    rng = np.random.default_rng(5)
    items = []
    for i, (h, w) in enumerate(ODD_SIZES):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        annot = {
            "bbox_list": [
                [w * 0.1, h * 0.1, w * 0.6, h * 0.7],
                [w * 0.3, h * 0.4, w * 0.9, h * 0.9],
            ],
            "lbl_list": ["dog", "cat"],
        }
        items.append((i, img, annot))
    return _ListDataset(items)


def test_masked_forward_equals_native(setup):
    """The padded+masked forward's valid grid cells equal the NATIVE-size
    run exactly (up to conv reduction order): the core claim behind the
    bucketed native-parity eval.  Reference semantics: floor pooling + the
    quadrant neck's odd-row/col drop (``models/yolov2.py:666-667``)."""
    _, model, variables = setup
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (70, 100, 3), dtype=np.uint8)

    y_native = np.asarray(
        model.apply(variables, jnp.asarray(img[None]), train=False)
    )  # grid (2, 3)

    padded = np.zeros((1, 96, 128, 3), np.uint8)
    padded[0, :70, :100] = img
    y_pad = np.asarray(
        model.apply(
            variables, jnp.asarray(padded), train=False,
            valid_hw=jnp.asarray([[70, 100]], jnp.int32),
        )
    )  # grid (3, 4); valid cells [:2, :3]

    assert y_native.shape[1:3] == (2, 3)
    assert y_pad.shape[1:3] == (3, 4)
    np.testing.assert_allclose(
        y_pad[:, :2, :3], y_native, rtol=1e-4, atol=1e-4
    )


def test_masked_forward_space_to_depth_neck():
    """Same masked-forward claim for the paper-style space_to_depth neck
    (block-local, so the static reorg is exact under padding)."""
    model = YOLOv2(neck="space_to_depth")
    variables = jax.jit(model.init)(
        jax.random.key(1), jnp.zeros((1, 64, 64, 3), jnp.uint8)
    )
    rng = np.random.default_rng(8)
    img = rng.integers(0, 255, (65, 130, 3), dtype=np.uint8)

    y_native = np.asarray(
        model.apply(variables, jnp.asarray(img[None]), train=False)
    )
    padded = np.zeros((1, 96, 160, 3), np.uint8)
    padded[0, :65, :130] = img
    y_pad = np.asarray(
        model.apply(
            variables, jnp.asarray(padded), train=False,
            valid_hw=jnp.asarray([[65, 130]], jnp.int32),
        )
    )
    gh, gw = y_native.shape[1:3]
    np.testing.assert_allclose(
        y_pad[:, :gh, :gw], y_native, rtol=1e-4, atol=1e-4
    )


def test_native_infer_boxes_match_detect(setup, odd_size_set):
    """Bucketed masked inference == per-image native ``Detector.detect``
    (itself reference-parity-proven) for every odd-size image: same kept
    boxes in native pixel coordinates, same labels, same scores."""
    from odc_tpu.ops.detect import make_native_infer_fn

    _, model, variables = setup
    det = Detector(model, variables, conf_thre=0.3, max_keep=16)
    infer = jax.jit(make_native_infer_fn(model, 0.3, 0.5, 16))

    # One bucket batch holding two different-size images (top-left pad).
    items = [odd_size_set[0], odd_size_set[3]]  # (70,100), (65,130)
    bh = max(-(-img.shape[0] // 32) * 32 for _, img, _ in items)
    bw = max(-(-img.shape[1] // 32) * 32 for _, img, _ in items)
    imgs = np.zeros((len(items), bh, bw, 3), np.uint8)
    vhw = np.zeros((len(items), 2), np.int32)
    for j, (_i, img, _a) in enumerate(items):
        imgs[j, : img.shape[0], : img.shape[1]] = img
        vhw[j] = img.shape[:2]

    boxes_b, conf_b, lbl_b, score_b, keep_b = (
        np.asarray(o)
        for o in infer(variables, jnp.asarray(imgs), jnp.asarray(vhw))
    )

    for j, (_i, img, _a) in enumerate(items):
        ref = det.detect(img)
        keep = keep_b[j]
        ours = boxes_b[j][keep]
        ref_boxes = np.asarray(ref["bbox_list"], np.float64).reshape(-1, 4)
        assert len(ours) == len(ref_boxes) > 0, (j, len(ours), len(ref_boxes))
        np.testing.assert_allclose(ours, ref_boxes, rtol=1e-3, atol=5e-3)
        assert [det.cls_list[k] for k in lbl_b[j][keep]] == ref["lbl_list"]
        np.testing.assert_allclose(
            score_b[j][keep],
            np.asarray(ref["cls_spec_conf_score_list"]),
            rtol=1e-3, atol=1e-4,
        )


def test_evaluate_batched_native_matches_evaluate_model(setup, odd_size_set):
    """End-to-end: bucketed native-parity streaming mAP == the reference
    per-image loop (``evaluate_model``) on a synthetic odd-size set, with
    partial buckets flushed at the tail."""
    _, model, variables = setup
    det = Detector(model, variables, conf_thre=0.3, max_keep=16)

    ref = evaluate_model(det, odd_size_set)
    ours = evaluate_batched_native(det, odd_size_set, batch_size=2)

    np.testing.assert_array_equal(ref["level_list"], ours["level_list"])
    for c in det.cls_list:
        np.testing.assert_allclose(ours[c], ref[c], rtol=1e-6, atol=1e-9)


def test_evaluate_batched_native_rejects_v1(setup):
    from odc_tpu.models import YOLOv1

    model = YOLOv1()
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.uint8)
    )
    det = Detector(model, variables)
    with pytest.raises(ValueError, match="v2-only"):
        evaluate_batched_native(det, _ListDataset([]))


def test_evaluate_batched_native_rejects_int8(setup):
    """ADVICE r3 (medium): an int8-configured Detector must not silently
    evaluate in bf16 through the native-parity path (which has no int8
    graph) — that would mislabel an int8 accuracy measurement."""
    _, model, variables = setup
    det = Detector(model, variables, conf_thre=0.3, max_keep=16,
                   int8_neck=True)
    with pytest.raises(ValueError, match="int8"):
        evaluate_batched_native(det, _ListDataset([]))
