"""End-to-end YOLOv2 parity vs the reference with SHARED weights.

The strongest parity proof available without pretrained weights (VERDICT
task 8): fully construct the reference torch ``YOLOv2`` (its backbone builds
from scratch, no downloads), bridge its random-init weights into our flax
model via :mod:`odc_tpu.models.convert_torch`, and assert the two frameworks
produce the same head outputs and the same detected boxes — including on an
odd-sized image fed at NATIVE size (reference ``models/yolov2.py:666-667``:
no resize; pooling floors odd dims, the neck drops the odd row/col).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odc_tpu.data.voc import CLASS_LIST
from odc_tpu.eval.evaluator import Detector
from odc_tpu.models import YOLOv2
from odc_tpu.models.convert_torch import load_torch_yolov2

CLS2IDX = {c: i for i, c in enumerate(CLASS_LIST)}


@pytest.fixture(scope="module")
def shared_v2(reference_models):
    """(torch reference model, our model, converted variables)."""
    import torch

    torch.manual_seed(0)
    ref = reference_models["yolov2"].YOLOv2(CLASS_LIST, CLS2IDX)
    ref.eval()

    model = YOLOv2(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.uint8)
    )
    variables = load_torch_yolov2(ref, variables)
    return ref, model, variables


def test_forward_parity_416(shared_v2):
    import torch

    ref, model, variables = shared_v2
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (1, 416, 416, 3), dtype=np.uint8)

    with torch.no_grad():
        y_ref = ref(torch.tensor(img)).numpy()
    y_ours = np.asarray(model.apply(variables, jnp.asarray(img), train=False))

    assert y_ref.shape == y_ours.shape == (1, 13, 13, 5, 25)
    np.testing.assert_allclose(y_ref, y_ours, rtol=1e-3, atol=2e-3)


def test_forward_parity_native_odd_size(shared_v2):
    """Native odd-size input: pooling floors, neck drops the odd row/col."""
    import torch

    ref, model, variables = shared_v2
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (1, 250, 330, 3), dtype=np.uint8)

    with torch.no_grad():
        y_ref = ref(torch.tensor(img)).numpy()
    y_ours = np.asarray(model.apply(variables, jnp.asarray(img), train=False))

    assert y_ref.shape == y_ours.shape  # (1, 7, 10, 5, 25)
    np.testing.assert_allclose(y_ref, y_ours, rtol=1e-3, atol=2e-3)


def test_detect_parity_native_odd_size(shared_v2):
    """Reference-contract detect() on an odd-sized image: same kept boxes,
    same labels, same scores — with per-call thresholds."""
    import torch

    ref, model, variables = shared_v2
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (250, 330, 3), dtype=np.uint8)

    # Pick a conf threshold that keeps a handful of candidates (random-init
    # conf scores cluster near 0.5, the reference default 0.9 keeps none).
    with torch.no_grad():
        conf = torch.sigmoid(ref(torch.tensor(img[None]))[..., 4]).numpy()
    conf_thre = float(np.quantile(conf, 1.0 - 12.5 / conf.size))

    ref_pred = ref.detect(img, conf_score_thre=conf_thre, iou_thre=0.5)

    det = Detector(model, variables, max_keep=64)
    our_pred = det.detect(img, conf_score_thre=conf_thre, iou_thre=0.5)

    ref_boxes = np.asarray(ref_pred["bbox_list"], np.float64).reshape(-1, 4)
    our_boxes = np.asarray(our_pred["bbox_list"], np.float64).reshape(-1, 4)
    assert len(ref_boxes) == len(our_boxes) > 0
    np.testing.assert_allclose(ref_boxes, our_boxes, rtol=1e-3, atol=5e-3)
    assert ref_pred["lbl_list"] == our_pred["lbl_list"]
    np.testing.assert_allclose(
        np.asarray(ref_pred["conf_score_list"], np.float64),
        np.asarray(our_pred["conf_score_list"], np.float64),
        rtol=1e-3,
        atol=1e-4,
    )


# ---------------------------------------------------------------------------
# YOLOv1 with the GoogLeNet replica oracle (no torchvision / no downloads).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def shared_v1(reference_models):
    """Reference torch YOLOv1 assembled from the replica backbone (its real
    __init__ downloads weights), our YOLOv1, and bridged variables."""
    import importlib

    import torch

    from torch_googlenet_replica import GoogLeNetReplica, randomize
    from odc_tpu.models import YOLOv1
    from odc_tpu.models.convert_torch import load_torch_yolov1

    mod = reference_models["yolov1"]
    gb_mod = importlib.import_module("models.backbones.googlenet")

    wrapper = gb_mod.GoogLeNetBackbone.__new__(gb_mod.GoogLeNetBackbone)
    torch.nn.Module.__init__(wrapper)
    wrapper.backbone_model = randomize(GoogLeNetReplica(), seed=1)
    wrapper.w_in = 224
    wrapper.h_in = 224
    wrapper.output_shape = [7, 7, 1024]

    ref = mod.YOLOv1.__new__(mod.YOLOv1)
    torch.nn.Module.__init__(ref)
    ref.num_cls = len(CLASS_LIST)
    ref.num_anchor_box = 2
    ref.num_grid_cell_in_height = 7
    ref.num_grid_cell_in_width = 7
    ref.cls_list = CLASS_LIST
    ref.cls2idx = CLS2IDX
    ref.backbone_model = wrapper
    torch.manual_seed(1)
    ref.head_model = torch.nn.Sequential(
        torch.nn.Flatten(),
        torch.nn.Linear(7 * 7 * 1024, 4096),
        torch.nn.ReLU(),
        torch.nn.Dropout(0.5),
        torch.nn.Linear(4096, 7 * 7 * 30),
    )
    ref.transform = mod.TRANSFORM  # identity stubs
    ref.resize = mod.RESIZE
    ref.eval()

    model = YOLOv1(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.uint8)
    )
    variables = load_torch_yolov1(ref, variables)
    return ref, model, variables


def test_v1_forward_parity_224(shared_v1):
    import torch

    ref, model, variables = shared_v1
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (1, 224, 224, 3), dtype=np.uint8)

    with torch.no_grad():
        y_ref = ref(torch.tensor(img)).reshape(1, 7, 7, 30).numpy()
    y_ours = np.asarray(model.apply(variables, jnp.asarray(img), train=False))

    np.testing.assert_allclose(y_ref, y_ours, rtol=1e-3, atol=2e-3)


def test_v1_detect_parity_224(shared_v1):
    """Reference-contract v1 detect at the network size (224x224): the
    resize is an identity pass-through, isolating head/NMS/clip parity."""
    import torch

    ref, model, variables = shared_v1
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)

    with torch.no_grad():
        conf = torch.sigmoid(
            ref(torch.tensor(img[None]))
            .reshape(1, 7, 7, 30)[..., [4, 9]]
        ).numpy()
    conf_thre = float(np.quantile(conf, 1.0 - 8.5 / conf.size))

    with torch.no_grad():
        ref_pred = ref.detect(img, conf_score_thre=conf_thre, iou_thre=0.5)

    det = Detector(model, variables, max_keep=64)
    our_pred = det.detect(img, conf_score_thre=conf_thre, iou_thre=0.5)

    ref_boxes = np.asarray(ref_pred["bbox_list"], np.float64).reshape(-1, 4)
    our_boxes = np.asarray(our_pred["bbox_list"], np.float64).reshape(-1, 4)
    assert len(ref_boxes) == len(our_boxes) > 0
    np.testing.assert_allclose(ref_boxes, our_boxes, rtol=1e-3, atol=5e-3)
    assert ref_pred["lbl_list"] == our_pred["lbl_list"]


def test_v1_detect_parity_native_odd_size(shared_v1):
    """VERDICT r2 missing#5: v1 detect on a NON-224 input through the REAL
    resize.  The reference path resizes via albumentations/cv2 INTER_LINEAR
    (``yolov1.py:456-461``) and inverse-resizes boxes to the original frame
    (``:536-543``); the conftest stub's ``Resize`` now implements the real
    cv2 fixed-point scheme, bitwise-equal to the native ``loader.cc`` resize
    our ``Detector`` uses — so both frameworks see identical 224x224 pixels
    and the box comparison exercises resize + inverse-resize end to end."""
    import torch

    from cv2_resize_oracle import resize_inter_linear

    ref, model, variables = shared_v1
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (250, 330, 3), dtype=np.uint8)

    small = resize_inter_linear(img, 224, 224)
    with torch.no_grad():
        conf = torch.sigmoid(
            ref(torch.tensor(small[None])).reshape(1, 7, 7, 30)[..., [4, 9]]
        ).numpy()
    conf_thre = float(np.quantile(conf, 1.0 - 8.5 / conf.size))

    with torch.no_grad():
        ref_pred = ref.detect(img, conf_score_thre=conf_thre, iou_thre=0.5)

    det = Detector(model, variables, max_keep=64)
    our_pred = det.detect(img, conf_score_thre=conf_thre, iou_thre=0.5)

    ref_boxes = np.asarray(ref_pred["bbox_list"], np.float64).reshape(-1, 4)
    our_boxes = np.asarray(our_pred["bbox_list"], np.float64).reshape(-1, 4)
    assert len(ref_boxes) == len(our_boxes) > 0
    # Boxes come back in the ORIGINAL 250x330 frame on both sides; x can
    # exceed the 224 net frame only if the inverse-resize actually ran.
    assert our_boxes[:, 2].max() > 224.0 - 1.0
    np.testing.assert_allclose(ref_boxes, our_boxes, rtol=1e-3, atol=5e-3)
    assert ref_pred["lbl_list"] == our_pred["lbl_list"]
    np.testing.assert_allclose(
        np.asarray(ref_pred["conf_score_list"], np.float64),
        np.asarray(our_pred["conf_score_list"], np.float64),
        rtol=1e-3,
        atol=1e-4,
    )
