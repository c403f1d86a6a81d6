import numpy as np
import pytest

import jax.numpy as jnp

from odc_tpu.core.nms import nms, nms_padded, class_offset_boxes


def _random_detections(seed, n=200, num_cls=20, spread=100.0):
    rng = np.random.default_rng(seed)
    boxes = rng.uniform(0, spread, size=(n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, size=(n, 2)).astype(
        np.float32
    )
    conf = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    cls_scores = rng.uniform(0, 1, size=(n, num_cls)).astype(np.float32)
    return boxes, conf, cls_scores


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("conf_thre,iou_thre", [(0.9, 0.5), (0.5, 0.3)])
def test_nms_matches_reference(reference_utils, seed, conf_thre, iou_thre):
    import torch

    boxes, conf, cls_scores = _random_detections(seed)

    ref_b, ref_c, ref_s = reference_utils.nms(
        torch.tensor(boxes),
        torch.tensor(conf),
        torch.tensor(cls_scores),
        conf_thre,
        iou_thre,
    )
    our_b, our_c, our_s = nms(
        jnp.asarray(boxes),
        jnp.asarray(conf),
        jnp.asarray(cls_scores),
        conf_thre,
        iou_thre,
    )

    np.testing.assert_allclose(our_c, ref_c.numpy(), rtol=1e-6)
    np.testing.assert_allclose(our_b, ref_b.numpy(), rtol=1e-6)
    np.testing.assert_allclose(our_s, ref_s.numpy(), rtol=1e-6)


def test_nms_padded_static_shapes():
    boxes, conf, cls_scores = _random_detections(7)
    out_b, out_c, out_s, keep = nms_padded(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_scores),
        0.5, 0.5, max_keep=64,
    )
    assert out_b.shape == (64, 4)
    assert out_c.shape == (64,)
    assert out_s.shape == (64, 20)
    assert keep.shape == (64,)
    # Kept entries are sorted descending by confidence.
    kept_conf = np.asarray(out_c)[np.asarray(keep)]
    assert np.all(np.diff(kept_conf) <= 1e-7)


def test_nms_empty_result():
    boxes, conf, cls_scores = _random_detections(5)
    out_b, out_c, out_s = nms(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_scores),
        conf_thre=2.0,  # nothing passes
    )
    assert out_b.shape == (0, 4)
    assert out_c.shape == (0,)


def test_nms_suppression_is_sequential():
    # Three boxes: A (top score), B overlaps A (suppressed), C overlaps B
    # but not A. Sequential semantics keep C because B, being suppressed,
    # never suppresses others.
    boxes = np.array(
        [
            [0.0, 0.0, 10.0, 10.0],   # A
            [4.0, 0.0, 14.0, 10.0],   # B: IoU(A,B) = 6/14 ≈ 0.43
            [9.0, 0.0, 19.0, 10.0],   # C: IoU(A,C) = 1/19 ≈ .05, IoU(B,C)=5/15≈0.33
        ],
        dtype=np.float32,
    )
    conf = np.array([0.9, 0.8, 0.7], dtype=np.float32)
    cls_scores = np.ones((3, 2), dtype=np.float32)

    out_b, out_c, _ = nms(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_scores),
        conf_thre=0.5, iou_thre=0.4,
    )
    # B suppressed by A; C survives (IoU(A,C) < 0.4; B can't suppress).
    np.testing.assert_allclose(out_c, [0.9, 0.7])
    np.testing.assert_allclose(out_b, boxes[[0, 2]])


def test_class_wise_nms_keeps_other_classes():
    boxes = np.array(
        [[0.0, 0.0, 10.0, 10.0], [1.0, 0.0, 11.0, 10.0]], dtype=np.float32
    )
    conf = np.array([0.9, 0.8], dtype=np.float32)
    cls_scores = np.array([[0.9, 0.1], [0.1, 0.9]], dtype=np.float32)

    # Class-agnostic: the second box is suppressed.
    out_b, _, _ = nms(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_scores),
        conf_thre=0.5, iou_thre=0.5,
    )
    assert out_b.shape[0] == 1

    # Class-wise: different argmax classes -> both kept.
    out_b, _, _ = nms(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_scores),
        conf_thre=0.5, iou_thre=0.5, class_wise=True,
    )
    assert out_b.shape[0] == 2


def test_class_offset_disjoint():
    boxes = jnp.zeros((4, 4)) + jnp.array([0.0, 0.0, 10.0, 10.0])
    cls_idx = jnp.array([0, 1, 2, 3])
    shifted = class_offset_boxes(boxes, cls_idx)
    from odc_tpu.core.boxes import pairwise_iou

    m = np.asarray(pairwise_iou(shifted, shifted))
    assert np.all(m[~np.eye(4, dtype=bool)] == 0)
