import numpy as np
import pytest

import jax.numpy as jnp

from odc_tpu.core.boxes import iou, pairwise_iou, xyxy_to_cxcywh, cxcywh_to_xyxy


def test_iou_identical_box():
    box = jnp.array([0.0, 0.0, 10.0, 10.0])
    # +1e-6 denominator stabilizer keeps it just below 1.
    assert float(iou(box, box)) == pytest.approx(1.0, abs=1e-5)


def test_iou_disjoint():
    a = jnp.array([0.0, 0.0, 1.0, 1.0])
    b = jnp.array([5.0, 5.0, 6.0, 6.0])
    assert float(iou(a, b)) == 0.0


def test_iou_half_overlap():
    a = jnp.array([0.0, 0.0, 2.0, 2.0])
    b = jnp.array([1.0, 0.0, 3.0, 2.0])
    # intersection 2, union 6
    assert float(iou(a, b)) == pytest.approx(2.0 / 6.0, rel=1e-5)


def test_iou_matches_reference(reference_utils):
    import torch

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 100, size=(64, 4)).astype(np.float32)
    b = rng.uniform(0, 100, size=(64, 4)).astype(np.float32)
    a[:, 2:] += a[:, :2]  # ensure x2 > x1, y2 > y1
    b[:, 2:] += b[:, :2]

    ours = np.asarray(iou(jnp.asarray(a), jnp.asarray(b)))
    ref = reference_utils.get_iou(torch.tensor(a), torch.tensor(b)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    ref_np = reference_utils.get_iou(a, b, numpy=True)
    np.testing.assert_allclose(ours, ref_np, rtol=1e-5, atol=1e-6)


def test_pairwise_iou_shape():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 50, size=(5, 4)).astype(np.float32)
    b = rng.uniform(0, 50, size=(7, 4)).astype(np.float32)
    out = pairwise_iou(jnp.asarray(a), jnp.asarray(b))
    assert out.shape == (5, 7)


def test_coord_roundtrip():
    rng = np.random.default_rng(2)
    boxes = rng.uniform(0, 100, size=(16, 4)).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    out = np.asarray(cxcywh_to_xyxy(xyxy_to_cxcywh(jnp.asarray(boxes))))
    np.testing.assert_allclose(out, boxes, rtol=1e-4, atol=1e-4)
