"""Gather-free two-pass affine warp (odc_tpu.ops.warp + the Pallas kernel).

Oracles, strongest first:

1. *linear-gradient truth*: bilinear-class resampling reproduces a linear
   image exactly, so interior pixels must match the analytic composite
   ``sx + 2*sy`` for ANY affine — this catches geometric/indexing bugs
   that image-vs-image comparisons hide;
2. *axis-aligned exactness*: for b = c = 0 (scale/translate/flip) the
   two-pass IS one bilinear resample — bitwise-level agreement with the
   one-shot gather warp;
3. *rotation closeness*: per-pass interpolation differs from the one-shot
   4-tap warp by design (the albumentations reference cascade itself
   resamples up to 3x, models/yolov1.py:20-38); assert statistical
   agreement, not bitwise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odc_tpu.ops.warp import warp_affine_oneshot, warp_affine_twopass

H, W = 64, 96


def _minv(theta=0.0, scale=1.0, tx=0.0, ty=0.0, fx=1.0, fy=1.0):
    cos, sin = np.cos(theta), np.sin(theta)
    a = scale * cos * fx
    b = -scale * sin * fy
    c = scale * sin * fx
    d = scale * cos * fy
    cx, cy = (W - 1) / 2, (H - 1) / 2
    m = np.array(
        [[a, b, cx + tx - a * cx - b * cy],
         [c, d, cy + ty - c * cx - d * cy],
         [0, 0, 1]]
    )
    return jnp.asarray(np.linalg.inv(m).astype(np.float32))


def _grids():
    return np.mgrid[0:H, 0:W].astype(np.float32)


@pytest.fixture(scope="module")
def smooth_img():
    yy, xx = _grids()
    return jnp.asarray(
        np.stack(
            [
                128 + 100 * np.sin(xx / 13) * np.cos(yy / 9),
                128 + 110 * np.cos(xx / 19 + yy / 11),
                (xx + yy) * 255 / (H + W),
            ],
            -1,
        ).astype(np.float32)
    )


@pytest.mark.parametrize(
    "kw",
    [
        dict(theta=np.deg2rad(30)),
        dict(theta=np.deg2rad(45)),
        dict(theta=np.deg2rad(-45), scale=0.85, tx=8, ty=-6, fy=-1.0),
        dict(theta=np.deg2rad(45), scale=1.2, tx=-10, ty=4, fx=-1.0),
        dict(theta=np.deg2rad(-12), scale=1.1, tx=3.3, ty=7.7),
    ],
)
def test_linear_gradient_interior_truth(kw):
    yy, xx = _grids()
    img = jnp.asarray((xx + 2 * yy)[..., None])
    mi = np.asarray(_minv(**kw))
    out = np.asarray(warp_affine_twopass(img, jnp.asarray(mi), (H, W)))[..., 0]
    sx = mi[0, 0] * xx + mi[0, 1] * yy + mi[0, 2]
    sy = mi[1, 0] * xx + mi[1, 1] * yy + mi[1, 2]
    inner = (sx >= 2) & (sx <= W - 3) & (sy >= 2) & (sy <= H - 3)
    assert inner.sum() > 1000  # the mask must actually cover something
    np.testing.assert_allclose(out[inner], (sx + 2 * sy)[inner], atol=0.02)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        dict(fx=-1.0),
        dict(fy=-1.0),
        dict(scale=1.17, tx=5.3, ty=-3.7),
        dict(scale=0.8, fx=-1.0, tx=-9.9),
    ],
)
def test_axis_aligned_matches_oneshot_exactly(smooth_img, kw):
    mi = _minv(**kw)
    o1 = np.asarray(warp_affine_oneshot(smooth_img, mi, (H, W)))
    o2 = np.asarray(warp_affine_twopass(smooth_img, mi, (H, W)))
    np.testing.assert_allclose(o1, o2, atol=1e-3)


@pytest.mark.parametrize(
    "kw",
    [
        dict(theta=np.deg2rad(30)),
        dict(theta=np.deg2rad(-45), scale=0.85, tx=8, ty=-6, fy=-1.0),
    ],
)
def test_rotation_statistically_close_to_oneshot(smooth_img, kw):
    mi = _minv(**kw)
    o1 = np.asarray(warp_affine_oneshot(smooth_img, mi, (H, W)))
    o2 = np.asarray(warp_affine_twopass(smooth_img, mi, (H, W)))
    d = np.abs(o1 - o2)
    assert d.mean() < 2.0  # intensity units out of 255
    corr = np.corrcoef(o1.ravel(), o2.ravel())[0, 1]
    assert corr > 0.99


def test_zero_fill_outside():
    """A big translation leaves the vacated region exactly zero."""
    rngimg = np.random.default_rng(0).uniform(
        10, 255, (H, W, 3)
    ).astype(np.float32)
    mi = _minv(tx=W // 2)  # content moves right by W/2
    out = np.asarray(warp_affine_twopass(jnp.asarray(rngimg), mi, (H, W)))
    assert np.all(out[:, : W // 2 - 1] == 0.0)
    assert np.all(out[:, W // 2 + 1 :] > 0.0)


def test_pallas_kernel_matches_twopass(smooth_img):
    """The fused VMEM kernel computes the same two-pass math (interpret
    mode here; the real-TPU timing row lives in PROFILE.md)."""
    from odc_tpu.ops.pallas.warp_kernel import warp_affine_pallas

    mis = jnp.stack(
        [
            _minv(theta=np.deg2rad(-30), scale=1.1, tx=4),
            _minv(fx=-1.0),
            _minv(theta=np.deg2rad(44), ty=-6),
        ]
    )
    imgs = jnp.stack([smooth_img] * 3)
    o_p = np.asarray(warp_affine_pallas(imgs, mis, interpret=True))
    o_t = np.asarray(
        jax.vmap(lambda im, mi: warp_affine_twopass(im, mi, (H, W)))(
            imgs, mis
        )
    )
    np.testing.assert_allclose(o_p, o_t, atol=5e-3)


def test_augment_batch_impl_consistency():
    """augment_batch(warp_impl=...) keeps identical RNG streams: box
    geometry is bitwise-identical across impls, images statistically
    close (identical when no rotation fires)."""
    from odc_tpu.ops.augment import AugmentConfig, augment_batch

    rng = np.random.default_rng(3)
    images = jnp.asarray(
        rng.integers(0, 255, (4, H, W, 3), dtype=np.uint8)
    )
    boxes = jnp.asarray(
        np.tile(np.array([[10, 10, 40, 30], [50, 20, 90, 60]], np.float32),
                (4, 1, 1))
    )
    valid = jnp.ones((4, 2), bool)
    key = jax.random.key(11)

    # Rotation off: the two-pass IS one bilinear resample — uint8 equal
    # (up to the float->uint8 truncation edge on exact .0 boundaries).
    cfg = AugmentConfig(p_rotate=0.0)
    img_a, box_a, val_a = augment_batch(
        key, images, boxes, valid, cfg, warp_impl="oneshot"
    )
    img_b, box_b, val_b = augment_batch(
        key, images, boxes, valid, cfg, warp_impl="twopass"
    )
    np.testing.assert_array_equal(np.asarray(box_a), np.asarray(box_b))
    np.testing.assert_array_equal(np.asarray(val_a), np.asarray(val_b))
    d = np.abs(
        np.asarray(img_a, np.int32) - np.asarray(img_b, np.int32)
    )
    assert d.max() <= 1

    # Rotation on: box geometry still bitwise-shared (analytic), pixels
    # correlated (interp-class difference + boundary bands only).
    cfg = AugmentConfig(p_rotate=1.0)
    img_a, box_a, _ = augment_batch(
        key, images, boxes, valid, cfg, warp_impl="oneshot"
    )
    img_b, box_b, _ = augment_batch(
        key, images, boxes, valid, cfg, warp_impl="twopass"
    )
    np.testing.assert_array_equal(np.asarray(box_a), np.asarray(box_b))
    a = np.asarray(img_a, np.float32).ravel()
    b = np.asarray(img_b, np.float32).ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.95
