import numpy as np

import jax.numpy as jnp

from odc_tpu.ops.assign import assign, assign_numpy, densify, YoloTargets


def _sample_boxes(rng, n, h, w):
    x1 = rng.uniform(0, w - 40, n)
    y1 = rng.uniform(0, h - 40, n)
    bw = rng.uniform(10, 40, n)
    bh = rng.uniform(10, 40, n)
    return np.stack([x1, y1, x1 + bw, y1 + bh], -1)


def test_assign_reference_semantics_v2():
    # Hand-computed example at 416x416 (13x13 grid, cell=32).
    boxes = [[100.0, 200.0, 200.0, 300.0]]
    cell, sig_txty, twth, box, cls, valid = assign_numpy(
        boxes, [7], (416, 416), mode="v2"
    )
    # bx = 150/32 = 4.6875, by = 250/32 = 7.8125
    assert tuple(cell[0]) == (7, 4)
    np.testing.assert_allclose(sig_txty[0], [0.6875, 0.8125], rtol=1e-6)
    np.testing.assert_allclose(twth[0], [100 / 32, 100 / 32], rtol=1e-6)
    assert cls[0] == 7 and valid[0] and not valid[1]


def test_assign_v1_sigma_space():
    boxes = [[0.0, 0.0, 224.0, 224.0]]  # full image
    _, _, twth, _, _, _ = assign_numpy(boxes, [0], (224, 224), mode="v1")
    # bw = 224/32 = 7 grid units; σ-space = 7/7 = 1.
    np.testing.assert_allclose(twth[0], [1.0, 1.0], rtol=1e-6)


def test_assign_device_matches_numpy():
    rng = np.random.default_rng(0)
    b, m = 4, 8
    for mode in ("v1", "v2"):
        boxes = np.zeros((b, m, 4), np.float32)
        cls_idx = np.zeros((b, m), np.int32)
        valid = np.zeros((b, m), bool)
        per_img = [rng.integers(0, m + 1) for _ in range(b)]
        golden = []
        for i, n in enumerate(per_img):
            bl = _sample_boxes(rng, n, 416, 416)
            cl = rng.integers(0, 20, n)
            boxes[i, :n] = bl
            cls_idx[i, :n] = cl
            valid[i, :n] = True
            golden.append(
                assign_numpy(bl, cl, (416, 416), mode=mode, max_boxes=m)
            )

        tgt = assign(
            jnp.asarray(boxes), jnp.asarray(cls_idx), jnp.asarray(valid),
            (416, 416), mode=mode,
        )
        for i in range(b):
            g_cell, g_sig, g_twth, g_box, g_cls, g_valid = golden[i]
            vm = g_valid
            np.testing.assert_array_equal(np.asarray(tgt.cell[i])[vm], g_cell[vm])
            np.testing.assert_allclose(
                np.asarray(tgt.sig_txty[i])[vm], g_sig[vm], rtol=0, atol=2e-5
            )
            np.testing.assert_allclose(
                np.asarray(tgt.twth[i])[vm], g_twth[vm], rtol=1e-5, atol=1e-5
            )
            np.testing.assert_array_equal(np.asarray(tgt.cls[i])[vm], g_cls[vm])
            np.testing.assert_array_equal(np.asarray(tgt.valid[i]), g_valid)


def test_assign_numpy_is_float64_then_cast():
    # Bitwise-stability check: value must equal float64 math cast to f32,
    # not f32 math (parity gate, BASELINE.md).
    boxes = [[123.456789, 7.654321, 400.987654, 399.123456]]
    _, sig_txty, _, _, _, _ = assign_numpy(boxes, [0], (416, 416), mode="v2")
    cw = 416 / 13
    bx64 = (boxes[0][0] / cw + boxes[0][2] / cw) / 2
    expect = np.float32(bx64 - int(bx64))
    assert sig_txty[0, 0] == expect


def test_densify_matches_dense_reference_layout():
    rng = np.random.default_rng(1)
    b, m, hg, wg, c = 2, 3, 4, 4, 5
    boxes = np.zeros((b, m, 4), np.float32)
    cls_idx = rng.integers(0, c, (b, m)).astype(np.int32)
    valid = np.array([[True, True, False], [True, False, False]])
    boxes[0, 0] = [10, 20, 50, 60]
    boxes[0, 1] = [60, 60, 100, 100]
    boxes[1, 0] = [0, 0, 127, 127]

    tgt = assign(
        jnp.asarray(boxes), jnp.asarray(cls_idx), jnp.asarray(valid),
        (128, 128), mode="v2",
    )
    sig, twth, box, onehot, obj, img_id, vmask = densify(tgt, (hg, wg), c)

    assert sig.shape == (b * m, hg, wg, 2)
    assert obj.shape == (b * m, hg, wg)
    np.testing.assert_array_equal(np.asarray(img_id), [0, 0, 0, 1, 1, 1])

    # Box (0,0): center (30, 40) -> cell (y=1, x=0) at cell size 32.
    obj0 = np.asarray(obj[0])
    assert obj0[1, 0] == 1 and obj0.sum() == 1
    np.testing.assert_allclose(np.asarray(box[0, 1, 0]), [10, 20, 50, 60])
    assert np.asarray(onehot)[0, 1, 0, cls_idx[0, 0]] == 1

    # Invalid rows are all-zero maps.
    assert np.asarray(obj[2]).sum() == 0
    assert np.asarray(sig[2]).sum() == 0
