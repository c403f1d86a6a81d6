"""Model shape/semantics tests.

Run at reduced spatial resolution (stride-32 models work at any multiple of
32) so the single-core CPU CI stays fast; full-resolution paths are covered
by the benchmark harness on TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odc_tpu.models import YOLOv1, YOLOv2, get_model
from odc_tpu.models.backbones import (
    Darknet19Backbone,
    Darknet53Backbone,
    GoogLeNetBackbone,
)
from odc_tpu.models.yolov2 import quadrant_stack, space_to_depth


def _rand_img(key, n, h, w):
    return jax.random.uniform(key, (n, h, w, 3), minval=0, maxval=255)


def test_darknet19_taps():
    m = Darknet19Backbone()
    x = _rand_img(jax.random.key(0), 1, 64, 64)
    params = jax.jit(m.init)(jax.random.key(1), x)
    c5, c7 = m.apply(params, x)
    # Stride-16 and stride-32 taps (at 416: 26x26x512 / 13x13x1024).
    assert c5.shape == (1, 4, 4, 512)
    assert c7.shape == (1, 2, 2, 1024)


def test_googlenet_output_shape():
    m = GoogLeNetBackbone()
    x = _rand_img(jax.random.key(0), 1, 64, 64)
    params = jax.jit(m.init)(jax.random.key(1), x)
    h = m.apply(params, x)
    # Stride 32 with ceil-mode pools: 64 -> 2 (at 224: 7x7x1024,
    # reference googlenet.py:19).
    assert h.shape == (1, 2, 2, 1024)


def test_darknet53_shapes():
    m = Darknet53Backbone()
    x = _rand_img(jax.random.key(0), 1, 96, 96)
    params = jax.jit(m.init)(jax.random.key(1), x)
    c3, c4, c5 = m.apply(params, x)
    assert c3.shape[-1] == 256
    assert c4.shape[-1] == 512
    assert c5.shape[-1] == 1024


def test_yolov1_forward_and_decode():
    m = YOLOv1(num_grid_cell_in_height=2, num_grid_cell_in_width=2,
               image_size=(64, 64))
    x = _rand_img(jax.random.key(0), 2, 64, 64)
    params = jax.jit(m.init)(jax.random.key(1), x)
    y = m.apply(params, x)
    assert y.shape == (2, 2, 2, 30)
    det = m.decode(y)
    assert det.boxes.shape == (2, 2, 2, 2, 4)
    assert det.cls_spec.shape == (2, 2, 2, 2, 20)


def test_yolov2_forward_and_decode():
    m = YOLOv2(image_size=(64, 64))
    x = _rand_img(jax.random.key(0), 2, 64, 64)
    params = jax.jit(m.init)(jax.random.key(1), x)
    y = m.apply(params, x)
    assert y.shape == (2, 2, 2, 5, 25)
    det = m.decode(y)
    assert det.boxes.shape == (2, 2, 2, 5, 4)
    assert det.cls_spec.shape == (2, 2, 2, 5, 20)


def test_yolov2_multiscale_shapes():
    # Multi-scale training sizes 320..608 step 32 (reference yolov2.py:1558);
    # exercised here at two smaller multiples of 32.
    m = YOLOv2()
    x = _rand_img(jax.random.key(0), 1, 64, 64)
    params = jax.jit(m.init)(jax.random.key(1), x)
    for size in (96, 128):
        x2 = _rand_img(jax.random.key(2), 1, size, size)
        y = m.apply(params, x2)
        assert y.shape == (1, size // 32, size // 32, 5, 25)


def test_quadrant_stack_semantics():
    # Channel blocks must be the TL/TR/BL/BR quadrants (SURVEY.md note A).
    x = jnp.arange(1 * 4 * 4 * 2, dtype=jnp.float32).reshape(1, 4, 4, 2)
    out = quadrant_stack(x)
    assert out.shape == (1, 2, 2, 8)
    np.testing.assert_array_equal(out[0, :, :, 0:2], x[0, 0:2, 0:2, :])  # TL
    np.testing.assert_array_equal(out[0, :, :, 2:4], x[0, 0:2, 2:4, :])  # TR
    np.testing.assert_array_equal(out[0, :, :, 4:6], x[0, 2:4, 0:2, :])  # BL
    np.testing.assert_array_equal(out[0, :, :, 6:8], x[0, 2:4, 2:4, :])  # BR


def test_space_to_depth_semantics():
    x = jnp.arange(1 * 4 * 4 * 1, dtype=jnp.float32).reshape(1, 4, 4, 1)
    out = space_to_depth(x)
    assert out.shape == (1, 2, 2, 4)
    # out[0,0,0] collects the 2x2 block at (0,0): values 0,1,4,5.
    np.testing.assert_array_equal(np.asarray(out[0, 0, 0]), [0, 1, 4, 5])


def test_registry():
    m = get_model("YOLOv2")
    assert isinstance(m, YOLOv2)
    with pytest.raises(KeyError):
        get_model("YOLOv9")


def test_yolov1_train_mode_dropout():
    m = YOLOv1(num_grid_cell_in_height=2, num_grid_cell_in_width=2,
               image_size=(64, 64))
    x = _rand_img(jax.random.key(0), 1, 64, 64)
    variables = jax.jit(m.init)(jax.random.key(1), x)
    y1, _ = m.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    y2, _ = m.apply(
        variables, x, train=True,
        rngs={"dropout": jax.random.key(3)},
        mutable=["batch_stats"],
    )
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_yolov2_remat_grads():
    # remat=True must produce identical forward output and finite grads.
    m1 = YOLOv2(image_size=(64, 64))
    m2 = YOLOv2(image_size=(64, 64), remat=True)
    x = _rand_img(jax.random.key(0), 1, 64, 64)
    v = jax.jit(m1.init)(jax.random.key(1), x)
    y1 = m1.apply(v, x)
    y2 = m2.apply(v, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    def loss(params, model):
        return jnp.sum(model.apply(params, x) ** 2)

    g = jax.grad(lambda p: loss(p, m2))(v)
    assert np.isfinite(float(jax.tree.leaves(g["params"])[0].sum()))


def test_legacy_sigmoid_head_variant():
    """Reference legacy-draft model (yolov1 temp.py:52-70): all-sigmoid
    head output in (0, 1), trainable with the paper-sum loss."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from odc_tpu.models import YOLOv1
    from odc_tpu.losses.yolo_loss import yolo_loss_paper
    from odc_tpu.ops.assign import assign

    model = YOLOv1(legacy_sigmoid_head=True)
    x = jnp.zeros((2, 64, 64, 3), jnp.uint8)
    variables = model.init(jax.random.key(0), x)
    y = model.apply(variables, x, train=False)
    y_np = np.asarray(y)
    assert (y_np > 0).all() and (y_np < 1).all()  # the one sigmoid

    # model.decode must consume the pre-activated head WITHOUT a second
    # sigmoid: the decoded values equal the head output verbatim.
    det = model.decode(y, (64, 64))
    raw = y_np[..., :10].reshape(y_np.shape[0], y_np.shape[1], y_np.shape[2], 2, 5)
    np.testing.assert_array_equal(np.asarray(det.sig_txty), raw[..., 0:2])
    np.testing.assert_array_equal(np.asarray(det.conf), raw[..., 4])
    np.testing.assert_array_equal(np.asarray(det.cls_prob), y_np[..., -20:])

    boxes = jnp.asarray([[[4.0, 4.0, 40.0, 40.0]]] * 2)
    targets = assign(
        boxes, jnp.zeros((2, 1), jnp.int32),
        jnp.ones((2, 1), bool), (64, 64), mode="v1",
    )
    total, parts = yolo_loss_paper(det, targets)
    assert np.isfinite(float(total))
