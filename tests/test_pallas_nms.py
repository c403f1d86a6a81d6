"""Pallas NMS kernel vs the XLA reference path (interpret mode on CPU;
the driver's TPU bench exercises the compiled kernel)."""

import numpy as np
import pytest

import jax.numpy as jnp

from odc_tpu.core.nms import nms_padded
from odc_tpu.ops.pallas.nms_kernel import nms_padded_pallas


def _dets(seed, n=300, num_cls=5):
    rng = np.random.default_rng(seed)
    boxes = rng.uniform(0, 100, (n, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, (n, 2)).astype(np.float32)
    conf = rng.uniform(0, 1, n).astype(np.float32)
    cls_scores = rng.uniform(0, 1, (n, num_cls)).astype(np.float32)
    return boxes, conf, cls_scores


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("conf_thre", [0.5, 0.9])
def test_pallas_matches_xla_nms(seed, conf_thre):
    boxes, conf, cls_scores = _dets(seed)
    ref = nms_padded(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_scores),
        conf_thre, 0.5, max_keep=128,
    )
    got = nms_padded_pallas(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_scores),
        conf_thre, 0.5, interpret=True,
    )
    for name, r, g in zip(("boxes", "conf", "cls", "keep"), ref, got):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(g), rtol=1e-6, err_msg=name
        )


def test_pallas_small_n_padding():
    boxes, conf, cls_scores = _dets(3, n=17)
    ref = nms_padded(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_scores),
        0.3, 0.5, max_keep=128,
    )
    got = nms_padded_pallas(
        jnp.asarray(boxes), jnp.asarray(conf), jnp.asarray(cls_scores),
        0.3, 0.5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ref[3]), np.asarray(got[3]))
    np.testing.assert_allclose(
        np.asarray(ref[0]), np.asarray(got[0]), rtol=1e-6
    )
