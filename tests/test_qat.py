"""QAT fine-tuning: the fake-quant forward is the float twin of the int8
engine, gradients flow through the STE, and a short fine-tune reduces the
DEPLOYED engine's loss (the whole point of the subsystem)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odc_tpu.models import YOLOv2
from odc_tpu.ops.int8_engine import calibrate, yolov2_int8_forward
from odc_tpu.ops.qat import make_qat_train_step, yolov2_qat_forward


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    model = YOLOv2(dtype=jnp.float32)
    img = jnp.asarray(rng.integers(0, 255, (2, 96, 128, 3), dtype=np.uint8))
    variables = model.init(jax.random.key(0), img)
    scales = calibrate(variables, img)
    return model, variables, img, scales


@pytest.mark.parametrize("stem", ["plain", "s2d"])
def test_qat_forward_matches_engine(setup, stem):
    """engine(params, scales) ≈ qat_forward(params, scales): both apply the
    SAME weight codes, activation codes and requant points; the residual is
    f32-vs-int32 accumulation order plus rare boundary code flips — far
    smaller than either one's distance to the float model."""
    model, variables, img, scales = setup
    ref = np.asarray(model.apply(variables, img, train=False))
    eng = np.asarray(
        yolov2_int8_forward(variables, img, scales=scales, stem=stem)
    )
    qat = np.asarray(
        jax.jit(
            lambda v, x: yolov2_qat_forward(v, x, scales, stem=stem)
        )(variables, img)
    )
    err_eng = np.abs(eng - ref)
    err_qat = np.abs(qat - ref)
    # The twin models the engine, not the float model: it must sit at the
    # engine's distance from the reference...
    assert err_qat.max() <= 1.5 * err_eng.max() + 1e-4
    # ...and meaningfully closer to the engine than the engine is to the
    # reference.  The floor is f32-vs-int32 accumulation code flips plus
    # bf16-ulp head-rounding (the residual is all exact powers of two) —
    # irreducible in any float twin; `exact=True` removes it (below).
    # Measured: s2d (the product default) ~0.35x, plain ~0.58x (its int8
    # conv0 flips codes earlier, so flips compound through more layers).
    d = np.abs(qat - eng)
    assert d.mean() <= 0.75 * err_eng.mean() + 1e-6, (
        d.mean(), err_eng.mean()
    )


@pytest.mark.parametrize("stem", ["plain", "s2d"])
def test_qat_exact_mode_is_engine_bitwise(setup, stem):
    """exact=True (the fine-tune default): the forward VALUE is the deployed
    engine bitwise, while gradients still flow (finite, nonzero) through the
    float twin's path — the outer STE adds only a stop_gradient residual."""
    model, variables, img, scales = setup
    # Jit the engine reference: eager-vs-jit f32 arithmetic (FMA, fusion)
    # flips requant codes, so "bitwise" is a claim about the compiled
    # program — which is what serving deploys.  Under jit the exact-mode
    # twin subgraph is dead (value comes from the engine via the
    # custom_vjp identity) and DCE leaves exactly the engine graph.
    eng = np.asarray(jax.jit(
        lambda v, x: yolov2_int8_forward(v, x, scales=scales, stem=stem)
    )(variables, img))
    fwd = jax.jit(
        lambda v, x, e: yolov2_qat_forward(
            v, x, scales, stem=stem, exact=e
        ),
        static_argnums=2,
    )
    np.testing.assert_array_equal(np.asarray(fwd(variables, img, True)), eng)

    def loss(params, exact):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        return jnp.sum(jnp.square(
            yolov2_qat_forward(v, img, scales, stem=stem, exact=exact)
        ))

    g_exact = jax.jit(jax.grad(loss), static_argnums=1)(
        variables["params"], True
    )
    leaves = jax.tree.leaves(g_exact)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(np.any(np.asarray(g) != 0) for g in leaves)


def test_qat_scales_shape_guard(setup):
    model, variables, img, _ = setup
    with pytest.raises(ValueError, match="scales"):
        yolov2_qat_forward(variables, img, jnp.zeros((5, 2)))
    with pytest.raises(ValueError, match="stem"):
        yolov2_qat_forward(variables, img, jnp.ones((22, 2)), stem="s2d2")


def test_qat_rejects_non_engine_model():
    from odc_tpu.losses.yolo_loss import Lambdas

    model = YOLOv2(neck="space_to_depth")
    with pytest.raises(ValueError, match="quadrant"):
        make_qat_train_step(model, Lambdas(), jnp.ones((22, 2)))


def test_finetune_qat_driver(tmp_path):
    """The user-facing QAT driver (odc_tpu.train.qat / train.py --qat):
    checkpoint -> pipeline calibration -> fine-tune epochs -> tuned
    best/final checkpoints + the frozen scales artifact."""
    import os

    from odc_tpu.data.pipeline import DetectionPipeline
    from odc_tpu.data.voc import VOC, make_synthetic_voc
    from odc_tpu.train import TrainState
    from odc_tpu.train.qat import calibrate_from_pipeline, finetune_qat

    root = str(tmp_path / "voc")
    make_synthetic_voc(root, num_train=8, num_val=4, image_hw=(96, 96))
    voc = VOC(dataset_dir=root)
    hw = (96, 96)
    train_pipe = DetectionPipeline(
        voc.train_dataset, image_hw=hw, batch_size=4, max_boxes=4,
        mode="v2", prefetch=0,
    )
    val_pipe = DetectionPipeline(
        voc.val_dataset, image_hw=hw, batch_size=4, max_boxes=4,
        mode="v2", shuffle=False, drop_remainder=False, prefetch=0,
    )

    model = YOLOv2(dtype=jnp.float32)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1,) + hw + (3,), jnp.uint8)
    )
    scales = calibrate_from_pipeline(variables, train_pipe, num_batches=1)
    assert scales.shape == (22, 2)

    ckpt_dir = str(tmp_path / "qat_ckpt")
    bs_before = jax.tree.map(np.copy, variables["batch_stats"])
    state, hist = finetune_qat(
        model, TrainState.create(variables), train_pipe, val_pipe, scales,
        ckpt_path=ckpt_dir, epochs=2, lr=1e-4,
    )
    for name in ("best_qat_model.ckpt", "final_qat_model.ckpt",
                 "int8_scales.npy", "metrics.jsonl"):
        assert os.path.exists(os.path.join(ckpt_dir, name)), name
    assert len(hist["train_loss_mean_list"]) == 2
    assert len(hist["val_loss_list"]) == 2
    assert all(np.isfinite(v) for v in hist["val_loss_list"])
    # The shipped scales are the ones the fine-tune froze.
    np.testing.assert_array_equal(
        np.load(os.path.join(ckpt_dir, "int8_scales.npy")),
        np.asarray(scales),
    )
    # BN statistics frozen through the driver too.
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        state.batch_stats, bs_before,
    )


def test_qat_finetune_reduces_engine_loss(setup):
    """The deliverable: a few QAT steps (fake-quant forward, STE gradients,
    frozen BN stats) reduce the loss of the DEPLOYED int8 engine evaluated
    with the same frozen scales."""
    from odc_tpu.losses.yolo_loss import Lambdas, yolo_loss
    from odc_tpu.ops.assign import assign
    from odc_tpu.train import TrainState

    model, variables, img, scales = setup
    lambdas = Lambdas()

    # Two synthetic boxes per image, assigned on device like the pipeline.
    boxes = jnp.asarray(
        [[[10.0, 12.0, 60.0, 70.0], [40.0, 30.0, 90.0, 80.0]]] * 2
    )
    cls = jnp.asarray([[3, 7]] * 2, jnp.int32)
    valid = jnp.ones((2, 2), bool)
    targets = assign(boxes, cls, valid, img.shape[1:3], mode="v2")

    from odc_tpu.data.pipeline import Batch

    batch = Batch(
        image=img, cell=targets.cell, sig_txty=targets.sig_txty,
        twth=targets.twth, box=targets.box, cls=targets.cls,
        valid=targets.valid, img_id=jnp.arange(2, dtype=jnp.int32),
    )

    @jax.jit
    def engine_loss(variables):
        y = yolov2_int8_forward(variables, img, scales=scales, stem="s2d")
        det = model.decode(y, img.shape[1:3])
        total, _ = yolo_loss(
            det, targets, lambdas, mode="v2", anchors=model.anchors
        )
        return total

    l0 = float(engine_loss(variables))

    # The step donates its state; copy so the module-scoped fixture's
    # arrays survive the first donation.
    state = TrainState.create(jax.tree.map(jnp.copy, variables))
    step = make_qat_train_step(
        model, lambdas, scales, momentum=0.9, weight_decay=0.0
    )
    rng = jax.random.key(2)
    for _ in range(12):
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, jnp.float32(1e-3), sub)
    assert np.isfinite(float(metrics["loss"]))

    tuned = {"params": state.params, "batch_stats": state.batch_stats}
    l1 = float(engine_loss(tuned))
    assert l1 < l0, (l0, l1)
    # BN statistics are frozen during QAT (the engine folds them).
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        state.batch_stats, variables["batch_stats"],
    )
