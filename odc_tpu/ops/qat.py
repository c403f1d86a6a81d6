"""Quantization-aware fine-tuning (QAT) for the int8 PTQ engine.

PTQ costs ~2.6 mAP@.5 on a non-overfit model (PROFILE.md "int8 engine
accuracy (round 3)").  The standard fix — and a capability every serving
framework with a quantized runtime ships — is a short QAT fine-tune: run
the float training graph through *fake-quantization* ops that round-trip
every tensor through the exact int8 codes the deployed engine will use, and
let SGD pull the weights toward values that survive quantization.  The
straight-through estimator (STE) passes gradients through the
round/clip (Bengio et al. 2013; Jacob et al., CVPR 2018 — the
TensorFlow-Lite QAT recipe this mirrors).

Faithfulness contract: this forward is the float twin of
:func:`odc_tpu.ops.int8_engine.yolov2_int8_forward` —

* weights fake-quantize with the engine's symmetric per-out-channel scheme
  (same ``amax/127`` scale, same clip);
* activations fake-quantize with the engine's STATIC calibrated asymmetric
  per-tensor codes (same ``(pos+neg)/255`` scale, same zero point, same
  requant points incl. the quadrant-concat re-quantization);
* BatchNorm uses frozen running statistics, exactly as the engine folds
  them (QAT is a FINE-TUNE of a trained checkpoint — stats stay fixed,
  their scale/bias keep training);
* the head conv stays float (the engine keeps it bf16).

So `engine(params*, scales)` ≈ `qat_forward(params*, scales)` up to f32
vs int32 accumulation order (test-asserted; the residual is requant code
flips where the f32 conv rounds a sum the engine's int32 accumulator keeps
exact — sums reach ~1e8, past f32's 2^24 exact-integer range).  With
``exact=True`` (the fine-tune default) even that residual disappears: the
forward VALUE is the deployed engine itself (one extra STE around the whole
network — ``twin + stop_grad(engine - twin)``), the gradient is the float
twin's — QAT then literally trains the program being deployed.  The
reference has no quantization story at all (torch f32 end-to-end); this
subsystem exists for the TPU serving path (BASELINE.md north star:
≥5000 img/s needs int8).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from odc_tpu.ops.int8_engine import (
    _INPUT_AMAX,
    _LAST_OF_STAGE,
    _STAGE_OF,
    _act_qparams,
    _blocks,
    _conv_f32,
    _leaky,
    _pool,
    _quadrant,
    yolov2_int8_forward,
)
from odc_tpu.models.layers import IMAGENET_MEAN, IMAGENET_STD


def _ste(x, q):
    """Straight-through estimator: forward q, backward identity."""
    return x + lax.stop_gradient(q - x)


@jax.custom_vjp
def _value_of_grad_of(value, grad_path):
    """Forward: ``value`` BITWISE (no float round-trip — unlike
    ``x + stop_grad(q - x)``, which reintroduces one rounding).  Backward:
    the cotangent flows to ``grad_path``.  The exact-mode outer STE."""
    del grad_path
    return value


def _value_of_grad_of_fwd(value, grad_path):
    del grad_path
    return value, None


def _value_of_grad_of_bwd(_, g):
    return jnp.zeros_like(g), g


_value_of_grad_of.defvjp(_value_of_grad_of_fwd, _value_of_grad_of_bwd)


def fake_quant_weight(kernel, eps: float = 1e-8):
    """Engine-exact symmetric per-out-channel weight fake-quantization.

    Same scale (``amax/127``) and clip as
    :func:`odc_tpu.ops.int8_engine._quant_w`; the scale itself is treated
    as a constant of the step (stop-gradient), the codes get STE."""
    k = kernel.astype(jnp.float32)
    amax = jnp.maximum(
        jnp.max(jnp.abs(lax.stop_gradient(k)), axis=(0, 1, 2)), eps
    )
    s = amax / 127.0
    q = jnp.clip(jnp.round(k / s), -127, 127) * s
    return _ste(k, q)


def fake_quant_act(y, stat_row):
    """Engine-exact asymmetric per-tensor activation fake-quantization.

    ``stat_row`` is one calibrated ``[pos_max, neg_max]`` row of the
    :func:`odc_tpu.ops.int8_engine.calibrate` matrix; codes map
    ``[-neg, pos]`` onto the full int8 range with the engine's zero
    point."""
    s, z = _act_qparams(stat_row)
    q = jnp.clip(jnp.round(y / s + z), -128, 127)
    return _ste(y, (q - z) * s)


def _fake_quant_input(h0):
    """The plain-stem input quantization (symmetric, static scale)."""
    s = jnp.float32(_INPUT_AMAX / 127.0)
    q = jnp.clip(jnp.round(h0 / s), -127, 127) * s
    return _ste(h0, q)


def yolov2_qat_forward(
    variables,
    images,
    scales: jax.Array,
    num_anchor_box: int = 5,
    num_cls: int = 20,
    stem: str = "s2d",
    exact: bool = False,
):
    """Float twin of the int8 engine with fake-quant at every requant point.

    Args:
        variables: standard flax YOLOv2 (quadrant neck) variables.
        images: [N, H, W, 3] RGB uint8/float.
        scales: the [22, 2] calibration matrix
            (:func:`odc_tpu.ops.int8_engine.calibrate`); STATIC — frozen
            during fine-tuning, shared verbatim with the deployed engine.
        stem: "s2d" (the ``make_infer_fn`` product default — conv0 runs in
            float, its output quantizes at ``scales[0]``) or "plain" (input
            and conv0 weights quantize too).
        exact: wrap the whole network in one more STE so the forward VALUE
            is :func:`yolov2_int8_forward` itself (bitwise) while gradients
            still flow through the float twin.  Costs a second forward; the
            fine-tune default (``make_qat_train_step``) because it trains
            the exact program being deployed.
    Returns:
        Raw head [N, Hg, Wg, A, 5+C] float32 (same contract as
        ``YOLOv2.__call__`` / the engine).
    """
    blocks = _blocks(variables)
    if scales.shape != (len(blocks) + 1, 2):
        raise ValueError(
            f"scales must have shape ({len(blocks) + 1}, 2), got "
            f"{scales.shape}"
        )
    if stem not in ("plain", "s2d"):
        raise ValueError(f"stem must be 'plain' or 's2d', got {stem!r}")

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    h = (images.astype(jnp.float32) / 255.0 - mean) / std
    if stem == "plain":
        h = _fake_quant_input(h)

    c5 = None
    c5_idx = _LAST_OF_STAGE[4]
    for i, (conv_p, bn_p, bn_s) in enumerate(blocks[:20]):
        si = _STAGE_OF[i]
        first_of_stage = i == 0 or _STAGE_OF[i - 1] != si
        if first_of_stage and 1 <= si <= 5:
            h = _pool(h)

        # conv0 under the s2d stem runs with FLOAT weights (the engine's
        # 4x4/stride-2 lifted conv is bf16 — strictly more accurate than
        # quantizing it; bitwise-equal codes to bf16_front=1).  The twin
        # rounds conv0's inputs/weights through bf16 the same way (the cast
        # is differentiable), so the first quantization sees the engine's
        # values up to tap-summation order.
        kernel = conv_p["kernel"].astype(jnp.float32)
        if i == 0 and stem == "s2d":
            y = _conv_f32(
                h.astype(jnp.bfloat16).astype(jnp.float32),
                kernel.astype(jnp.bfloat16).astype(jnp.float32),
            )
        else:
            y = _conv_f32(h, fake_quant_weight(kernel))
        g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
        bias = conv_p.get("bias", jnp.zeros_like(bn_p["bias"]))
        y = _leaky((y + bias - bn_s["mean"]) * g + bn_p["bias"])
        h = fake_quant_act(y, scales[i])
        if i == c5_idx:
            c5 = h

    # Quadrant passthrough + concat: the engine re-quantizes both sides to
    # the common concat scale — fake-quant the concatenated value the same
    # way (each side is already at its own layer codes, so this reproduces
    # the engine's code→code requant in value space).
    neck_in = fake_quant_act(
        jnp.concatenate([_quadrant(c5), h], -1), scales[21]
    )

    conv_p, bn_p, bn_s = blocks[20]
    y = _conv_f32(neck_in, fake_quant_weight(conv_p["kernel"]))
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
    bias = conv_p.get("bias", jnp.zeros_like(bn_p["bias"]))
    neck = _leaky((y + bias - bn_s["mean"]) * g + bn_p["bias"])

    # Head: the engine keeps it bf16 — round the twin's inputs/weights
    # through bf16 the same way (differentiable casts).
    head_p = variables["params"]["Conv_0"]
    y = _conv_f32(
        neck.astype(jnp.bfloat16).astype(jnp.float32),
        head_p["kernel"].astype(jnp.bfloat16).astype(jnp.float32),
    )
    # ...including the engine's bf16 OUTPUT rounding (its head conv has no
    # preferred_element_type, so the accumulator rounds to bf16 before the
    # f32 cast and bias add).
    y = y.astype(jnp.bfloat16).astype(jnp.float32) + head_p["bias"]
    n, hg, wg, _ = y.shape
    y = y.reshape(n, hg, wg, num_anchor_box, 5 + num_cls)

    if exact:
        # Outer STE around the WHOLE network: forward value = the deployed
        # engine BITWISE (custom_vjp identity — `y + stop_grad(eng - y)`
        # would reintroduce one f32 rounding), gradient = the float twin's.
        y_eng = lax.stop_gradient(
            yolov2_int8_forward(
                variables, images, scales=scales,
                num_anchor_box=num_anchor_box, num_cls=num_cls, stem=stem,
            )
        )
        y = _value_of_grad_of(y_eng, y)
    return y


def make_qat_train_step(
    model,
    lambdas,
    scales: jax.Array,
    anchors=None,
    momentum: float = 0.9,
    weight_decay: float = 5e-4,
    stem: str = "s2d",
    exact: bool = True,
    augment_cfg=None,
    augment_warp_impl: str = "auto",
):
    """Build the jitted QAT fine-tune step: (state, batch, lr, rng) ->
    (state, metrics).

    Same optimizer semantics as :func:`odc_tpu.train.trainer.make_train_step`
    (torch-SGD + weight decay, donated state) but the forward is the
    fake-quantized engine twin and ``batch_stats`` are FROZEN (QAT
    fine-tunes a trained checkpoint; the engine folds the running stats).
    With ``exact=True`` (default) the loss is evaluated on the DEPLOYED
    engine's output bitwise (twin-gradient STE around the whole network —
    one extra forward per step, worth it for a short fine-tune).
    ``model`` supplies anchors/num_cls and must be the quadrant-neck YOLOv2
    the engine supports."""
    if type(model).__name__ != "YOLOv2" or model.neck != "quadrant":
        raise ValueError(
            "QAT mirrors the int8 engine, which hardcodes the quadrant-neck "
            f"YOLOv2 (got {type(model).__name__}, "
            f"neck={getattr(model, 'neck', None)!r})"
        )
    from odc_tpu.losses.yolo_loss import yolo_loss
    from odc_tpu.ops.assign import YoloTargets

    anchors = anchors if anchors is not None else model.anchors

    def loss_fn(params, batch_stats, batch, rng):
        image = batch.image
        targets = YoloTargets(
            cell=batch.cell, sig_txty=batch.sig_txty, twth=batch.twth,
            box=batch.box, cls=batch.cls, valid=batch.valid,
        )
        if augment_cfg is not None:
            from odc_tpu.ops.assign import assign
            from odc_tpu.ops.augment import augment_batch

            rng, aug_key = jax.random.split(rng)
            image, boxes, valid = augment_batch(
                aug_key, image, batch.box, batch.valid, augment_cfg,
                warp_impl=augment_warp_impl,
            )
            targets = assign(
                boxes, batch.cls, valid, image.shape[1:3], mode="v2"
            )
        y = yolov2_qat_forward(
            {"params": params, "batch_stats": batch_stats},
            image, scales,
            num_anchor_box=model.num_anchor_box, num_cls=model.num_cls,
            stem=stem, exact=exact,
        )
        det = model.decode(y, image.shape[1:3])
        total, parts = yolo_loss(
            det, targets, lambdas, mode="v2", anchors=anchors
        )
        return total, parts

    @functools.partial(jax.jit, donate_argnums=(0,))
    def qat_step(state, batch, lr, rng):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, rng
        )
        new_mom = jax.tree.map(
            lambda b, g, p: momentum * b + g + weight_decay * p,
            state.momentum, grads, state.params,
        )
        new_params = jax.tree.map(
            lambda p, b: p - lr * b, state.params, new_mom
        )
        metrics = {
            "loss": loss,
            "loss_xy": parts.xy,
            "loss_wh": parts.wh,
            "loss_conf": parts.conf,
            "loss_noobj": parts.noobj,
            "loss_cls": parts.cls,
        }
        return (
            state.replace(
                params=new_params, momentum=new_mom, step=state.step + 1
            ),
            metrics,
        )

    return qat_step
