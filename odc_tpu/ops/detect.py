"""End-to-end batched inference: images -> boxes, entirely on device.

This is the path the headline benchmark measures (BASELINE.md: YOLOv2-416
e2e decode→NMS images/sec/chip): one jitted program running
backbone/neck/head on the MXU, the fused decode, and per-image fixed-shape
NMS — no host round-trip between pixels and final boxes (the reference
crosses the device boundary twice per image, ``models/yolov2.py:667,
720-724``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from odc_tpu.core.nms import nms_padded, class_offset_boxes


def make_infer_fn(
    model,
    conf_thre: float = 0.9,
    iou_thre: float = 0.5,
    max_keep: int = 64,
    class_wise: bool = False,
    int8_neck: bool = False,
    int8_scales=None,
    int8_stem: str = "s2d",
    compact: bool = False,
) -> Callable:
    """Build ``infer(variables, images, conf_thre=..., iou_thre=...) ->
    (boxes, conf, cls_scores, keep)`` with leading batch dim and static
    ``max_keep`` shapes.  Jittable; the thresholds are *traced scalars* (data,
    not shape), so one compiled program serves every threshold pair — the
    reference accepts them per detect() call (``models/yolov1.py:439-443``).
    Defaults are the constructor values; ``class_wise`` upgrades the
    reference's class-agnostic suppression (SURVEY.md note E).

    ``int8_neck`` (YOLOv2 only) swaps the 3x3 neck conv for the dynamic-PTQ
    int8 path (``odc_tpu.ops.quantize``): measured 1.78x faster on the MXU
    with ~1% layer-level quantization error; bf16 stays the parity path.

    ``int8_scales`` (YOLOv2 only): run the FULL int8 PTQ engine
    (``odc_tpu.ops.int8_engine``) with these calibrated activation scales —
    the configuration that clears the 5000 img/s north star (PROFILE.md).
    ``int8_stem`` picks the engine's first-layer formulation: ``"s2d"``
    (default) folds conv0+pool into one 4x4/stride-2 bf16 conv — measured
    faster AND strictly more accurate than quantizing the first conv
    (PROFILE.md round 4 "the front"); ``"plain"`` is the all-int8 path."""
    if int8_scales is not None or int8_neck:
        # The int8 paths hardcode the Darknet-19/quadrant YOLOv2 graph; a
        # space_to_depth model would silently run the quadrant reorg and
        # produce wrong boxes.
        if type(model).__name__ != "YOLOv2" or model.neck != "quadrant":
            raise ValueError(
                "int8_scales/int8_neck require a YOLOv2 with neck='quadrant' "
                f"(got {type(model).__name__}, neck="
                f"{getattr(model, 'neck', None)!r})"
            )

    def infer(variables, images, conf_thre=conf_thre, iou_thre=iou_thre):
        if int8_scales is not None:
            from odc_tpu.ops.int8_engine import yolov2_int8_forward

            y = yolov2_int8_forward(
                variables, images, scales=int8_scales,
                num_anchor_box=model.num_anchor_box, num_cls=model.num_cls,
                stem=int8_stem,
            )
        else:
            apply_kwargs = {}
            if int8_neck:
                from odc_tpu.ops.quantize import int8_conv_bn_leaky

                neck_p = variables["params"]["ConvBnLeaky_0"]
                neck_s = variables["batch_stats"]["ConvBnLeaky_0"]
                apply_kwargs["neck_override"] = lambda h: int8_conv_bn_leaky(
                    h,
                    neck_p["Conv_0"],
                    neck_p["BatchNorm_0"],
                    neck_s["BatchNorm_0"],
                    out_dtype=model.dtype,
                )
            y = model.apply(variables, images, train=False, **apply_kwargs)
        det = model.decode(y, images.shape[1:3])
        b = images.shape[0]
        num_cls = det.cls_spec.shape[-1]
        boxes = det.boxes.reshape(b, -1, 4)
        conf = det.conf.reshape(b, -1)
        cls_scores = det.cls_spec.reshape(b, -1, num_cls)

        if class_wise:
            sup_boxes = class_offset_boxes(boxes, jnp.argmax(cls_scores, -1))
        else:
            sup_boxes = None

        def one(bb, cc, ss, sb):
            return nms_padded(
                bb, cc, ss, conf_thre, iou_thre, max_keep, suppress_boxes=sb
            )

        if sup_boxes is None:
            one_fn = lambda bb, cc, ss: one(bb, cc, ss, None)
            out = jax.vmap(one_fn)(boxes, conf, cls_scores)
        else:
            out = jax.vmap(one)(boxes, conf, cls_scores, sup_boxes)
        if not compact:
            return out
        # Compact outputs: per-box (label, score) instead of the full
        # [B, K, C] class-score tensor — 5x less device->host traffic for
        # the streaming-eval path (labels come from argmax of the
        # class-specific score, reference yolov1.py:529-534).
        o_boxes, o_conf, o_cls, o_keep = out
        return (
            o_boxes,
            o_conf,
            jnp.argmax(o_cls, axis=-1).astype(jnp.int32),
            jnp.max(o_cls, axis=-1),
            o_keep,
        )

    return infer


def jit_infer_fn(model, **kwargs) -> Callable:
    return jax.jit(make_infer_fn(model, **kwargs))


def make_native_infer_fn(
    model,
    conf_thre: float = 0.9,
    iou_thre: float = 0.5,
    max_keep: int = 64,
    class_wise: bool = False,
    int8_scales=None,
    int8_stem: str = "s2d",
) -> Callable:
    """Native-size-parity inference over a PADDED batch (YOLOv2 only).

    ``infer(variables, images, valid_hw, conf_thre=..., iou_thre=...)``:
    images are padded (top-left aligned, zero fill) to a common bucket;
    ``valid_hw`` [B, 2] int32 carries each image's native (h, w).  The
    masked forward (``YOLOv2.__call__(valid_hw=...)``) makes every image's
    valid grid cells equal its NATIVE-size run — the reference's v2 eval
    semantics (no resize, floor pooling, ``models/yolov2.py:666-667``) —
    while the batch shares ONE compiled program per bucket shape.  Decode
    uses per-image native cell sizes (``h/ (h//32)``, the reference's
    ``predict()`` scaling) so boxes come out directly in native pixel
    coordinates; cells beyond an image's grid get conf=0 (requires
    ``conf_thre > 0``, true of every reference threshold).

    ``int8_scales`` runs the FULL int8 PTQ engine under the same masked
    native-size semantics (``yolov2_int8_forward(valid_hw=...)``) — the
    shipped serving precision evaluated under the reference's native-size
    v2 eval contract."""
    if type(model).__name__ != "YOLOv2":
        raise ValueError("make_native_infer_fn supports YOLOv2 only "
                         "(v1 resizes to the network size; use make_infer_fn)")
    if int8_scales is not None and model.neck != "quadrant":
        raise ValueError(
            "int8_scales require a YOLOv2 with neck='quadrant' (the engine "
            f"hardcodes the quadrant graph; got neck={model.neck!r})"
        )

    def infer(variables, images, valid_hw, conf_thre=conf_thre,
              iou_thre=iou_thre):
        if int8_scales is not None:
            from odc_tpu.ops.int8_engine import yolov2_int8_forward

            y = yolov2_int8_forward(
                variables, images, scales=int8_scales,
                num_anchor_box=model.num_anchor_box, num_cls=model.num_cls,
                stem=int8_stem, valid_hw=valid_hw,
            )
        else:
            y = model.apply(variables, images, train=False,
                            valid_hw=valid_hw)
        b, hg, wg, a, _ = y.shape
        # Decode in grid units (image_hw == grid dims -> cell size 1).
        det = model.decode(y, (hg, wg))
        gh, gw = valid_hw[:, 0] // 32, valid_hw[:, 1] // 32
        dt = det.boxes.dtype
        sx = (valid_hw[:, 1] / gw).astype(dt)  # native cell width
        sy = (valid_hw[:, 0] / gh).astype(dt)
        scale = jnp.stack([sx, sy, sx, sy], -1)[:, None, None, None, :]
        boxes = (det.boxes * scale).reshape(b, -1, 4)

        cell_valid = (
            (jax.lax.broadcasted_iota(jnp.int32, (1, hg), 1) < gh[:, None])
            [:, :, None]
            & (jax.lax.broadcasted_iota(jnp.int32, (1, wg), 1) < gw[:, None])
            [:, None, :]
        )  # [B, Hg, Wg]
        conf = jnp.where(cell_valid[..., None], det.conf, 0.0).reshape(b, -1)
        num_cls = det.cls_spec.shape[-1]
        cls_scores = det.cls_spec.reshape(b, -1, num_cls)

        if class_wise:
            sup = class_offset_boxes(boxes, jnp.argmax(cls_scores, -1))
            out = jax.vmap(
                lambda bb, cc, ss, sb: nms_padded(
                    bb, cc, ss, conf_thre, iou_thre, max_keep,
                    suppress_boxes=sb,
                )
            )(boxes, conf, cls_scores, sup)
        else:
            out = jax.vmap(
                lambda bb, cc, ss: nms_padded(
                    bb, cc, ss, conf_thre, iou_thre, max_keep
                )
            )(boxes, conf, cls_scores)
        o_boxes, o_conf, o_cls, o_keep = out
        # Compact outputs (the streaming-eval contract).
        return (
            o_boxes,
            o_conf,
            jnp.argmax(o_cls, axis=-1).astype(jnp.int32),
            jnp.max(o_cls, axis=-1),
            o_keep,
        )

    return infer
