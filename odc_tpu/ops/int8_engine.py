"""Full-int8 PTQ inference engine for YOLOv2 (TensorRT-style).

PROFILE.md's roofline shows the bf16 ceiling for this architecture on
TPU v5e is ~4 300-4 500 img/s: the big convs already run at 78-87% of the
197 TF/s bf16 peak and the front of the network is HBM-bound.  int8 halves
every activation's bytes (the memory-bound stages) and unlocks the 394
TF/s MXU path on the widest contraction (the neck) — measured end-to-end
this engine clears the 5 000 img/s north star (see bench.py).

Design (classic post-training quantization):

* **Weights**: symmetric per-output-channel int8, quantized in-graph from
  the f32 checkpoint (no separate artifact).
* **Activations**: ASYMMETRIC per-tensor int8 with STATIC (pos, neg)
  ranges from a one-off calibration pass — LeakyReLU outputs are strongly
  one-sided, so asymmetric codes roughly double effective resolution
  (measured: mAP[.5:.95] becomes lossless vs bf16 where symmetric codes
  lost 6 points).  The zero-point correction is free: the interior term
  folds into the bias, the border term is fused rank-1 broadcasts, and
  the zero point rides INSIDE the requant round (a standalone post-round
  add broke XLA's epilogue fusion, −17%).
* **BN folding**: inference BatchNorm folds into the per-channel dequant
  affine, so each layer is ``conv(int8) -> int32 -> A[c]*acc + B[c] ->
  leaky -> round/clip -> int8`` — one fused epilogue per conv.
* **Pools** run directly on int8 (max commutes with the monotone
  round/clip requant).
* The quadrant passthrough and the backbone tap carry different scales;
  both sides are re-quantized to their max before the concat feeding the
  neck.

The engine consumes the standard flax ``variables`` of
:class:`odc_tpu.models.yolov2.YOLOv2` (quadrant neck) — it is an
*inference runtime* over trained checkpoints, the bf16 model remains the
training/parity path.  Reference architecture covered: Darknet-19 net1-7
(``models/backbones/darknet19.py:22-221``), quadrant neck + conv head
(``models/yolov2.py:41-431``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from odc_tpu.models.backbones.darknet19 import _STAGES
from odc_tpu.models.layers import IMAGENET_MEAN, IMAGENET_STD

# Input activation scale is static: ImageNet-normalized pixels span
# [-(0.485/0.229), (1-0.406)/0.225] ⊂ [-2.2, 2.7].
_INPUT_AMAX = 2.7

# LeakyReLU(0.1) outputs are strongly one-sided (the negative tail is at
# most a tenth of the positive range): symmetric int8 wastes much of the
# code range.  Activations therefore use ASYMMETRIC quantization over the
# calibrated [-neg_max, pos_max] interval: s = (pos+neg)/255, zero point
# z = -128 + round(neg/s).  The conv-side zero-point correction costs
# nothing: inputs are padded with z instead of 0 (padded cells dequantize
# to exactly 0) and a per-channel bias shift of z * sum(w_q) absorbs the
# rest.


def _leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _blocks(variables) -> List[Tuple[Dict, Dict, Dict]]:
    """(conv_params, bn_params, bn_stats) for every ConvBnLeaky in forward
    order: 20 backbone convs then the neck conv."""
    p = variables["params"]
    s = variables["batch_stats"]
    bb_p, bb_s = p["Darknet19Backbone_0"], s["Darknet19Backbone_0"]
    out = []
    for si, stage in enumerate(_STAGES):
        for ci in range(len(stage)):
            blk = f"ConvBnLeaky_{ci}"
            out.append(
                (
                    bb_p[f"stage{si + 1}"][blk]["Conv_0"],
                    bb_p[f"stage{si + 1}"][blk]["BatchNorm_0"],
                    bb_s[f"stage{si + 1}"][blk]["BatchNorm_0"],
                )
            )
    out.append(
        (
            p["ConvBnLeaky_0"]["Conv_0"],
            p["ConvBnLeaky_0"]["BatchNorm_0"],
            s["ConvBnLeaky_0"]["BatchNorm_0"],
        )
    )
    return out


def _quant_w(kernel, eps=1e-8):
    k = kernel.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(k), axis=(0, 1, 2)), eps)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _affine(conv_p, bn_p, bn_s, sw, sx, eps=1e-5):
    """Per-channel (A, B) of the fused dequant+bias+BN epilogue."""
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    a = (sx * sw) * g
    bias = conv_p.get("bias", jnp.zeros_like(bn_p["bias"]))
    b = (bias - bn_s["mean"]) * g + bn_p["bias"]
    return a, b


def _act_qparams(stat_row):
    """[pos_max, neg_max] -> (scale, zero_point) mapping
    [-neg_max, pos_max] onto the full int8 range."""
    pos, neg = stat_row[0], stat_row[1]
    s = jnp.maximum(pos + neg, 1e-6) / 255.0
    z = jnp.round(-128.0 + neg / s)
    return s, z


def _quant_act(y, s, z):
    # z is integer-valued, so round(y/s) + z == round(y/s + z); keeping the
    # add INSIDE the round preserves XLA's conv-epilogue fusion (a
    # standalone post-round add measured a 17% throughput hit).
    return jnp.clip(jnp.round(y / s + z), -128, 127).astype(jnp.int8)


def _range_stat(y, stat):
    """[pos_max, neg_max] of an activation (calibration mode)."""
    return jnp.stack(
        [stat(jnp.maximum(y, 0.0)), stat(jnp.maximum(-y, 0.0))]
    )


def _conv_i8(xq, wq):
    dn = lax.conv_dimension_numbers(xq.shape, wq.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )


def _zp_border_correction(wq, z, hw):
    """Zero-point correction for a 3x3 SAME conv over asymmetric codes.

    With input codes q (x = s*(q - z)), a plain SAME-0 conv computes
    acc = sum_in(w*q); the true conv is s*acc - s*z*wsum + s*z*W_out(pos),
    where W_out(pos) is the kernel mass falling outside the image — zero in
    the interior, rank-1 row/col patterns at the borders.  Returns the
    (z*W_out) term as broadcastable [1, H, W, C]-shaped math built from
    outer products of border masks and kernel-edge sums: XLA fuses it into
    the dequant epilogue — no padded input copy (the copy cost 18%
    throughput when measured), no big constants."""
    h, w = hw
    wf = wq.astype(jnp.float32)
    wtop = wf[0].sum((0, 1))
    wbot = wf[-1].sum((0, 1))
    wleft = wf[:, 0].sum((0, 1))
    wright = wf[:, -1].sum((0, 1))
    wtl = wf[0, 0].sum(0)
    wtr = wf[0, -1].sum(0)
    wbl = wf[-1, 0].sum(0)
    wbr = wf[-1, -1].sum(0)

    row = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    top = (row == 0).astype(jnp.float32)
    bot = (row == h - 1).astype(jnp.float32)
    left = (col == 0).astype(jnp.float32)
    right = (col == w - 1).astype(jnp.float32)
    w_out = (
        top * wtop + bot * wbot + left * wleft + right * wright
        - top * left * wtl - top * right * wtr
        - bot * left * wbl - bot * right * wbr
    )
    return z * w_out


def _zp_border_correction_native(wq, z, hw, eh, ew):
    """Zero-point correction for a 3x3 SAME conv over a PADDED batch with
    per-image native extents (the masked native-size-parity path).

    Out-of-extent cells are masked to the zero-point code ``z``
    (:func:`_mask_codes`), which dequantizes to exactly 0 — each image's
    interior bottom/right boundary therefore gets its "conv padding" from
    the masked region NATURALLY, with no correction term.  What remains:

    * top (bucket row 0) and left (col 0): always implicit conv 0-padding
      (codes 0 where the zero-point fold assumed ``z``) — the static rings
      of :func:`_zp_border_correction`;
    * bottom/right: ONLY for images whose extent reaches the bucket edge
      (``eh == H`` / ``ew == W``) — otherwise the z-masked rows/cols below
      the extent already supply the padding.

    ``eh``/``ew`` are [B] int32 extents; returns a broadcastable
    [B, H, W, C] fused-rank-1 term like the static variant."""
    h, w = hw
    wf = wq.astype(jnp.float32)
    wtop = wf[0].sum((0, 1))
    wbot = wf[-1].sum((0, 1))
    wleft = wf[:, 0].sum((0, 1))
    wright = wf[:, -1].sum((0, 1))
    wtl = wf[0, 0].sum(0)
    wtr = wf[0, -1].sum(0)
    wbl = wf[-1, 0].sum(0)
    wbr = wf[-1, -1].sum(0)

    row = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    at_h = (eh == h).astype(jnp.float32)[:, None, None, None]
    at_w = (ew == w).astype(jnp.float32)[:, None, None, None]
    top = (row == 0).astype(jnp.float32)
    bot = (row == h - 1).astype(jnp.float32) * at_h
    left = (col == 0).astype(jnp.float32)
    right = (col == w - 1).astype(jnp.float32) * at_w
    w_out = (
        top * wtop + bot * wbot + left * wleft + right * wright
        - top * left * wtl - top * right * wtr
        - bot * left * wbl - bot * right * wbr
    )
    return z * w_out


def _mask_codes(h, eh, ew, z):
    """Set cells beyond each image's (eh, ew) extent to the zero-point code
    ``z`` (which dequantizes to exactly 0) — the int8 analog of the bf16
    masked forward's zeroing (``models/layers.py::extent_mask``): border
    windows of the next k>1 conv then read exactly what a native-size run's
    implicit SAME padding would supply."""
    from odc_tpu.models.layers import extent_mask

    zc = jnp.round(z).astype(h.dtype) if z is not None else h.dtype.type(0)
    return jnp.where(extent_mask(h.shape, eh, ew), h, zc)


def _zp_border_correction_lifted(wq, z, hw):
    """Zero-point correction for a LIFTED 3x3 conv (`_s2d_stem_kernel`:
    4x4/stride-2, explicit padding (1,2), channel layout p*C+c with phase
    p = pi*2+pj).

    Same math as :func:`_zp_border_correction`, but on the lifted grid a
    fine-resolution border row maps to exactly one (output row, phase-row)
    pair: fine row 0 is (i=0, pi=0) and fine row 2H-1 is (i=H-1, pi=1) —
    so the top-edge kernel mass applies only to the pi=0 channel groups of
    output row 0, the bottom edge only to the pi=1 groups of row H-1, and
    likewise for columns.  Still rank-1 iota broadcasts; XLA fuses it into
    the dequant epilogue.  ``hw`` is the lifted OUTPUT spatial shape."""
    h, w = hw
    wf = wq.astype(jnp.float32)
    wtop = wf[0].sum((0, 1))
    wbot = wf[-1].sum((0, 1))
    wleft = wf[:, 0].sum((0, 1))
    wright = wf[:, -1].sum((0, 1))
    wtl = wf[0, 0].sum(0)
    wtr = wf[0, -1].sum(0)
    wbl = wf[-1, 0].sum(0)
    wbr = wf[-1, -1].sum(0)
    zz = jnp.zeros_like(wtop)

    # phase order p = pi*2 + pj: (0,0), (0,1), (1,0), (1,1)
    top_v = jnp.concatenate([wtop, wtop, zz, zz])
    bot_v = jnp.concatenate([zz, zz, wbot, wbot])
    left_v = jnp.concatenate([wleft, zz, wleft, zz])
    right_v = jnp.concatenate([zz, wright, zz, wright])
    tl_v = jnp.concatenate([wtl, zz, zz, zz])
    tr_v = jnp.concatenate([zz, wtr, zz, zz])
    bl_v = jnp.concatenate([zz, zz, wbl, zz])
    br_v = jnp.concatenate([zz, zz, zz, wbr])

    row = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    top = (row == 0).astype(jnp.float32)
    bot = (row == h - 1).astype(jnp.float32)
    left = (col == 0).astype(jnp.float32)
    right = (col == w - 1).astype(jnp.float32)
    w_out = (
        top * top_v + bot * bot_v + left * left_v + right * right_v
        - top * left * tl_v - top * right * tr_v
        - bot * left * bl_v - bot * right * br_v
    )
    return z * w_out


def _s2d_stem_kernel(k):
    """Lift the stage-1 3x3/s1 conv kernel [3,3,Cin,Cout] to a 4x4/s2
    kernel [4,4,Cin,4*Cout] computing all 4 output phases at once.

    With explicit padding (1,2) and stride 2, output cell (i,j) reads
    input rows 2i-1..2i+2 — exactly the union of the 3x3 windows of the
    four original output pixels (2i+pi, 2j+pj).  Phase p=(pi,pj)'s tap
    (dy,dx) lands at kernel position (pi+dy+1, pj+dx+1) and writes output
    channel p*Cout+co.  Same math, but the output has FULL 128-lane
    channels at 1/4 the spatial rows — the original C=3->32 @416
    formulation underfills lane tiles 4x and measures 3x off its HBM
    roofline (PROFILE.md round 4 "the front").  No input relayout at all:
    the strided conv consumes the original NHWC bytes (an explicit
    space-to-depth transpose measured SLOWER than the problem it solved).
    """
    _, _, cin, cout = k.shape
    w = jnp.zeros((4, 4, cin, 4 * cout), k.dtype)
    for pi in range(2):
        for pj in range(2):
            p = pi * 2 + pj
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    w = w.at[
                        pi + dy + 1, pj + dx + 1, :,
                        p * cout : (p + 1) * cout,
                    ].set(k[dy + 1, dx + 1])
    return w


def _phase_max(y):
    """2x2 maxpool of the original grid == channelwise max over the 4
    phase groups of the s2d representation (monotone requant commutes)."""
    b, h, w, c4 = y.shape
    return y.reshape(b, h, w, 4, c4 // 4).max(axis=3)


def _conv_f32(x, kernel):
    dn = lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    return lax.conv_general_dilated(
        x, kernel.astype(jnp.float32), (1, 1), "SAME", dimension_numbers=dn
    )


def _pool(x):
    import flax.linen as nn

    return nn.max_pool(x, (2, 2), (2, 2))


def _quadrant(c5):
    _, hh, ww, _ = c5.shape
    h, w = hh // 2, ww // 2
    hw = jnp.concatenate([c5[:, :, :w, :], c5[:, :, w : 2 * w, :]], -1)
    return jnp.concatenate([hw[:, :h, :, :], hw[:, h : 2 * h, :, :]], -1)


# Stage boundaries in the flat 22-conv backbone list.
_STAGE_OF: List[int] = []
for _si, _stage in enumerate(_STAGES):
    _STAGE_OF += [_si] * len(_stage)
_LAST_OF_STAGE = {si: max(i for i, s in enumerate(_STAGE_OF) if s == si)
                  for si in range(len(_STAGES))}


def yolov2_int8_forward(
    variables,
    images,
    scales: Optional[jax.Array] = None,
    num_anchor_box: int = 5,
    num_cls: int = 20,
    calib_percentile: Optional[float] = None,
    stop_after: Optional[int] = None,
    bf16_front: int = 0,
    stem: str = "plain",
    valid_hw: Optional[jax.Array] = None,
):
    """Run YOLOv2 inference.

    With ``scales`` (a [22, 2] f32 matrix from :func:`calibrate`: one
    (pos_max, neg_max) activation range per ConvBnLeaky output — 20
    backbone + neck at 20 — plus the concat range at 21): full-int8
    engine, returns the raw head [N, Hg, Wg, A, 5+C] f32.

    With ``scales=None``: f32 calibration mode — returns
    (head, ranges [22, 2]) with this batch's observed values.

    ``stem``: ``"plain"`` quantizes from the first conv; ``"s2d"``
    (the `make_infer_fn` default) folds conv0+pool into one 4x4/stride-2
    bf16 conv — faster AND strictly more accurate (PROFILE.md round 4
    "the front"); ``"s2d2"`` additionally lifts conv1+pool in int8 —
    bitwise-equal to ``"s2d"`` but measured SLOWER (the 16/9 MAC overhead
    of the lift beats its lane-fill gain at conv1's shape; kept as the
    documented negative result).

    ``valid_hw`` ([N, 2] int32, engine mode only): per-image native sizes
    for a batch PADDED to a common bucket — the int8 counterpart of the
    bf16 masked forward (``YOLOv2.__call__(valid_hw=...)``).  Out-of-extent
    cells are held at each tensor's zero-point code (dequantizes to exactly
    0), so every image's valid cells equal its native-size engine run; the
    quadrant reorg slices at per-image half extents
    (``quadrant_stack_dynamic``).  Cells beyond an image's grid are junk
    the caller must mask (``make_native_infer_fn`` zeroes their conf).
    """
    blocks = _blocks(variables)
    calibrating = scales is None
    stat = (
        (lambda t: jnp.max(jnp.abs(t)))
        if calib_percentile is None
        else (lambda t: jnp.percentile(jnp.abs(t), calib_percentile))
    )
    if not calibrating and scales.shape != (len(blocks) + 1, 2):
        # jnp indexing clamps out-of-bounds silently — reject loudly.
        raise ValueError(
            f"scales must have shape ({len(blocks) + 1}, 2) "
            f"((pos, neg) range per ConvBnLeaky + the concat), got "
            f"{scales.shape}"
        )
    amaxes = []

    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    h0 = (images.astype(jnp.float32) / 255.0 - mean) / std
    s_in = jnp.float32(_INPUT_AMAX / 127.0)

    if stem not in ("plain", "s2d", "s2d2"):
        raise ValueError(
            f"stem must be 'plain', 's2d' or 's2d2', got {stem!r}"
        )
    eh = ew = None
    if valid_hw is not None:
        if calibrating:
            raise ValueError(
                "valid_hw is engine-mode only (calibrate on un-padded "
                "deployment-size batches)"
            )
        if bf16_front > 0 or stem == "s2d2":
            raise ValueError(
                "valid_hw supports stem='plain'/'s2d' with bf16_front=0 "
                "(the shipped configurations)"
            )
        eh, ew = valid_hw[:, 0], valid_hw[:, 1]
        # Native top-left-aligned padding: the image itself is zero-padded
        # uint8; mask the NORMALIZED pixels to 0 so the first conv's border
        # windows read exactly a native run's implicit SAME padding (the
        # input layer is symmetric — code 0 IS the zero point).  The
        # ``h`` assignment below then quantizes the masked pixels.
        h0 = _mask_codes(h0, eh, ew, None)
    if calibrating or bf16_front > 0 or stem != "plain":
        # bf16_front: the leading convs run in bf16 — XLA's int8 conv path
        # is ~3x SLOWER than its bf16 one at tiny channel counts (measured
        # conv0 9.8 ms int8 vs 3.6 bf16 at bs=256, PROFILE.md round 4), so
        # the front of the network quantizes nothing until channel widths
        # reach MXU-friendly sizes.  Accuracy strictly improves (fewer
        # quantized layers).
        h = h0
    else:
        h = jnp.clip(jnp.round(h0 / s_in), -127, 127).astype(jnp.int8)

    s_prev = s_in
    z_prev = None  # input layer is symmetric (zero point 0, SAME padding)
    c5 = None
    c5_idx = _LAST_OF_STAGE[4]

    pooled_to = 0  # stages whose entry pool a lifted conv already fused
    for i, (conv_p, bn_p, bn_s) in enumerate(blocks[:20]):
        si = _STAGE_OF[i]
        first_of_stage = i == 0 or _STAGE_OF[i - 1] != si
        if first_of_stage and 1 <= si <= 5:
            if si > pooled_to:
                h = _pool(h)
                if eh is not None:
                    # Floor-halving extents like torch MaxPool2d: valid
                    # pool outputs (i < e//2) read only rows 2i, 2i+1 < e —
                    # masked cells never leak into valid ones.
                    eh, ew = eh // 2, ew // 2

        if not calibrating and i == 0 and stem in ("s2d", "s2d2"):
            # s2d stem: stage-1 conv + 2x2 pool as ONE 4x4/stride-2 conv
            # (see _s2d_stem_kernel) + a free channelwise phase-max.  The
            # strided conv reads the ORIGINAL NHWC bytes — no relayout at
            # all (explicit space-to-depth transposes, f32 or uint8,
            # measured slower than the problem they solved) — and emits
            # full 128-lane channels at 1/4 the rows.
            wl = _s2d_stem_kernel(
                conv_p["kernel"].astype(jnp.float32)
            ).astype(jnp.bfloat16)
            xs = h.astype(jnp.bfloat16)  # h == h0 (normalized image)
            dns = lax.conv_dimension_numbers(
                xs.shape, wl.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = lax.conv_general_dilated(
                xs, wl, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dns,
                preferred_element_type=jnp.float32,
            )
            g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
            bias = conv_p.get("bias", jnp.zeros_like(bn_p["bias"]))
            aff_a = jnp.tile(g, 4)
            aff_b = jnp.tile((bias - bn_s["mean"]) * g + bn_p["bias"], 4)
            y = _leaky(y * aff_a + aff_b)
            s_out, z_out = _act_qparams(scales[0])
            h = _phase_max(_quant_act(y, s_out, z_out))
            s_prev, z_prev = s_out, z_out
            pooled_to = 1
            if eh is not None:
                # The lifted conv+phase-max IS conv0+pool: extents halve.
                # (h0 was masked to 0, so phase windows at each image's
                # boundary read native-padding zeros; out-of-extent outputs
                # are junk, re-masked to the zero point before the next
                # k>1 conv.)
                eh, ew = eh // 2, ew // 2
            if stop_after == 0:
                return h
            continue

        if not calibrating and i == 1 and stem == "s2d2":
            # Lifted conv1: the same 4x4/stride-2 lift applied to the
            # stage-2 3x3 conv + its following pool, in INT8 — the lifted
            # int8 kernel is exact (zero extra taps), the zero-point
            # interior term folds into the tiled bias, and the border term
            # uses the phase-aware rank-1 correction.  conv1's 64 output
            # channels half-fill the 128 lanes at 208^2; lifted it emits
            # 256 channels at 104^2 and skips the intermediate 208^2x64
            # activation round-trip entirely.
            wq, sw = _quant_w(conv_p["kernel"])
            a, b = _affine(conv_p, bn_p, bn_s, sw, s_prev)
            wsum = jnp.sum(wq.astype(jnp.float32), axis=(0, 1, 2))
            a4 = jnp.tile(a, 4)
            b4 = jnp.tile(b - z_prev * wsum * a, 4)
            wl = _s2d_stem_kernel(wq)
            dns = lax.conv_dimension_numbers(
                h.shape, wl.shape, ("NHWC", "HWIO", "NHWC")
            )
            acc = lax.conv_general_dilated(
                h, wl, (2, 2), [(1, 1), (1, 1)], dimension_numbers=dns,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            out_hw = (h.shape[1] // 2, h.shape[2] // 2)
            acc = acc + _zp_border_correction_lifted(wq, z_prev, out_hw)
            y = _leaky(acc * a4 + b4)
            s_out, z_out = _act_qparams(scales[1])
            h = _phase_max(_quant_act(y, s_out, z_out))
            s_prev, z_prev = s_out, z_out
            pooled_to = 2
            if stop_after == 1:
                return h
            continue

        if calibrating:
            y = _conv_f32(h, conv_p["kernel"])
            g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
            bias = conv_p.get("bias", jnp.zeros_like(bn_p["bias"]))
            y = (y + bias - bn_s["mean"]) * g + bn_p["bias"]
            y = _leaky(y)
            amaxes.append(_range_stat(y, stat))
            h = y
        elif i < bf16_front:
            # bf16 conv + f32 epilogue; quantize the OUTPUT so the next
            # int8 layer sees the standard (scales[i]) activation codes.
            dnf = lax.conv_dimension_numbers(
                h.shape, conv_p["kernel"].shape, ("NHWC", "HWIO", "NHWC")
            )
            y = lax.conv_general_dilated(
                h.astype(jnp.bfloat16),
                conv_p["kernel"].astype(jnp.bfloat16),
                (1, 1), "SAME", dimension_numbers=dnf,
                preferred_element_type=jnp.float32,
            )
            g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
            bias = conv_p.get("bias", jnp.zeros_like(bn_p["bias"]))
            y = _leaky((y + bias - bn_s["mean"]) * g + bn_p["bias"])
            s_out, z_out = _act_qparams(scales[i])
            if i + 1 < bf16_front:
                h = y.astype(jnp.bfloat16)  # stay float until the switch
            else:
                h = _quant_act(y, s_out, z_out)
            s_prev, z_prev = s_out, z_out
        else:
            wq, sw = _quant_w(conv_p["kernel"])
            a, b = _affine(conv_p, bn_p, bn_s, sw, s_prev)
            if eh is not None and wq.shape[0] > 1:
                # Masked native-parity path: hold out-of-extent cells at
                # the zero-point code so this conv's boundary windows read
                # native SAME padding (1x1 convs read no neighborhood).
                h = _mask_codes(h, eh, ew, z_prev)
            acc = acc_f = _conv_i8(h, wq).astype(jnp.float32)
            if z_prev is not None:
                # zero-point correction: interior folds into the bias,
                # the border ring adds fused rank-1 broadcasts.
                wsum = jnp.sum(wq.astype(jnp.float32), axis=(0, 1, 2))
                b = b - z_prev * wsum * a
                if wq.shape[0] > 1:
                    if eh is not None:
                        acc_f = acc + _zp_border_correction_native(
                            wq, z_prev, h.shape[1:3], eh, ew
                        )
                    else:
                        acc_f = acc + _zp_border_correction(
                            wq, z_prev, h.shape[1:3]
                        )
            y = _leaky(acc_f * a + b)
            s_out, z_out = _act_qparams(scales[i])
            h = _quant_act(y, s_out, z_out)
            s_prev, z_prev = s_out, z_out
        if i == c5_idx:
            c5 = h
            s_c5, z_c5 = s_prev, z_prev
            e_c5 = (eh, ew)  # c5 grid extents = valid_hw // 16
        if stop_after == i:
            # Profiling probe (scripts/profile_int8_stages.py): truncate the
            # REAL engine program after backbone conv i — prefix timing
            # diffs give the per-stage cost of the compiled product path.
            return h

    # Quadrant passthrough + concat: re-quantize both sides to a common
    # scale (int8 path only; f32 concatenates directly).
    if eh is not None:
        # Per-image quadrant split at NATIVE half extents (the reference's
        # quadrant slices are relative to the native c5 map) — same reorg
        # the bf16 masked path uses (models/yolov2.py).
        from odc_tpu.models.yolov2 import quadrant_stack_dynamic

        quad = quadrant_stack_dynamic(c5, e_c5[0], e_c5[1])
    else:
        quad = _quadrant(c5)
    if calibrating:
        cat = jnp.concatenate([quad, h], -1)
        amaxes.append(_range_stat(cat, stat))
        neck_in = cat
        s_cat = None
    else:
        s_cat, z_cat = _act_qparams(scales[21])

        def requant(q, s_from, z_from):
            # single fused mul-add inside the round (see _quant_act note)
            r = s_from / s_cat
            return jnp.clip(
                jnp.round(q.astype(jnp.float32) * r + (z_cat - z_from * r)),
                -128, 127,
            ).astype(jnp.int8)

        neck_in = jnp.concatenate(
            [requant(quad, s_c5, z_c5), requant(h, s_prev, z_prev)], -1
        )
        if eh is not None:
            # Valid neck grid = valid_hw // 32 (== both the c7 extents
            # after five pools and the quadrant's halved c5 extents); mask
            # to the concat zero point before the 3x3 neck conv.
            neck_in = _mask_codes(neck_in, eh, ew, z_cat)

    if stop_after == 21:  # after the quadrant concat / requant
        return neck_in

    conv_p, bn_p, bn_s = blocks[20]
    if calibrating:
        y = _conv_f32(neck_in, conv_p["kernel"])
        g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + 1e-5)
        bias = conv_p.get("bias", jnp.zeros_like(bn_p["bias"]))
        y = (y + bias - bn_s["mean"]) * g + bn_p["bias"]
        neck = _leaky(y)
        amaxes.append(_range_stat(neck, stat))
    else:
        wq, sw = _quant_w(conv_p["kernel"])
        a, b = _affine(conv_p, bn_p, bn_s, sw, s_cat)
        wsum = jnp.sum(wq.astype(jnp.float32), axis=(0, 1, 2))
        b = b - z_cat * wsum * a
        acc = _conv_i8(neck_in, wq).astype(jnp.float32)
        if eh is not None:
            acc = acc + _zp_border_correction_native(
                wq, z_cat, neck_in.shape[1:3], eh, ew
            )
        else:
            acc = acc + _zp_border_correction(wq, z_cat, neck_in.shape[1:3])
        neck = _leaky(acc * a + b)
    if stop_after == 22:  # after the neck conv
        return neck

    # Head 1x1 conv stays in bf16 on the f32 neck output (last-layer
    # higher precision, the standard PTQ practice: it is ~0.1% of the
    # FLOPs but decode is most sensitive to its values — keeping it float
    # recovers ~3 mAP points for free; scales[20] is retained in the
    # calibration vector for compatibility but unused here).
    head_p = variables["params"]["Conv_0"]
    if calibrating:
        y = _conv_f32(neck, head_p["kernel"]) + head_p["bias"]
    else:
        dnh = lax.conv_dimension_numbers(
            neck.shape, head_p["kernel"].shape, ("NHWC", "HWIO", "NHWC")
        )
        y = lax.conv_general_dilated(
            neck.astype(jnp.bfloat16),
            head_p["kernel"].astype(jnp.bfloat16),
            (1, 1), "SAME", dimension_numbers=dnh,
        ).astype(jnp.float32) + head_p["bias"]

    n, hg, wg, _ = y.shape
    y = y.reshape(n, hg, wg, num_anchor_box, 5 + num_cls)
    if calibrating:
        # range order: 20 backbone convs, [20]=neck out, [21]=concat.
        a = amaxes[:20] + [amaxes[21], amaxes[20]]
        return y, jnp.stack(a)
    return y


def calibrate(
    variables, sample_images, percentile: Optional[float] = None
) -> jax.Array:
    """One-off PTQ calibration: per-requant-point activation range over
    the sample batch (f32 engine pass).  ``percentile`` optionally clips
    outliers (e.g. 99.99); measured on an overfit synthetic model it
    trades mAP@.5 against mAP[.5:.95], so the default is the exact range.
    Returns a [22, 2] f32 (pos_max, neg_max) matrix to pass as
    ``scales``."""
    _, amaxes = jax.jit(
        lambda v, x: yolov2_int8_forward(
            v, x, scales=None, calib_percentile=percentile
        )
    )(variables, sample_images)
    return jnp.maximum(amaxes, 1e-6)
