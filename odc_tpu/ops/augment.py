"""Batched, RNG-keyed, on-device augmentation with bbox transforms.

The reference composes six albumentations transforms, each applied with
p=0.5 (``models/yolov1.py:20-38``): RandomScale ±20%, Affine translate
±20%, Affine rotate ±45°, OneOf(HFlip, VFlip), ChannelShuffle,
HueSaturationValue — sequential C++ warps on the host, per sample.

TPU-first redesign (the BASELINE.md "fused preprocessing" north star): all
geometric transforms compose into ONE affine matrix per image and execute
as a single bilinear warp over the fixed-size batch; color transforms are
fused elementwise passes.  Everything is driven by a jax PRNG key, so
augmentation is deterministic, reproducible, and runs inside the jitted
train step (no host work, no resampling cascade).

Behavioral notes vs the reference (verified statistically, not bitwise —
SURVEY.md §7 hard-part 4):

* boxes follow the enclosing-axis-aligned-box rule for rotated corners and
  are clipped to the canvas; degenerate boxes are invalidated (matching
  albumentations' drop behavior, via the validity mask);
* RandomScale changes the canvas in the reference but the canvas is
  resized to the network size right after — with a fixed canvas it is a
  zoom about the center;
* geometric transforms act on the network-sized canvas (the reference
  warps the native canvas, then resizes); for rotation on non-square
  originals this differs by the aspect-ratio factor;
* HueSaturationValue uses OpenCV conventions: hue shift ±20 in OpenCV's
  0-179 half-degree units (= ±40°), saturation/value shifts ±30/±20 in
  uint8 units.
* the geometric backend is gather-free ("auto": the fused Pallas VMEM
  warp kernel on TPU, 11.5 ms/batch; the XLA two-pass elsewhere,
  50.5 ms — vs 807 ms for the one-shot 4-tap gather warp, PROFILE.md):
  TPU gathers run near-scalar while rolls + hat-matrix matmuls are
  native.  Axis-aligned transforms are bitwise-identical to one-shot
  bilinear; rotations interpolate once per pass — the same behavior
  class as the reference's albumentations cascade, which itself
  resamples once per enabled transform (up to 3x per image).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    p_scale: float = 0.5
    scale_limit: Tuple[float, float] = (-0.2, 0.2)
    p_translate: float = 0.5
    translate_limit: Tuple[float, float] = (-0.2, 0.2)
    p_rotate: float = 0.5
    rotate_limit: Tuple[float, float] = (-45.0, 45.0)
    p_flip: float = 0.5          # OneOf(HFlip, VFlip)
    p_channel_shuffle: float = 0.5
    p_hsv: float = 0.5
    hue_shift_limit: float = 20.0   # OpenCV half-degree units
    sat_shift_limit: float = 30.0   # uint8 units
    val_shift_limit: float = 20.0   # uint8 units


def _sample_affine(key, cfg: AugmentConfig, hw):
    """Per-image forward affine matrix [3, 3] mapping input -> output
    pixel coordinates (about the canvas center)."""
    h, w = hw
    ks = jax.random.split(key, 8)

    def maybe(k_p, p, value, default):
        return jnp.where(jax.random.uniform(k_p) < p, value, default)

    scale = maybe(
        ks[0], cfg.p_scale,
        1.0 + jax.random.uniform(
            ks[1], minval=cfg.scale_limit[0], maxval=cfg.scale_limit[1]
        ),
        1.0,
    )
    t = jax.random.uniform(
        ks[2], (2,), minval=cfg.translate_limit[0],
        maxval=cfg.translate_limit[1],
    )
    tx = maybe(ks[3], cfg.p_translate, t[0] * w, 0.0)
    ty = maybe(ks[3], cfg.p_translate, t[1] * h, 0.0)
    theta = maybe(
        ks[4], cfg.p_rotate,
        jnp.deg2rad(
            jax.random.uniform(
                ks[5], minval=cfg.rotate_limit[0], maxval=cfg.rotate_limit[1]
            )
        ),
        0.0,
    )
    do_flip = jax.random.uniform(ks[6]) < cfg.p_flip
    flip_h = jax.random.uniform(ks[7]) < 0.5  # OneOf: HFlip else VFlip
    fx = jnp.where(do_flip & flip_h, -1.0, 1.0)
    fy = jnp.where(do_flip & ~flip_h, -1.0, 1.0)

    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # M = T(center) @ Translate @ Rotate @ Scale @ Flip @ T(-center)
    a = scale * cos * fx
    b = -scale * sin * fy
    c = scale * sin * fx
    d = scale * cos * fy
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    m = jnp.array(
        [
            [a, b, cx + tx - a * cx - b * cy],
            [c, d, cy + ty - c * cx - d * cy],
            [0.0, 0.0, 1.0],
        ]
    )
    return m


def warp_max_shear(cfg: AugmentConfig) -> float:
    """Static bound on the two-pass warp's translation slopes for ``cfg``.

    For the scale·rotation·flip family the pass-X slope is ``q1 = b/d =
    ±tanθ`` and the pass-Y slope is ``c = ∓sinθ/s`` (``ops/warp.py``
    ``twopass_coeffs``), so the bound is ``max(tanθmax, sinθmax/s_min)``.
    The decomposition needs ``|d| = cosθ/s`` bounded away from 0: beyond
    45° ``translate_axis_extended`` would silently clip the per-row
    translation and warp geometry wrongly — reject it here (the reference's
    albumentations family stays at ±45°, ``models/yolov1.py:29``); larger
    rotations require ``warp_impl="oneshot"``.
    """
    theta = (
        max(abs(cfg.rotate_limit[0]), abs(cfg.rotate_limit[1]))
        if cfg.p_rotate > 0.0 else 0.0
    )
    if theta > 45.0:
        raise ValueError(
            f"two-pass warp backends support |rotation| <= 45 deg "
            f"(got rotate_limit={cfg.rotate_limit}); use warp_impl='oneshot' "
            f"for larger rotations"
        )
    s_min = 1.0 + min(cfg.scale_limit[0], 0.0)
    if s_min <= 0.0:
        raise ValueError(f"scale_limit lower bound must be > -1 "
                         f"(got {cfg.scale_limit})")
    t = math.radians(theta)
    return max(math.tan(t), math.sin(t) / s_min)


def _warp_images(imgs, m_invs, hw, impl: str, max_shear: float = 1.0):
    """Batched warp dispatch.  ``impl``:

    * ``"auto"`` (default): ``"pallas"`` on a real TPU backend, else
      ``"twopass"`` — the measured-fastest backend per platform
      (11.5 vs 50.5 ms/batch at bs=64/416², PROFILE.md round 3).
    * ``"twopass"``: gather-free two-pass warp (``odc_tpu.ops.warp``) —
      rolls/masks/matmuls only; runs on every backend.
    * ``"pallas"``: the same math fused into one VMEM-resident kernel per
      plane (``odc_tpu.ops.pallas.warp_kernel``); real TPU only.
    * ``"oneshot"``: direct 4-tap bilinear gather — exact single-resample
      semantics, but gather-bound on TPU (807 ms/batch, PROFILE.md); for
      CPU hosts and as the semantic oracle.
    """
    from odc_tpu.ops.warp import warp_affine_oneshot, warp_affine_twopass

    if impl == "auto":
        dev = jax.devices()[0]
        on_tpu = (
            dev.platform == "tpu"
            or "TPU" in getattr(dev, "device_kind", "")
        )
        impl = "pallas" if on_tpu else "twopass"
    if impl == "pallas":
        from odc_tpu.ops.pallas.warp_kernel import warp_affine_pallas

        return warp_affine_pallas(imgs, m_invs, max_shear=max_shear)
    if impl == "twopass":
        return jax.vmap(
            lambda im, mi: warp_affine_twopass(im, mi, hw, max_shear)
        )(imgs, m_invs)
    return jax.vmap(
        lambda im, mi: warp_affine_oneshot(im, mi, hw)
    )(imgs, m_invs)


def _warp_boxes(boxes, valid, m, hw):
    """Forward-transform corners, take the enclosing box, clip, re-validate."""
    h, w = hw
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    corners_x = jnp.stack([x1, x2, x1, x2], -1)  # [M, 4]
    corners_y = jnp.stack([y1, y1, y2, y2], -1)
    nx = m[0, 0] * corners_x + m[0, 1] * corners_y + m[0, 2]
    ny = m[1, 0] * corners_x + m[1, 1] * corners_y + m[1, 2]
    out = jnp.stack(
        [nx.min(-1), ny.min(-1), nx.max(-1), ny.max(-1)], -1
    )
    out = jnp.clip(
        out,
        jnp.zeros(4, out.dtype),
        jnp.array([w, h, w, h], out.dtype),
    )
    ok = (out[..., 2] - out[..., 0] > 1.0) & (out[..., 3] - out[..., 1] > 1.0)
    return out, valid & ok


def _rgb_to_hsv(rgb):
    """RGB [0,255] float -> (h in [0,180) OpenCV units, s,v in [0,255])."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    hr = jnp.mod((g - b) / safe_d, 6.0)
    hg = (b - r) / safe_d + 2.0
    hb = (r - g) / safe_d + 4.0
    hh = jnp.where(mx == r, hr, jnp.where(mx == g, hg, hb))
    hh = jnp.where(d == 0, 0.0, hh) * 30.0  # 0-180 (OpenCV half-degrees)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx)) * 255.0
    return hh, s, mx


def _hsv_to_rgb(hh, s, v):
    hh = jnp.mod(hh, 180.0) / 30.0  # [0, 6)
    s = jnp.clip(s, 0.0, 255.0) / 255.0
    v = jnp.clip(v, 0.0, 255.0)
    i = jnp.floor(hh)
    f = hh - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], -1)


def _color(key, img, cfg: AugmentConfig):
    ks = jax.random.split(key, 6)

    # ChannelShuffle (p=0.5): random permutation of RGB.
    perm = jax.random.permutation(ks[0], 3)
    do_shuffle = jax.random.uniform(ks[1]) < cfg.p_channel_shuffle
    perm = jnp.where(do_shuffle, perm, jnp.arange(3))
    img = img[..., perm]

    # HueSaturationValue (p=0.5), OpenCV conventions.
    do_hsv = jax.random.uniform(ks[2]) < cfg.p_hsv
    dh = jax.random.uniform(
        ks[3], minval=-cfg.hue_shift_limit, maxval=cfg.hue_shift_limit
    )
    ds = jax.random.uniform(
        ks[4], minval=-cfg.sat_shift_limit, maxval=cfg.sat_shift_limit
    )
    dv = jax.random.uniform(
        ks[5], minval=-cfg.val_shift_limit, maxval=cfg.val_shift_limit
    )
    hh, s, v = _rgb_to_hsv(img)
    shifted = _hsv_to_rgb(hh + dh, s + ds, v + dv)
    return jnp.where(do_hsv, shifted, img)


def augment_batch(
    key: jax.Array,
    images: jax.Array,  # [B, H, W, 3] uint8
    boxes: jax.Array,   # [B, M, 4] f32 pixel corners
    valid: jax.Array,   # [B, M] bool
    cfg: AugmentConfig = AugmentConfig(),
    warp_impl: str = "auto",
):
    """One fused augmentation pass over the batch.  Returns (images uint8,
    boxes f32, valid).  ``warp_impl``: see ``_warp_images``."""
    b, h, w, _ = images.shape
    hw = (h, w)

    keys = jax.random.split(key, b)
    kg, kc = jnp.moveaxis(jax.vmap(jax.random.split)(keys), 1, 0)
    ms = jax.vmap(lambda k: _sample_affine(k, cfg, hw))(kg)
    m_invs = jnp.linalg.inv(ms)

    # Derived (not hardcoded) slope bound: validates rotate_limit for the
    # two-pass backends and shrinks the shift canvas for small rotations.
    max_shear = warp_max_shear(cfg) if warp_impl != "oneshot" else 1.0
    imgf = _warp_images(
        images.astype(jnp.float32), m_invs, hw, warp_impl, max_shear
    )
    imgf = jax.vmap(lambda k, im: _color(k, im, cfg))(kc, imgf)
    out_boxes, out_valid = jax.vmap(
        lambda bx, vd, m: _warp_boxes(bx, vd, m, hw)
    )(boxes, valid, ms)
    return jnp.clip(imgf, 0, 255).astype(jnp.uint8), out_boxes, out_valid
