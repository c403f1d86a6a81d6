"""Gather-free affine image warps for TPU.

The reference's geometric augmentations are albumentations C++ warps on the
host (``models/yolov1.py:20-38``).  The naive on-device equivalent — an
inverse-mapped bilinear warp — needs 4 dynamic gathers per output pixel,
and XLA lowers TPU gathers at near-scalar speed: measured 825 ms/batch at
bs=64/416², 13x slower than the whole train step (PROFILE.md "Training
step").  TPU gathers are the wrong tool; this module removes them.

**Two-pass decomposition.**  Any affine inverse map

    sx = a·x + b·y + e,   sy = c·x + d·y + f        (x, y: output coords)

factors exactly (for ``d != 0``; here ``|d| >= cos45°/1.2`` for the
augmentation family) into a horizontal pass then a vertical pass, each a
1-D resample with a *constant* slope and an offset *linear* in the other
coordinate (Catmull-Smith two-pass warping):

    pass X:  tmp[y, xo] = in[y,  p·xo + q1·y + q0]     p = (ad - bc)/d
    pass Y:  out[yo, x] = tmp[d·yo + c·x + f,  x]      q1 = b/d, q0 = e - q1·f

**Each 1-D pass is gather-free.**  Split the sample position into a
per-row translation ``τ_y = q1·(y - cy)`` plus a shared linear ramp:

1. *fractional translation*: 2-tap blend with the statically-shifted
   neighbor — one fused VPU pass;
2. *integer translation*: a barrel shifter — ceil(log2) static rolls,
   each applied per-row through a mask.  Static shifts only; zero fill
   comes from padding the shift axis;
3. *constant-slope resample*: multiply by the interpolation-hat matrix
   ``M[i, o] = max(0, 1 - |slope·o + off - i|)`` — a dense matmul on the
   MXU (the hat matrix has 2 nonzeros per column, but at 416² the dense
   matmul costs ~0.4 GFLOP/img: noise next to the 35 GFLOP forward).

Semantics: bilinear-class resampling with zero fill.  It matches the
one-shot bilinear warp EXACTLY for axis-aligned transforms (scale /
translate / flip: ``b = c = 0``); rotations interpolate once per pass
(the reference's albumentations cascade itself resamples up to 3x per
image, so per-pass interpolation is the behavior class being matched —
see ``ops/augment.py`` deviation ledger).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# -- one-shot reference implementation (gather-based) -----------------------


def warp_affine_oneshot(img, m_inv, hw):
    """Bilinear warp with zero fill: out(x) = in(m_inv @ x).

    4 dynamic gathers per pixel — near-scalar on TPU (PROFILE.md); use as
    the semantic oracle and on hosts/CPU where gathers are cheap."""
    h, w = hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = m_inv[0, 0] * xs + m_inv[0, 1] * ys + m_inv[0, 2]
    sy = m_inv[1, 0] * xs + m_inv[1, 1] * ys + m_inv[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = img[yi_c, xi_c]  # [h, w, 3]
        return jnp.where(inside[..., None], v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    top = v00 + (v01 - v00) * fx[..., None]
    bot = v10 + (v11 - v10) * fx[..., None]
    return top + (bot - top) * fy[..., None]


# -- two-pass building blocks ------------------------------------------------


def twopass_coeffs(m_inv, hw):
    """Pass coefficients from the 2x3 inverse map.

    Returns (p, mx0, q1, d, my0, c): pass X samples at
    ``p·xo + mx0 + q1·(y - cy)``; pass Y at ``d·yo + my0 + c·(x - cx)``
    (cy, cx the center offsets already folded into mx0/my0)."""
    h, w = hw
    a, b, e = m_inv[0, 0], m_inv[0, 1], m_inv[0, 2]
    c, d, f = m_inv[1, 0], m_inv[1, 1], m_inv[1, 2]
    # |d| >= 0.59 for the augmentation family (|θ|<=45°, scale<=1.2);
    # clamp for numerical safety on degenerate user-supplied maps.
    d_safe = jnp.where(jnp.abs(d) < 1e-3, jnp.where(d < 0, -1e-3, 1e-3), d)
    q1 = b / d_safe
    p = a - q1 * c
    q0 = e - q1 * f
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    mx0 = q0 + q1 * cy
    my0 = f + c * cx
    return p, mx0, q1, d, my0, c


def shift_kmax(n: int, max_shear: float = 1.0) -> int:
    """Static bound on the per-row integer translation: |q1|,|c| <= max_shear
    (1.0 covers |θ| <= 45°), offsets span max_shear·(n-1)/2 around center."""
    return int(math.ceil(max_shear * (n - 1) / 2.0))


def hat_matrix(n_in: int, n_out: int, slope, offset, dtype=jnp.float32):
    """Interpolation matrix M[i, o] = hat(slope·o + offset - i): multiplying
    by it resamples a length-``n_in`` axis at positions ``slope·o+offset``
    with bilinear taps and zero fill (taps outside [0, n_in) vanish
    naturally — no tap row exists for them)."""
    i = jax.lax.broadcasted_iota(dtype, (n_in, n_out), 0)
    o = jax.lax.broadcasted_iota(dtype, (n_in, n_out), 1)
    pos = slope * o + offset
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos - i))


# Extra right-pad lanes beyond 2*kmax+1: keeps the circular-roll wrap
# garbage strictly past every extended lane the hat matmul can read.
_PAD_MARGIN = 4


def translate_axis_extended(v, tau, axis: int, kmax: int):
    """Per-row real-valued translation with zero fill, |tau| <= kmax, via
    fractional blend + barrel shifter of static rolls.

    Returns the EXTENDED array: ``out[j] = interp(v, (j - kmax) + tau_r)``
    for ``j in [0, n + 2*kmax + _PAD_MARGIN)``.  The extension matters: the
    intermediate coordinate ``s = composite - tau`` of a two-pass warp can
    leave ``[0, n)`` even when the composite source position is inside
    (the classic two-pass bottleneck), so the follow-up resample must read
    from the extended canvas — index ``s + kmax``.

    ``tau`` must broadcast against ``v`` with size 1 on ``axis``."""
    tau = jnp.clip(tau, -float(kmax), float(kmax))
    k = jnp.floor(tau)
    frac = tau - k
    kp = (k.astype(jnp.int32) + kmax)  # in [0, 2*kmax]

    # Pad: 2*kmax left, margin right — the asymmetric left pad is what
    # turns the barrel's net shift of kp = k + kmax into the extended
    # indexing out[j] = v((j - kmax) + tau).  All rolls are circular on
    # the padded width; per-row wrap garbage lands on lanes the mask
    # below zeroes.
    pad = [(0, 0)] * v.ndim
    pad[axis] = (2 * kmax, _PAD_MARGIN)
    vp = jnp.pad(v, pad)

    # Fractional part: one 2-tap blend with the +1 neighbor.
    vp = vp + frac * (jnp.roll(vp, -1, axis=axis) - vp)

    # Integer part: barrel shifter — static power-of-2 rolls, per-row
    # masked.  out[j] = blended[j + kp_r].
    for bit in reversed(range(max(1, (2 * kmax).bit_length()))):
        s = 1 << bit
        take = (kp & s) != 0
        vp = jnp.where(take, jnp.roll(vp, -s, axis=axis), vp)

    # Lanes whose read index wrapped (j + kp_r >= n_ext - 1, counting the
    # frac roll) hold circular garbage; their source positions are all
    # >= n + _PAD_MARGIN - 1, i.e. zero-fill territory — zero them.
    n_ext = vp.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, vp.shape, axis)
    return jnp.where(idx + kp >= n_ext - 1, 0.0, vp)


def ext_size(n: int, kmax: int) -> int:
    return n + 2 * kmax + _PAD_MARGIN


def warp_affine_twopass(img, m_inv, hw, max_shear: float = 1.0):
    """Gather-free two-pass affine warp of one [H, W, C] image (vmap for
    batches; every op is a static roll, mask, or matmul — XLA fuses the
    VPU chain and puts the hat matmuls on the MXU)."""
    h, w = hw
    p, mx0, q1, d, my0, c = twopass_coeffs(m_inv, hw)
    dtype = img.dtype

    # Pass X: per-row translate by q1·(y-cy), then resample columns at
    # slope p from the extended canvas (+kmax index offset).
    kx = shift_kmax(h, max_shear)
    y = jax.lax.broadcasted_iota(jnp.float32, (h, 1, 1), 0)
    tau_x = q1 * (y - (h - 1) / 2.0)
    v = translate_axis_extended(img, tau_x, axis=1, kmax=kx)
    mx = hat_matrix(ext_size(w, kx), w, p, mx0 + kx, dtype=dtype)
    # HIGHEST: TPU f32 matmuls default to bf16-precision passes, which
    # perturbs exact-integer resamples (identity/flip) by up to 0.5 — the
    # hat matmul is ~1% of the forward FLOPs even at 6-pass f32.
    v = jnp.einsum(
        "ywc,wx->yxc", v, mx,
        preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST,
    )

    # Pass Y: per-column translate by c·(x-cx), then resample rows at
    # slope d.
    ky = shift_kmax(w, max_shear)
    x = jax.lax.broadcasted_iota(jnp.float32, (1, w, 1), 1)
    tau_y = c * (x - (w - 1) / 2.0)
    v = translate_axis_extended(v, tau_y, axis=0, kmax=ky)
    my = hat_matrix(ext_size(h, ky), h, d, my0 + ky, dtype=dtype)
    return jnp.einsum(
        "zy,yxc->zxc", my.T, v,
        preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST,
    )
