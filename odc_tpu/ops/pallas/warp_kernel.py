"""Pallas TPU kernel for the two-pass affine warp (device augmentation).

Same math as ``odc_tpu.ops.warp.warp_affine_twopass`` (per-row fractional
blend + barrel-shifter translation, then a hat-matrix resample on the MXU —
zero gathers), but fused into ONE kernel per (image, channel): the plane
stays resident in VMEM across both passes, so HBM sees each image exactly
twice (read + write) instead of once per roll/mask/matmul round-trip.

Why this kernel exists (PROFILE.md "Training step"): the one-shot bilinear
warp is gather-bound — 44 M dynamic gathers/batch lower at near-scalar
speed (825 ms of a 912 ms step at bs=64/416²).  Gathers are the one op
class where XLA-on-TPU is pathologically bad; rolls, masks, and matmuls
are its bread and butter, and keeping them on-chip removes the remaining
HBM round-trips that the unfused XLA two-pass pays.

All staging is f32: Mosaic on this libtpu cannot rotate bf16 vectors
("Rotate with non-32-bit data", PROFILE.md superstem post-mortem), and
pixels are exact in f32 anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odc_tpu.ops.warp import ext_size, shift_kmax, twopass_coeffs, _PAD_MARGIN


def _fiota(shape, dim):
    # Mosaic's tpu.iota only produces integer vectors — build f32 iotas as
    # int32 + convert (a plain f32 broadcasted_iota fails verification).
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _hat(n_in: int, n_out: int, slope, offset):
    i = _fiota((n_in, n_out), 0)
    o = _fiota((n_in, n_out), 1)
    return jnp.maximum(0.0, 1.0 - jnp.abs(slope * o + offset - i))


def _translate_ext(v, tau, axis: int, kmax: int):
    """Extended per-row translation (zero fill): out[j] = interp(v,
    (j - kmax) + tau_r) for j in [0, ext_size(n, kmax)) — same math and
    wrap masking as ``warp.translate_axis_extended``, with ``pltpu.roll``
    for the in-VMEM rotates."""
    tau = jnp.clip(tau, -float(kmax), float(kmax))
    k = jnp.floor(tau)
    frac = tau - k
    kp = k.astype(jnp.int32) + kmax  # in [0, 2*kmax]

    pad = [(0, 0)] * v.ndim
    pad[axis] = (2 * kmax, _PAD_MARGIN)
    vp = jnp.pad(v, pad)
    n_ext = vp.shape[axis]

    def roll_left(arr, s):  # pltpu.roll wants non-negative shifts
        return pltpu.roll(arr, (n_ext - s) % n_ext, axis=axis)

    vp = vp + frac * (roll_left(vp, 1) - vp)
    for bit in reversed(range(max(1, (2 * kmax).bit_length()))):
        s = 1 << bit
        vp = jnp.where((kp & s) != 0, roll_left(vp, s), vp)
    idx = jax.lax.broadcasted_iota(jnp.int32, vp.shape, axis)
    return jnp.where(idx + kp >= n_ext - 1, 0.0, vp)


def _warp_kernel(coef_ref, img_ref, out_ref, *, h, w, kx, ky):
    # coef_ref holds the WHOLE [B, 6] table (Mosaic requires SMEM blocks to
    # match the array dims); pick this image's row by grid position.
    i = pl.program_id(0)
    p = coef_ref[i, 0]
    mx0 = coef_ref[i, 1]
    q1 = coef_ref[i, 2]
    d = coef_ref[i, 3]
    my0 = coef_ref[i, 4]
    c = coef_ref[i, 5]

    v = img_ref[0, 0]  # [H, W] f32 plane

    # Pass X: rows translate by q1·(y-cy); columns resample at slope p
    # from the extended canvas (+kx index offset).
    rows = _fiota((h, 1), 0)
    v = _translate_ext(v, q1 * (rows - (h - 1) / 2.0), axis=1, kmax=kx)
    v = jnp.dot(
        v, _hat(ext_size(w, kx), w, p, mx0 + kx),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )

    # Pass Y: columns translate by c·(x-cx); rows resample at slope d.
    cols = _fiota((1, w), 1)
    v = _translate_ext(v, c * (cols - (w - 1) / 2.0), axis=0, kmax=ky)
    my = _hat(ext_size(h, ky), h, d, my0 + ky)  # [y_in_ext, y_out]
    out_ref[0, 0] = jnp.dot(
        my.T, v,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("max_shear", "interpret"))
def warp_affine_pallas(
    images: jax.Array,   # [B, H, W, C] f32
    m_invs: jax.Array,   # [B, 3, 3] f32 inverse maps
    max_shear: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Batched two-pass affine warp, one fused VMEM-resident kernel per
    (image, channel) plane.  Numerics match ``warp_affine_twopass``."""
    b, h, w, ch = images.shape
    kx = shift_kmax(h, max_shear)
    ky = shift_kmax(w, max_shear)

    coeffs = jax.vmap(lambda m: jnp.stack(twopass_coeffs(m, (h, w))))(
        m_invs
    ).astype(jnp.float32)  # [B, 6]

    planes = jnp.transpose(images, (0, 3, 1, 2)).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_warp_kernel, h=h, w=w, kx=kx, ky=ky),
        grid=(b, ch),
        in_specs=[
            pl.BlockSpec((b, 6), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ch, h, w), jnp.float32),
        interpret=interpret,
    )(coeffs, planes)

    return jnp.transpose(out, (0, 2, 3, 1)).astype(images.dtype)
