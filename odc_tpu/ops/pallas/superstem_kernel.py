"""Pallas TPU kernel: fused Darknet "superstem" — the whole memory-bound
front of the network in one kernel:

    normalize -> conv1 3x3 (3->32) + BN + leaky -> maxpool 2x2
              -> conv2 3x3 (32->64) + BN + leaky -> maxpool 2x2

XLA materializes ~34 MB/image of intermediate activations through this
region (conv1's full-res output alone is 11 MB/image at 416², written and
re-read around each pool); the kernel streams 48-row input slabs through
VMEM and emits only the final [H/4, W/4, 64] map — HBM traffic drops from
~34 MB to ~2.3 MB per image.

STATUS — numerically exact (≤1 bf16 ulp vs the XLA stem) but SLOWER on the
current libtpu: 44.7 ms vs XLA's 17.8 ms for the region at bs=256/416².
Two blockers, both toolchain-level (see PROFILE.md "What was tried"):
Mosaic here cannot rotate bf16 vectors ("Rotate with non-32-bit data"),
forcing f32 staging, and im2col tap staging moves K× the input volume
through the VPU, outweighing the HBM savings.  Kept as an engineering
record with a correctness test; NOT in the product path — re-measure when
Mosaic gains bf16 rotates.

Design (v2 of ``stem_kernel.py``, executing its written follow-up plan —
slab DMA + aligned tap staging — and extending through conv2):

* **Quarter-split planar input**: ``prepare_input`` lays the image out as
  [B, 3ch, 4, Hp, 128] where plane ``s`` holds image columns ``{4j+s}`` at
  lane ``j+1`` (lane 0 is the conv left pad).  The 2x2 pool stride then
  never needs strided lane access: pooled column parities are elementwise
  maxes of conv phases, and all tap shifts are lane rolls of 0/±1 —
  ``pltpu.roll`` lowers to the native rotator, not a relayout.
* **Manual slab DMA, double buffered**: the input stays in HBM; each grid
  step DMAs its 48-row slab into VMEM while the previous step computes
  (the round-1 kernel's main loss was re-fetching the whole image block
  per row tile).
* **Conv as phase matmuls**: per output-column phase, taps stack to
  [K, rows, 128] and one ``dot_general`` contracts K on the MXU
  (K=27 for conv1, K=288 for conv2).  Inference BN folds into the weights
  (scale) and a post-dot bias; LeakyReLU commutes with max, so it runs
  once on pooled maps.

Reference semantics covered: ``models/backbones/darknet19.py:22-47``
(net1 + net2) with the in-model ImageNet normalize (``:262-280``).
Inference-only (uses BN running stats); training takes the XLA path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from odc_tpu.models.layers import IMAGENET_MEAN, IMAGENET_STD

_ROWS = 32          # conv1 rows of new output per grid step
_SLAB = 48          # input rows DMA'd per step (32 + halos, 16-aligned)
_LANES = 128        # quarter-plane width (>= W/4 + 2)
_TOP_PAD = 3        # zero rows above the image (conv1 halo + conv2 halo)


def _axes(h: int, w: int) -> Tuple[int, int, int]:
    if h % 32 or w % 4:
        raise ValueError(f"superstem needs H%32==0 and W%4==0, got {h}x{w}")
    wq = w // 4
    if wq + 2 > _LANES:
        raise ValueError(f"width {w} exceeds the 128-lane quarter plane")
    return h // _ROWS, wq, h + 16  # (tiles, quarter width, padded height)


def prepare_input(x_u8: jax.Array) -> jax.Array:
    """[B, H, W, 3] uint8 -> normalized quarter-split planar
    [B, 3, 4, H+16, 128] f32 (lane 0 zero, rows 0..2 zero)."""
    b, h, w, _ = x_u8.shape
    _, wq, hp = _axes(h, w)
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    # f32 planes: Mosaic's rotate (tap shifts) only supports 32-bit data.
    xf = (x_u8.astype(jnp.float32) / 255.0 - mean) / std
    xp = jnp.transpose(xf, (0, 3, 1, 2))                    # [B, 3, H, W]
    quarters = jnp.stack(
        [xp[..., s::4] for s in range(4)], axis=2
    )                                                        # [B, 3, 4, H, W/4]
    return jnp.pad(
        quarters,
        (
            (0, 0), (0, 0), (0, 0),
            (_TOP_PAD, hp - h - _TOP_PAD),
            (1, _LANES - wq - 1),
        ),
    )


def fold_weights(
    k1, b1, s1, be1, m1, v1, k2, b2, s2, be2, m2, v2, eps: float = 1e-5
):
    """Fold inference BN into both convs; the bias rides as one extra
    "ones" tap in each contraction (bias-before-max is valid: max(a+b,
    c+b) == max(a, c) + b).

    k1 [3,3,3,32] HWIO, k2 [3,3,32,64] HWIO; returns (w1 [32, 28],
    w2 [64, 289]) bf16 with tap order (ky*3+kx)*Cin + c, bias last."""
    sc1 = s1 / jnp.sqrt(v1 + eps)
    sc2 = s2 / jnp.sqrt(v2 + eps)
    bias1 = (b1 - m1) * sc1 + be1
    bias2 = (b2 - m2) * sc2 + be2
    w1 = jnp.concatenate(
        [(k1 * sc1).reshape(9 * 3, 32), bias1[None, :]], axis=0
    ).T.astype(jnp.bfloat16)
    w2 = jnp.concatenate(
        [(k2 * sc2).reshape(9 * 32, 64), bias2[None, :]], axis=0
    ).T.astype(jnp.bfloat16)
    return w1, w2


def _leaky(x):
    return jnp.where(x > 0, x, 0.1 * x)


def _roll(x, k: int, axis: int):
    """np.roll semantics (any-sign static shift); pltpu.roll wants >= 0."""
    return pltpu.roll(x, k % x.shape[axis], axis=axis)


def _make_body(n_tiles: int, wq: int, h2: int):
    """Kernel body closure over the static tile geometry."""

    def body(x_hbm, w1_ref, w2_ref, out_ref, slab_ref, sem_ref):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        t = i % n_tiles
        slot = i % 2

        def dma(step, sl):
            return pltpu.make_async_copy(
                x_hbm.at[
                    step // n_tiles, :, :,
                    pl.ds((step % n_tiles) * _ROWS, _SLAB), :,
                ],
                slab_ref.at[sl],
                sem_ref.at[sl],
            )

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < n)
        def _():
            dma(i + 1, (i + 1) % 2).start()

        dma(i, slot).wait()

        def tap1(s, ky, kx, ch):
            sp = (s + kx - 1) % 4
            lane = (s + kx - 1) // 4 + 1  # 0 or 1
            p = slab_ref[slot, ch, sp]
            if ky:
                p = _roll(p, -ky, 0)
            if lane:
                p = _roll(p, -lane, 1)
            return p

        ones = jnp.ones((1, _SLAB, _LANES), jnp.float32)

        def conv1_phase(s):
            taps = jnp.concatenate(
                [
                    jnp.stack(
                        [
                            tap1(s, ky, kx, ch)
                            for ky in range(3)
                            for kx in range(3)
                            for ch in range(3)
                        ]
                    ),
                    ones,  # bias tap
                ],
                axis=0,
            )  # [28, 48, 128]
            return jax.lax.dot_general(
                w1_ref[:, 0:28], taps.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [32, 48, 128]

        pe = jnp.maximum(conv1_phase(0), conv1_phase(1))
        po = jnp.maximum(conv1_phase(2), conv1_phase(3))
        # Row pool over conv1-row pairs (valid pooled rows k = 0..17).
        pe = jnp.max(pe.reshape(32, 24, 2, _LANES), axis=2)
        po = jnp.max(po.reshape(32, 24, 2, _LANES), axis=2)
        pe = _leaky(pe)
        po = _leaky(po)

        # Zero invalid lanes (>= wq) and rows (absolute pooled row outside
        # the image) — the conv1 bias makes zero-padding non-zero.
        lane_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 24, _LANES), 2) < wq
        )
        abs_row = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 24, _LANES), 1)
            + 16 * t - 1
        )
        ok = lane_ok & (abs_row >= 0) & (abs_row < h2)
        zero_f = jnp.zeros((), jnp.float32)
        pe = jnp.where(ok, pe, zero_f)
        po = jnp.where(ok, po, zero_f)

        col0 = (
            jax.lax.broadcasted_iota(jnp.int32, (32, 24, _LANES), 2) == 0
        )
        zero_b = jnp.zeros((), jnp.float32)

        def plane2(q, kx):
            # out col 2m+q needs pooled1 col 2m + (q + kx - 1).
            c = q + kx - 1
            p = po if c % 2 else pe
            d = c // 2  # -1 or 0 (q=0); 0 or 1 (q=1)
            if d == -1:
                p = _roll(p, 1, 2)
                p = jnp.where(col0, zero_b, p)
            elif d == 1:
                p = _roll(p, -1, 2)
            return p

        def conv2_phase(q):
            taps = jnp.concatenate(
                [
                    (
                        _roll(plane2(q, kx), -ky, 1)
                        if ky
                        else plane2(q, kx)
                    )[:, 0:16, :]
                    for ky in range(3)
                    for kx in range(3)
                ] + [ones[:, 0:16, :]],
                axis=0,
            )  # [289, 16, 128]
            return jax.lax.dot_general(
                w2_ref[:], taps.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [64, 16, 128]

        o = jnp.maximum(conv2_phase(0), conv2_phase(1))
        o = jnp.max(o.reshape(64, 8, 2, _LANES), axis=2)
        o = _leaky(o)
        out_ref[0] = o.astype(out_ref.dtype)

    return body


@functools.partial(jax.jit, static_argnames=("interpret", "planar_out"))
def superstem(
    x_u8: jax.Array,
    w1: jax.Array,
    w2: jax.Array,
    interpret: bool = False,
    planar_out: bool = False,
):
    """[B, H, W, 3] uint8 -> [B, H/4, W/4, 64] bf16 (the Darknet net1+net2
    output).  Weights from :func:`fold_weights`."""
    b, h, w, _ = x_u8.shape
    nt, wq, _hp = _axes(h, w)
    xp = prepare_input(x_u8)
    w1p = jnp.zeros((32, 32), jnp.bfloat16).at[:, 0:28].set(w1)

    y = pl.pallas_call(
        _make_body(nt, wq, h // 2),
        grid=(b * nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 64, 8, _LANES),
            lambda i: (i // nt, 0, i % nt, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, 64, h // 4, _LANES), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((2, 3, 4, _SLAB, _LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w1p, w2)

    if planar_out:
        return y
    return jnp.transpose(y[..., :wq], (0, 2, 3, 1))
