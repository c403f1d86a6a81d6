"""numpy reimplementation of cv2 INTER_LINEAR's scalar-reference
fixed-point scheme (opencv resize.cpp, INTER_RESIZE_COEF_BITS=11):
half-pixel centers, 11-bit coefficients rounded half-to-even, integer
H-then-V passes, final ``(acc + 2**21) >> 22``.

``odc_tpu/native/src/loader.cc::resize_impl`` implements exactly this
scheme — ``tests/test_native.py`` asserts BITWISE equality.  It is the
shared resize convention for everything the reference does through
albumentations ``Resize`` / cv2 (``/root/reference/models/yolov1.py:40-48,
456-461``), so the conftest albumentations stub uses it too: parity tests
can feed odd-sized images through the reference's real resize path.
"""

from __future__ import annotations

import numpy as np

_COEF_BITS = 11
_SCALE = 1 << _COEF_BITS


def _coefs(n_src: int, n_dst: int):
    pos = np.maximum((np.arange(n_dst) + 0.5) * n_src / n_dst - 0.5, 0.0)
    idx = pos.astype(np.int64)  # pos >= 0: trunc == floor
    frac = pos - idx
    snap = idx >= n_src - 1
    idx = np.where(snap, n_src - 1, idx)
    frac = np.where(snap, 0.0, frac)
    a1 = np.rint(frac * _SCALE).astype(np.int64)  # half-to-even, = C nearbyint
    return idx, np.minimum(idx + 1, n_src - 1), _SCALE - a1, a1


def resize_inter_linear(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Resize HWC (or HW) uint8 to (dh, dw) with the cv2 scalar scheme."""
    sh, sw = src.shape[:2]
    if (sh, sw) == (dh, dw):
        return src.copy()
    squeeze = src.ndim == 2
    if squeeze:
        src = src[:, :, None]
    x0, x1, ax0, ax1 = _coefs(sw, dw)
    y0, y1, by0, by1 = _coefs(sh, dh)
    s = src.astype(np.int64)
    h0 = s[:, x0] * ax0[None, :, None] + s[:, x1] * ax1[None, :, None]
    acc = (
        h0[y0] * by0[:, None, None]
        + h0[y1] * by1[:, None, None]
        + (1 << (2 * _COEF_BITS - 1))
    ) >> (2 * _COEF_BITS)
    out = np.clip(acc, 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out
