"""YOLOv1 network + decode glue.

Network (reference ``models/yolov1.py:50-205``): GoogLeNet backbone ->
Flatten -> Dense(7*7*1024 -> 4096) -> ReLU -> Dropout(0.5) ->
Dense(4096 -> S*S*(B*5+C)) -> reshape [N, 7, 7, B*5+C], with S=7, B=2, C=20
(``config.py:7-11``).  The reference runs at 224x224, not the paper's 448
(SURVEY.md note C).

Decode: the reference's nonstandard sigmoid-wh formulas via
:func:`odc_tpu.ops.decode.decode_v1`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from odc_tpu.models.backbones.googlenet import GoogLeNetBackbone
from odc_tpu.ops.decode import decode_v1, decode_v1_preactivated, Detections


class YOLOv1(nn.Module):
    num_grid_cell_in_height: int = 7
    num_grid_cell_in_width: int = 7
    num_anchor_box: int = 2
    num_cls: int = 20
    dtype: jnp.dtype = jnp.float32

    # Framework-level defaults mirroring the reference surface.
    image_size: Tuple[int, int] = (224, 224)

    # Reference head dropout (``models/yolov1.py:84``).  Configurable so
    # deterministic parity tests can disable it (dropout RNG streams can't
    # be matched across frameworks).
    dropout_rate: float = 0.5

    # Reference legacy-draft variant (``models/yolov1 temp.py:52-70``, dead
    # code there, kept for capability parity): the whole head output goes
    # through ONE sigmoid, so ``decode`` consumes it pre-activated
    # (``decode_v1_preactivated`` — no second sigmoid, sigmoid class probs
    # instead of softmax).  Pair with ``yolo_loss_paper`` and the legacy
    # grid-cell AP evaluator.  Capability parity, not bitwise draft parity:
    # the draft's own loss works in globally-normalized box space.
    legacy_sigmoid_head: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        """[N, H, W, 3] RGB (0-255) -> raw head [N, Hg, Wg, A*5 + C]."""
        n = x.shape[0]
        hg, wg = self.num_grid_cell_in_height, self.num_grid_cell_in_width
        out_dim = self.num_anchor_box * 5 + self.num_cls

        h = GoogLeNetBackbone(dtype=self.dtype)(x, train)  # [N, 7, 7, 1024]

        h = h.reshape(n, -1)
        h = nn.Dense(4096, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(h)
        y = nn.Dense(
            hg * wg * out_dim, dtype=self.dtype, param_dtype=jnp.float32
        )(h)

        y = y.reshape(n, hg, wg, out_dim).astype(jnp.float32)
        if self.legacy_sigmoid_head:
            y = jax.nn.sigmoid(y)  # yolov1 temp.py:60
        return y

    def decode(self, y, image_hw=None) -> Detections:
        decode_fn = (
            decode_v1_preactivated if self.legacy_sigmoid_head else decode_v1
        )
        return decode_fn(
            y, image_hw or self.image_size, self.num_anchor_box
        )
