"""Checkpoint save/restore.

The reference is save-only (``torch.save(state_dict)`` for best/final,
``models/yolov1.py:1145-1173``; no ``load_state_dict`` anywhere — SURVEY.md
§5).  We keep the same file layout (``best_model.ckpt`` /
``final_model.ckpt``) and add the missing restore/resume path: full train
state (params + batch_stats + momentum buffers + step) serialized with
flax msgpack.
"""

from __future__ import annotations

import jax
import numpy as np
from flax import serialization


def save(path: str, state) -> None:
    host_state = jax.tree.map(np.asarray, state)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_state))


def restore(path: str, template):
    """Load a checkpoint into the structure of ``template`` (e.g. a freshly
    created TrainState)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_params(path: str, params) -> None:
    """Params-only checkpoint (deployment artifact)."""
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.tree.map(np.asarray, params)))


def restore_params(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
