"""Device mesh + sharding layout.

The reference has no parallelism at all (SURVEY.md §2: single process,
single device, no communication backend).  The TPU-native equivalent is a
``jax.sharding.Mesh`` over (data, model) axes:

* **data**: batch dimension sharded across chips — gradients are reduced by
  the XLA-inserted ``psum`` over ICI, no transport code of ours;
* **model**: optional tensor-parallel axis — the widest conv kernels
  (>= 512 output channels: Darknet stages 5-7, the v2 neck/head, YOLOv1's
  4096-wide dense) shard their output-channel dimension.

Everything runs under plain ``jax.jit`` with ``NamedSharding`` constraints;
GSPMD propagates the rest.  The reference's single-device execution is the
degenerate 1x1 mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Initialize multi-host JAX when launched under a multi-host runtime.

    The TPU-native replacement for a communication backend (SURVEY.md §5):
    ``jax.distributed.initialize`` wires up the processes; all actual
    communication is XLA collectives over ICI/DCN.  No-ops (returns False)
    in single-process runs."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()
        return True
    return False


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices=None,
    platform: Optional[str] = None,
) -> Mesh:
    """Build a (data, model) mesh.  ``data=-1`` uses all remaining devices."""
    if devices is None:
        devices = (
            jax.devices(platform) if platform is not None else jax.devices()
        )
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    use = data * model
    dev_array = np.asarray(devices[:use]).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Output-channel shard threshold: smaller kernels replicate (collective
# cost would dominate).
_MIN_SHARD_CHANNELS = 512


def _param_spec(path: tuple, value) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    is_kernel = names and names[-1] == "kernel"
    if (
        is_kernel
        and value.ndim >= 2
        and value.shape[-1] >= _MIN_SHARD_CHANNELS
    ):
        return P(*([None] * (value.ndim - 1) + ["model"]))
    return P()


def param_specs(variables):
    """PartitionSpec pytree for a flax variables dict (params+batch_stats)."""
    return jax.tree_util.tree_map_with_path(_param_spec, variables)


def shard_params(variables, mesh: Mesh):
    """Place model variables: big kernels sharded on "model", rest
    replicated."""
    specs = param_specs(variables)
    return jax.tree.map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        variables,
        specs,
    )


def shard_state(state, mesh: Mesh):
    """Place a TrainState (any pytree): kernels wide enough shard on
    "model", everything else replicates.  Works because momentum buffers
    mirror the params tree and batch_stats/step leaves aren't kernels."""
    return shard_params(state, mesh)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with every array sharded along the data axis.

    Single-process: a plain ``device_put`` of the full global batch.
    Multi-process (a real pod): each host holds only its
    ``DetectionPipeline(process_index, process_count)`` slice, and the
    global jax.Array is assembled from the per-process shards via
    ``jax.make_array_from_process_local_data`` — data rides each host's
    PCIe to its own chips, gradients ride ICI/DCN via the XLA-inserted
    psum.  The reference has no equivalent (SURVEY.md §2: no parallelism);
    this is the §5 'data sharded by batch across hosts' plan."""

    def spec_of(x):
        return P(*(("data",) + (None,) * (np.ndim(x) - 1)))

    if jax.process_count() > 1:

        def put(x):
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec_of(x)), np.asarray(x)
            )

        return jax.tree.map(put, batch)

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, spec_of(x)))

    return jax.tree.map(put, batch)
