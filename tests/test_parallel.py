"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY.md §4
— the standard JAX substitute for distributed test rigs).

Tests that EXECUTE cross-device collectives run in a pytest SUBPROCESS:
XLA's in-process CPU collectives hard-abort the whole process (SIGABRT,
rendezvous.cc 40 s timeout) when the host can't get every participant to
the rendezvous in time — on a 1-core sandbox a late-suite 4-participant
all-reduce aborts probabilistically (accumulated threads), killing pytest
itself.  The subprocess contains the abort; on starved hosts the known
signature becomes a documented skip, on healthy hosts the test runs
normally (see CLAUDE.md environment facts)."""

import functools
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def isolated_collective(fn):
    """Run this test in its own pytest subprocess (see module docstring)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if os.environ.get("ODC_COLLECTIVE_IN_SUBPROC"):
            return fn(*args, **kwargs)
        env = {**os.environ, "ODC_COLLECTIVE_IN_SUBPROC": "1"}
        # -s: no inner capture — a SIGABRT would otherwise eat the buffered
        # rendezvous message and hide the failure signature.
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "-x", "-q", "-s",
             "-p", "no:cacheprovider",
             f"{os.path.abspath(__file__)}::{fn.__name__}"],
            capture_output=True, text=True, timeout=2400, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        out = proc.stdout + proc.stderr
        if proc.returncode != 0:
            aborted = (
                proc.returncode in (-6, 134)
                or "Termination timeout for" in out
                or "Fatal Python error: Aborted" in out
            )
            if aborted and (os.cpu_count() or 1) < 8:
                pytest.skip(
                    "XLA CPU in-process collective rendezvous starved on "
                    "this few-core host (hardcoded 40s abort; CLAUDE.md)"
                )
            raise AssertionError(out[-3000:])

    return wrapper

from odc_tpu.data.pipeline import Batch
from odc_tpu.losses.yolo_loss import Lambdas
from odc_tpu.models import YOLOv2
from odc_tpu.parallel.mesh import (
    make_mesh,
    param_specs,
    shard_batch,
    shard_state,
)
from odc_tpu.train.trainer import TrainState, make_train_step

HW = (64, 64)


def _mini_batch(b, m=4, mode="v2"):
    rng = np.random.default_rng(0)
    boxes = np.zeros((b, m, 4), np.float32)
    boxes[:, 0] = [4, 4, 40, 40]
    boxes[:, 1] = [20, 30, 60, 62]
    valid = np.zeros((b, m), bool)
    valid[:, :2] = True
    from odc_tpu.ops.assign import assign

    tgt = assign(
        jnp.asarray(boxes), jnp.zeros((b, m), jnp.int32),
        jnp.asarray(valid), HW, mode=mode,
    )
    return Batch(
        image=rng.integers(0, 255, (b,) + HW + (3,), dtype=np.uint8),
        cell=np.asarray(tgt.cell),
        sig_txty=np.asarray(tgt.sig_txty),
        twth=np.asarray(tgt.twth),
        box=boxes,
        cls=np.zeros((b, m), np.int32),
        valid=valid,
        img_id=np.arange(b, dtype=np.int32),
    )


@pytest.fixture(scope="module")
def model_and_vars():
    model = YOLOv2(image_size=HW)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1,) + HW + (3,), jnp.uint8)
    )
    return model, variables


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = make_mesh(data=-1, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_param_specs_shard_wide_kernels(model_and_vars):
    _, variables = model_and_vars
    specs = param_specs(variables)
    leaves = jax.tree_util.tree_leaves_with_path(specs)
    sharded = [
        p for p, s in leaves if s and s[-1] == "model"
    ]
    assert len(sharded) > 0  # wide conv kernels picked up
    # batch_stats never sharded
    for path, s in leaves:
        names = [getattr(x, "key", "") for x in path]
        if "batch_stats" in names:
            assert all(axis is None for axis in s)


@isolated_collective
def test_dp_matches_single_device(model_and_vars):
    model, variables = model_and_vars
    step_fn = make_train_step(
        model, "v2", Lambdas(), model.anchors,
        momentum=0.9, weight_decay=5e-4,
    )
    batch = _mini_batch(8)
    rng = jax.random.key(0)

    # Single device.
    s1 = TrainState.create(jax.tree.map(jnp.copy, variables))
    s1, m1 = step_fn(s1, jax.tree.map(jnp.asarray, batch), jnp.float32(1e-3), rng)

    # (4, 2) mesh: data-parallel batch + model-sharded wide kernels.
    mesh = make_mesh(data=4, model=2)
    s2 = shard_state(
        TrainState.create(jax.tree.map(jnp.copy, variables)), mesh
    )
    sharded_batch = shard_batch(batch, mesh)
    with mesh:
        s2, m2 = step_fn(s2, sharded_batch, jnp.float32(1e-3), rng)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )
    # Updated params agree across the mesh layouts.
    p1 = jax.tree.leaves(s1.params)[0]
    p2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(
        np.asarray(p1), np.asarray(p2), rtol=1e-3, atol=1e-5
    )


@isolated_collective
def test_dp_v3_matches_single_device():
    """The YOLOv3 capability extension trains under the data mesh with the
    same numerics as single-device execution (its on-device multi-scale
    assignment and ignore mask are pure batch-parallel math — zero
    cross-chip traffic beyond the gradient psum).  data=2: 2-participant
    collectives are reliable even on starved hosts (CLAUDE.md)."""
    from odc_tpu.models import YOLOv3

    model = YOLOv3(image_size=HW)
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1,) + HW + (3,), jnp.uint8)
    )
    step_fn = make_train_step(
        model, "v3", Lambdas(lambda_xy=1.0, lambda_wh=1.0), model.anchors,
        momentum=0.9, weight_decay=5e-4,
    )
    batch = _mini_batch(4, mode="v3")
    rng = jax.random.key(0)

    s1 = TrainState.create(jax.tree.map(jnp.copy, variables))
    s1, m1 = step_fn(
        s1, jax.tree.map(jnp.asarray, batch), jnp.float32(1e-3), rng
    )

    mesh = make_mesh(data=2, model=1)
    s2 = shard_state(
        TrainState.create(jax.tree.map(jnp.copy, variables)), mesh
    )
    sharded_batch = shard_batch(batch, mesh)
    with mesh:
        s2, m2 = step_fn(s2, sharded_batch, jnp.float32(1e-3), rng)

    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=1e-4
    )
    p1 = jax.tree.leaves(s1.params)[0]
    p2 = jax.tree.leaves(s2.params)[0]
    np.testing.assert_allclose(
        np.asarray(p1), np.asarray(p2), rtol=1e-3, atol=1e-5
    )


@isolated_collective
def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_maybe_initialize_distributed_noop_subprocess():
    """Without coordinator env vars the init must be a no-op returning
    False; with them set (to an unreachable address) it must at least
    *attempt* jax.distributed.initialize (SURVEY.md §5 comm-backend row)."""
    import subprocess
    import sys

    code_noop = (
        "import os;"
        "os.environ.pop('JAX_COORDINATOR_ADDRESS', None);"
        "os.environ.pop('COORDINATOR_ADDRESS', None);"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "from odc_tpu.parallel.mesh import maybe_initialize_distributed;"
        "assert maybe_initialize_distributed() is False;"
        "print('NOOP_OK')"
    )
    r = subprocess.run(
        [sys.executable, "-c", code_noop],
        capture_output=True, text=True, timeout=120,
    )
    assert "NOOP_OK" in r.stdout, r.stderr


@isolated_collective
def test_data_parallel_inference_matches_single_device():
    """Batched e2e inference under the (data, model) mesh must produce the
    same boxes as single-device execution — the multi-chip serving path
    (batch sharded over ICI, zero cross-chip traffic at inference)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from odc_tpu.models import YOLOv2
    from odc_tpu.ops.detect import make_infer_fn
    from odc_tpu.parallel.mesh import make_mesh, shard_params

    model = YOLOv2()
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (8, 64, 64, 3), dtype=np.uint8)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.uint8))
    infer = jax.jit(make_infer_fn(model, max_keep=16))

    # Sharded execution reorders float accumulation (ulp-level conf
    # differences), so place the threshold in the widest gap of the conf
    # distribution to keep the selected set identical.
    probe = np.sort(
        np.asarray(
            infer(variables, jnp.asarray(images), 0.0, 0.5)[1]
        ).ravel()
    )
    mid = probe[len(probe) // 2 :]
    gap = int(np.argmax(np.diff(mid)))
    conf_thre = float((mid[gap] + mid[gap + 1]) / 2)

    ref = [
        np.asarray(o)
        for o in infer(variables, jnp.asarray(images), conf_thre, 0.5)
    ]

    mesh = make_mesh(data=4, model=2)
    with mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        v_sharded = shard_params(variables, mesh)
        img_sharded = jax.device_put(
            images, NamedSharding(mesh, P("data", None, None, None))
        )
        got = [
            np.asarray(o) for o in infer(v_sharded, img_sharded, conf_thre, 0.5)
        ]

    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, g, atol=1e-4)
