"""Multi-process data-parallel worker, driven by ``test_multihost.py``.

Each process owns 2 virtual CPU devices and its ``process_index`` slice of
every global batch (``DetectionPipeline(process_index, process_count)``);
``shard_batch`` assembles the global jax.Array via
``jax.make_array_from_process_local_data`` and the jitted train step runs
over the full (data=4) mesh with XLA/gloo cross-process collectives — the
DCN story of SURVEY.md §5's distributed row, which the reference (single
process, single device, SURVEY.md §2) has no analog of.

Run as: ``python multihost_worker.py <pid> <port> <nproc> <dataset_dir> <out.json>``
(single-process mode when nproc == 1: same math, no distributed init).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    pid, port, nproc = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])
    dataset_dir, out_path = sys.argv[4], sys.argv[5]

    import jax

    # The ambient sitecustomize may have initialized a backend already —
    # jax_num_cpu_devices only takes effect on a fresh backend.
    try:
        jax.extend.backend.clear_backends()
    except Exception:
        pass
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )

    import numpy as np
    import jax.numpy as jnp

    from odc_tpu.data.pipeline import DetectionPipeline
    from odc_tpu.data.voc import VOC
    from odc_tpu.losses.yolo_loss import Lambdas
    from odc_tpu.models import YOLOv2
    from odc_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
    from odc_tpu.train.trainer import TrainState, make_train_step

    ds = VOC(dataset_dir=dataset_dir).train_dataset
    pipe = DetectionPipeline(
        ds,
        image_hw=(64, 64),
        batch_size=4,          # GLOBAL batch; each process reads its slice
        max_boxes=8,
        mode="v2",
        shuffle=True,
        seed=3,
        prefetch=0,
        process_index=pid,
        process_count=nproc,
    )

    model = YOLOv2(dtype=jnp.float32, image_size=(64, 64))
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.uint8)
    )
    state = TrainState.create(variables)
    mesh = make_mesh(data=len(jax.devices()), model=1)
    step = make_train_step(
        model, "v2", Lambdas(5.0, 5.0, 1.0, 0.5, 1.0),
        anchors=model.anchors, momentum=0.9,
    )

    batch = next(iter(pipe))
    local_img_ids = np.asarray(batch.img_id).tolist()
    with mesh:
        state = shard_state(state, mesh)
        gbatch = shard_batch(batch, mesh)
        state, m1 = step(state, gbatch, 1e-3, jax.random.key(1))
        # step 2 on the same batch: agreement proves the psum'd gradients
        # (and BN cross-process batch stats) updated params identically
        _, m2 = step(state, gbatch, 1e-3, jax.random.key(1))
        loss1 = float(np.asarray(m1["loss"]))
        loss2 = float(np.asarray(m2["loss"]))

    with open(out_path, "w") as f:
        json.dump(
            {
                "process_index": pid,
                "process_count": nproc,
                "num_devices": len(jax.devices()),
                "local_img_ids": local_img_ids,
                "loss1": loss1,
                "loss2": loss2,
            },
            f,
        )


if __name__ == "__main__":
    main()
