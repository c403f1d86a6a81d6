"""Multi-step TRAINING-DYNAMICS parity vs the reference's OWN train loop.

The last reproduced-from-reading reference behavior (round-2 VERDICT
missing #1): every static piece (assigner, decode, single loss value) is
oracle-proven elsewhere; here we run the reference's actual
``run_one_epoch`` (``/root/reference/models/yolov1.py:933-1069`` /
``models/yolov2.py:1142-1278``) — its per-step SGD rebuild
(``yolov1.py:1044-1063``), epoch-1 warmup curve (``:1045-1051``), its
exact loss/backward — against our ``make_train_step(momentum=0.0)`` +
``StagedSchedule`` with SHARED weights bridged through ``convert_torch``.

Methodology note (measured, see commit history): a free-running
cross-framework comparison is CHAOTIC — XLA-CPU and oneDNN convolutions
differ at ~1e-6, some activation out of millions lands within that noise
of a LeakyReLU kink (or an IoU argmax tie), the flipped gradient element
is macroscopic, and the divergence amplifies ~50x per step (param l2
drift at lr=1e-3: 6e-6 after step 1, 3e-3 by step 4).  That is inherent
to ANY cross-framework f32 comparison, not a semantics gap.  So the test
asserts three non-chaotic facts:

A. free-run epoch-1 (warmup) loss mean vs the reference's own
   ``run_one_epoch``, rtol 2e-3 — proves the loop/warmup wiring;
B. RESYNCED per-step parity along the reference's trajectory: every step
   starts both frameworks from the reference's current params, takes one
   step (epoch-1 warmup lrs and epoch-2 constant lr), and compares loss
   (rtol 2e-3), params (global l2 1e-4; per-tensor l2 0.08 — kink-flip
   noise concentrates in near-zero BN-bias tensors), and BN running
   stats (global l2 1e-4) — proves loss gradients + the SGD(wd, inert
   momentum) update + torch-exact BatchNorm stat updates, step by step;
C. reference-exact val-loss semantics (VERDICT task 6): the reference
   validates at bs=1 so its epoch val loss is a mean over per-image
   masked-mean losses (``train.py:68-71``, ``yolov1.py:1113-1122``);
   with identical params, our ``val_loss_mode="per_image"`` eval must
   reproduce the reference's ``run_one_epoch(train=False)`` number from
   ONE padded batch, rtol 5e-4.

Dropout is disabled on BOTH sides for the v1 run (RNG streams can't be
matched across frameworks); everything else runs verbatim.
"""

from __future__ import annotations

import copy

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odc_tpu.data.pipeline import Batch
from odc_tpu.data.voc import CLASS_LIST
from odc_tpu.losses.yolo_loss import Lambdas
from odc_tpu.ops.assign import assign_numpy
from odc_tpu.ops.decode import YOLOV2_ANCHORS
from odc_tpu.train.schedule import StagedSchedule
from odc_tpu.train.trainer import TrainState, make_eval_step, make_train_step

CLS2IDX = {c: i for i, c in enumerate(CLASS_LIST)}

LAMBDAS = dict(
    lambda_xy=5.0, lambda_wh=5.0, lambda_conf=1.0,
    lambda_noobj=0.5, lambda_cls=1.0,
)
MAX_BOXES = 8


def _random_annot(rng, h, w, n):
    x1 = rng.uniform(0, w - 33, n)
    y1 = rng.uniform(0, h - 33, n)
    x2 = x1 + rng.uniform(8, np.minimum(w - x1 - 1, 180))
    y2 = y1 + rng.uniform(8, np.minimum(h - y1 - 1, 180))
    bboxes = [tuple(map(float, b)) for b in np.stack([x1, y1, x2, y2], -1)]
    labels = [CLASS_LIST[i] for i in rng.integers(0, len(CLASS_LIST), n)]
    return {"bbox_list": bboxes, "lbl_list": labels}


def _make_items(seed, n_images, image_hw):
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n_images):
        img = rng.integers(0, 255, image_hw + (3,), dtype=np.uint8)
        annot = _random_annot(rng, *image_hw, n=int(rng.integers(1, 4)))
        items.append((i, img, annot))
    return items


def _our_batch(batch_items, image_hw, mode, pad_images_to=None):
    """The same (idx, img, annot) items as a compact framework Batch."""
    b = len(batch_items)
    bp = pad_images_to or b
    image = np.zeros((bp,) + image_hw + (3,), np.uint8)
    img_ids = np.full((bp,), -1, np.int32)
    rows = []
    for i, (idx, img, annot) in enumerate(batch_items):
        image[i] = img
        img_ids[i] = idx
        rows.append(
            assign_numpy(
                annot["bbox_list"],
                [CLS2IDX[l] for l in annot["lbl_list"]],
                image_hw,
                mode=mode,
                max_boxes=MAX_BOXES,
            )
        )
    while len(rows) < bp:  # padded rows: empty targets
        rows.append(
            assign_numpy([], [], image_hw, mode=mode, max_boxes=MAX_BOXES)
        )
    stack = lambda k: jnp.asarray(np.stack([r[k] for r in rows]))
    return Batch(
        image=jnp.asarray(image), cell=stack(0), sig_txty=stack(1),
        twth=stack(2), box=stack(3), cls=stack(4), valid=stack(5),
        img_id=img_ids,
    )


def _l2_drift(ours, theirs):
    """(worst per-tensor l2(o-t)/l2(t), where, global l2 ratio)."""
    flat_o = jax.tree_util.tree_leaves_with_path(ours)
    flat_t = jax.tree_util.tree_leaves(theirs)
    assert len(flat_o) == len(flat_t)
    worst, where = 0.0, "?"
    num = den = 0.0
    for (path, o), t in zip(flat_o, flat_t):
        o = np.asarray(o, np.float64)
        t = np.asarray(t, np.float64)
        d = float(np.linalg.norm(o - t))
        n = float(np.linalg.norm(t))
        num += d * d
        den += n * n
        rel = d / max(n, 1e-12)
        if rel > worst:
            worst, where = rel, jax.tree_util.keystr(path)
    return worst, where, (num ** 0.5) / max(den ** 0.5, 1e-12)


def _dynamics_case(ref, model, load_fn, items, image_hw, mode, anchors, lr):
    """Run phases A (free-run epoch 1), B (resynced steps), C (val)."""
    import torch

    template = model.init(
        jax.random.key(0), jnp.zeros((1,) + image_hw + (3,), jnp.uint8)
    )
    init_sd = copy.deepcopy(ref.state_dict())
    dataset_size = len(items)
    batch_size = 2
    n_batches = dataset_size // batch_size

    loader = torch.utils.data.DataLoader(
        items, batch_size=batch_size, shuffle=False, collate_fn=ref.collate_fn
    )
    batches_t = list(loader)
    batches_o = [
        _our_batch(items[i * batch_size:(i + 1) * batch_size], image_hw, mode)
        for i in range(n_batches)
    ]

    step_fn = make_train_step(
        model, mode, Lambdas(**LAMBDAS), anchors,
        momentum=0.0, weight_decay=5e-4,
    )
    sched = StagedSchedule([lr], [2])

    # -- A: free-run epoch 1 vs the reference's own run_one_epoch ---------
    state = TrainState.create(load_fn(ref, template))  # shared init
    ref_loss1 = float(
        ref.run_one_epoch(1, loader, lr=lr, train=True, **LAMBDAS)
    )
    our_losses = []
    seen = 0
    for k, bo in enumerate(batches_o):
        seen += batch_size
        lr_k = sched.step_lr(1, seen / dataset_size)
        state, m = step_fn(state, bo, jnp.float32(lr_k), jax.random.key(k))
        our_losses.append(float(m["loss"]))
    np.testing.assert_allclose(
        np.mean(our_losses), ref_loss1, rtol=2e-3,
        err_msg="free-run epoch-1 (warmup) train loss mean",
    )

    # -- B: resynced per-step parity along the reference trajectory -------
    ref.load_state_dict(init_sd)
    ref.train()
    prev = load_fn(ref, jax.tree.map(np.copy, template))
    k = 0
    for epoch in [1, 2]:
        seen = 0
        for bt, bo in zip(batches_t, batches_o):
            seen += batch_size
            k += 1
            lr_k = sched.step_lr(epoch, seen / dataset_size)
            # the reference's per-step optimizer rebuild (momentum inert)
            opt = torch.optim.SGD(
                ref.parameters(), lr=lr_k, momentum=0.9, weight_decay=5e-4
            )
            opt.zero_grad()
            loss_t = ref.get_loss(*bt, **LAMBDAS)
            loss_t.backward()
            opt.step()
            post = load_fn(ref, jax.tree.map(np.copy, template))

            st = TrainState.create(prev)
            st, m = step_fn(st, bo, jnp.float32(lr_k), jax.random.key(k))

            np.testing.assert_allclose(
                float(m["loss"]), float(loss_t), rtol=2e-3,
                err_msg=f"step {k} loss",
            )
            worst, where, glob = _l2_drift(st.params, post["params"])
            assert glob < 1e-4, f"step {k} params global l2 {glob} (@{where})"
            assert worst < 0.08, f"step {k} params worst l2 {worst} @{where}"
            worst, where, glob = _l2_drift(
                st.batch_stats, post["batch_stats"]
            )
            assert glob < 1e-4, f"step {k} stats global l2 {glob} (@{where})"
            prev = post

    # -- C: reference-exact val-loss semantics, identical params ----------
    val_items = _make_items(77, 3, image_hw)
    val_loader = torch.utils.data.DataLoader(
        val_items, batch_size=1, shuffle=False, collate_fn=ref.collate_fn
    )
    ref_val = float(
        ref.run_one_epoch(99, val_loader, train=False, **LAMBDAS)
    )
    eval_step = make_eval_step(
        model, mode, Lambdas(**LAMBDAS), anchors, val_loss_mode="per_image"
    )
    # Pad to 4 rows: the padded image must contribute 0 loss and 0 count.
    vb = _our_batch(val_items, image_hw, mode, pad_images_to=4)
    s, n = eval_step(TrainState.create(prev), vb)
    assert float(n) == 3.0
    np.testing.assert_allclose(
        float(s) / float(n), ref_val, rtol=5e-4,
        err_msg="per-image val loss vs reference bs=1 val pass",
    )


# ---------------------------------------------------------------------------
# YOLOv2: full reference model (builds from scratch, no downloads).
# ---------------------------------------------------------------------------


def test_v2_training_dynamics_parity(reference_models):
    import torch

    from odc_tpu.models import YOLOv2
    from odc_tpu.models.convert_torch import load_torch_yolov2

    torch.manual_seed(11)
    ref = reference_models["yolov2"].YOLOv2(CLASS_LIST, CLS2IDX)

    image_hw = (128, 128)
    items = _make_items(21, 4, image_hw)
    model = YOLOv2(dtype=jnp.float32)

    _dynamics_case(
        ref, model, load_torch_yolov2, items, image_hw,
        "v2", YOLOV2_ANCHORS, lr=1e-3,
    )


# ---------------------------------------------------------------------------
# YOLOv1: replica GoogLeNet backbone (the real __init__ downloads weights),
# dropout disabled on both sides.
# ---------------------------------------------------------------------------


def test_v1_training_dynamics_parity(reference_models):
    import importlib

    import torch

    from torch_googlenet_replica import GoogLeNetReplica, randomize
    from odc_tpu.models import YOLOv1
    from odc_tpu.models.convert_torch import load_torch_yolov1

    mod = reference_models["yolov1"]
    gb_mod = importlib.import_module("models.backbones.googlenet")

    wrapper = gb_mod.GoogLeNetBackbone.__new__(gb_mod.GoogLeNetBackbone)
    torch.nn.Module.__init__(wrapper)
    wrapper.backbone_model = randomize(GoogLeNetReplica(), seed=5)
    wrapper.w_in = 224
    wrapper.h_in = 224
    wrapper.output_shape = [7, 7, 1024]

    ref = mod.YOLOv1.__new__(mod.YOLOv1)
    torch.nn.Module.__init__(ref)
    ref.num_cls = len(CLASS_LIST)
    ref.num_anchor_box = 2
    ref.num_grid_cell_in_height = 7
    ref.num_grid_cell_in_width = 7
    ref.cls_list = CLASS_LIST
    ref.cls2idx = CLS2IDX
    ref.backbone_model = wrapper
    torch.manual_seed(6)
    ref.head_model = torch.nn.Sequential(
        torch.nn.Flatten(),
        torch.nn.Linear(7 * 7 * 1024, 4096),
        torch.nn.ReLU(),
        torch.nn.Dropout(0.0),  # parity: RNG streams can't match
        torch.nn.Linear(4096, 7 * 7 * 30),
    )
    ref.transform = mod.TRANSFORM  # identity stubs
    ref.resize = mod.RESIZE

    image_hw = (224, 224)
    items = _make_items(31, 4, image_hw)
    model = YOLOv1(dtype=jnp.float32, dropout_rate=0.0)

    _dynamics_case(
        ref, model, load_torch_yolov1, items, image_hw, "v1", None, lr=1e-3
    )
