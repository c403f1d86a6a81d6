"""Same-data two-framework accuracy parity study (round-4 verdict next #5).

The BASELINE gate "VOC2007 mAP within 0.5 pts of the PyTorch reference"
cannot run here (no real VOC, no egress) — this script executes the SAME
protocol at synthetic scale, end-to-end, for the first time:

1. one synthetic VOC (color-correlated classes, ``make_synthetic_voc``);
2. ONE bridged initialization: the torch reference YOLOv2's random init is
   converted to flax (``convert_torch.load_torch_yolov2``) so both
   frameworks descend from identical weights;
3. the torch reference trains with ITS OWN ``train_model``
   (``/root/reference/models/yolov2.py:1280-1387``: per-step SGD rebuild,
   epoch-1 warmup, staged lrs) on CPU; odc_tpu trains with ``Trainer``
   (``momentum=0.0`` = the reference's inert-momentum semantics, quirk B);
   no augmentation on either side (identity albumentations stub / no host
   augment), multi-scale pinned to the study size on both sides;
4. both final weight sets are evaluated through the IDENTICAL odc_tpu
   pipeline (torch weights converted again post-training): streaming
   batched eval + the reference's TP rule — so the reported delta is pure
   TRAINING-DYNAMICS difference, not eval-pipeline difference.

Phases (so the slow torch leg can run in the background while the chip
does other work; JAX is only imported in the jax/eval phases):

    python scripts/two_framework_study.py torch   # -> /tmp/study2f/*
    python scripts/two_framework_study.py jax
    python scripts/two_framework_study.py report

Env knobs: N_TRAIN (192) N_VAL (64) SIZE (192) EPOCHS (30) BS (8)
LR (2e-3) OUT (/tmp/study2f).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time
import types

N_TRAIN = int(os.environ.get("N_TRAIN", 192))
N_VAL = int(os.environ.get("N_VAL", 64))
SIZE = int(os.environ.get("SIZE", 192))
EPOCHS = int(os.environ.get("EPOCHS", 30))
BS = int(os.environ.get("BS", 8))
LR = float(os.environ.get("LR", 2e-3))
OUT = os.environ.get("OUT", "/tmp/study2f")
LAMBDAS = dict(lambda_xy=5.0, lambda_wh=5.0, lambda_conf=1.0,
               lambda_noobj=0.5, lambda_cls=1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def install_albumentations_stub():
    """Identity-transform albumentations stub with a REAL Resize (PIL
    bilinear) — the same shape as tests/conftest.py's, standalone so this
    script never imports the CPU-asserting conftest."""
    if "albumentations" in sys.modules:
        return
    import numpy as np
    from PIL import Image

    stub = types.ModuleType("albumentations")
    stub.__path__ = []
    stub.__odc_stub__ = True

    class _Identity:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *, image=None, bboxes=None, labels=None, **k):
            return {"image": image, "bboxes": bboxes, "labels": labels}

    class Resize:
        def __init__(self, height, width, *a, **k):
            self.h, self.w = height, width

        def __call__(self, *, image=None, bboxes=None, labels=None, **k):
            ih, iw = image.shape[:2]
            if (ih, iw) != (self.h, self.w):
                image = np.asarray(
                    Image.fromarray(image).resize(
                        (self.w, self.h), Image.BILINEAR
                    )
                )
                sx, sy = self.w / iw, self.h / ih
                bboxes = [
                    (x1 * sx, y1 * sy, x2 * sx, y2 * sy)
                    for (x1, y1, x2, y2) in (bboxes or [])
                ]
            return {"image": image, "bboxes": bboxes, "labels": labels}

    class Compose:
        def __init__(self, transforms, *a, **k):
            self.transforms = transforms

        def __call__(self, *, image=None, bboxes=None, labels=None, **k):
            out = {"image": image, "bboxes": bboxes, "labels": labels}
            for t in self.transforms:
                out = t(**out)
            return out

    for name in ("RandomScale", "Affine", "HorizontalFlip", "VerticalFlip",
                 "ChannelShuffle", "HueSaturationValue", "OneOf"):
        setattr(stub, name, _Identity)
    stub.Resize = Resize
    stub.Compose = Compose
    stub.BboxParams = _Identity
    sys.modules["albumentations"] = stub
    sys.modules["albumentations.pytorch"] = types.ModuleType(
        "albumentations.pytorch"
    )


def load_reference_yolov2():
    install_albumentations_stub()
    ref_root = "/root/reference"
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    import importlib

    return importlib.import_module("models.yolov2")


def make_data():
    from odc_tpu.data.voc import VOC, make_synthetic_voc

    root = os.path.join(OUT, "voc")
    if not os.path.exists(os.path.join(root, "voc2012-trainval")):
        make_synthetic_voc(
            root, num_train=N_TRAIN, num_val=N_VAL,
            image_hw=(SIZE, SIZE), seed=0,
        )
    return VOC(dataset_dir=root)


def phase_torch():
    """Train the torch reference with its own train_model; save the INITIAL
    and FINAL state_dicts."""
    import numpy as np
    import torch

    from odc_tpu.data.voc import CLASS_LIST

    torch.set_num_threads(os.cpu_count() or 1)
    os.makedirs(OUT, exist_ok=True)
    voc = make_data()
    mod = load_reference_yolov2()
    cls2idx = {c: i for i, c in enumerate(CLASS_LIST)}

    torch.manual_seed(11)
    ref = mod.YOLOv2(list(CLASS_LIST), cls2idx)
    torch.save(ref.state_dict(), os.path.join(OUT, "init.sd"))

    # Pin the reference's epoch-1 multi-scale pick (note D, an instance
    # method: yolov2.py:1557-1571) to the study size so both frameworks
    # train at SIZE (images are generated at SIZE — the stub Resize is a
    # no-op on them).
    alb = sys.modules["albumentations"]
    ref.get_random_size_transform = lambda: alb.Compose(
        [alb.Resize(SIZE, SIZE)],
        bbox_params=alb.BboxParams(format="pascal_voc",
                                   label_fields=["labels"]),
    )

    items_train = [voc.train_dataset[i]
                   for i in range(len(voc.train_dataset))]
    items_val = [voc.val_dataset[i] for i in range(len(voc.val_dataset))]

    g = torch.Generator()
    g.manual_seed(7)
    train_loader = torch.utils.data.DataLoader(
        items_train, batch_size=BS, shuffle=True, generator=g,
        collate_fn=functools.partial(ref.collate_fn, augmentation=True),
    )
    val_loader = torch.utils.data.DataLoader(
        items_val, batch_size=1, shuffle=False,
        collate_fn=functools.partial(ref.collate_fn, augmentation=False),
    )

    # Calibrate: one epoch timed -> projected total, so misconfigured runs
    # fail fast instead of burning the host for a day.  (collate_fn with
    # augmentation=True reads self.transform/self.resize, which only
    # train_model sets — note D; provide them for the probe epoch.)
    ref.transform = mod.TRANSFORM
    ref.resize = ref.get_random_size_transform()
    t0 = time.time()
    ref.run_one_epoch(1, train_loader, lr=LR, train=True, **LAMBDAS)
    dt = time.time() - t0
    print(f"[torch] epoch time {dt:.1f}s -> projected "
          f"{dt * EPOCHS / 60:.1f} min for {EPOCHS} epochs", flush=True)
    torch.manual_seed(11)
    ref.load_state_dict(torch.load(os.path.join(OUT, "init.sd")))

    ckpt = os.path.join(OUT, "torch_ckpt")
    os.makedirs(ckpt, exist_ok=True)
    t0 = time.time()
    ref.train_model(
        train_loader, val_loader,
        learning_rate_list=[LR], num_epoch_list=[EPOCHS],
        ckpt_path=ckpt, **LAMBDAS,
    )
    torch.save(ref.state_dict(), os.path.join(OUT, "final_torch.sd"))
    json.dump(
        {"epochs": EPOCHS, "lr": LR, "bs": BS, "size": SIZE,
         "n_train": N_TRAIN, "n_val": N_VAL,
         "torch_train_seconds": time.time() - t0},
        open(os.path.join(OUT, "torch_meta.json"), "w"), indent=2,
    )
    print(f"[torch] done in {time.time() - t0:.0f}s", flush=True)


def phase_jax():
    """Train odc_tpu from the bridged torch init, same schedule."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from odc_tpu.config import TrainConfig
    from odc_tpu.data.pipeline import DetectionPipeline
    from odc_tpu.models import YOLOv2
    from odc_tpu.models.convert_torch import load_torch_yolov2
    from odc_tpu.train import Trainer, TrainState, checkpoint
    from odc_tpu.data.voc import CLASS_LIST

    voc = make_data()
    mod = load_reference_yolov2()
    cls2idx = {c: i for i, c in enumerate(CLASS_LIST)}
    ref = mod.YOLOv2(list(CLASS_LIST), cls2idx)
    ref.load_state_dict(torch.load(os.path.join(OUT, "init.sd")))

    model = YOLOv2(dtype=jnp.float32, image_size=(SIZE, SIZE))
    template = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.uint8)
    )
    variables = load_torch_yolov2(ref, template)
    state = TrainState.create(variables)

    cfg = TrainConfig(
        learning_rate_list=[LR], num_epoch_list=[EPOCHS], batch_size=BS,
        max_boxes=8, momentum=0.0, weight_decay=5e-4,
        multiscale_sizes=(), seed=7, **LAMBDAS,
    )
    train_pipe = DetectionPipeline(
        voc.train_dataset, image_hw=(SIZE, SIZE), batch_size=BS,
        max_boxes=8, mode="v2", seed=7,
    )
    val_pipe = DetectionPipeline(
        voc.val_dataset, image_hw=(SIZE, SIZE), batch_size=BS, max_boxes=8,
        mode="v2", shuffle=False, drop_remainder=False,
    )
    ckpt = os.path.join(OUT, "jax_ckpt")
    trainer = Trainer(model, train_pipe, val_pipe, cfg, ckpt_path=ckpt)
    t0 = time.time()
    state, _ = trainer.fit(state)
    checkpoint.save(os.path.join(OUT, "final_jax.ckpt"), state)
    print(f"[jax] done in {time.time() - t0:.0f}s", flush=True)


def phase_report():
    """Evaluate BOTH finals through the identical odc_tpu eval pipeline."""
    import numpy as np
    import torch

    import jax
    import jax.numpy as jnp

    from odc_tpu.data.voc import CLASS_LIST
    from odc_tpu.eval import Detector, evaluate_batched
    from odc_tpu.models import YOLOv2
    from odc_tpu.models.convert_torch import load_torch_yolov2
    from odc_tpu.train import TrainState, checkpoint

    voc = make_data()
    mod = load_reference_yolov2()
    cls2idx = {c: i for i, c in enumerate(CLASS_LIST)}
    ref = mod.YOLOv2(list(CLASS_LIST), cls2idx)

    model = YOLOv2(dtype=jnp.float32, image_size=(SIZE, SIZE))
    template = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.uint8)
    )

    def eval_vars(variables, tag):
        det = Detector(model, variables, conf_thre=0.05)
        result = evaluate_batched(
            det, voc.val_dataset, image_hw=(SIZE, SIZE), batch_size=BS
        )
        aps = np.stack([result[c] for c in CLASS_LIST])
        out = {"map_50": float(aps[:, 0].mean()),
               "map_50_95": float(aps.mean())}
        print(f"[{tag}] mAP@.5 {out['map_50']:.4f}  "
              f"mAP[.5:.95] {out['map_50_95']:.4f}", flush=True)
        return out

    ref.load_state_dict(
        torch.load(os.path.join(OUT, "final_torch.sd"))
    )
    res_torch = eval_vars(load_torch_yolov2(ref, template), "torch->jax")

    state = checkpoint.restore(
        os.path.join(OUT, "final_jax.ckpt"),
        TrainState.create(jax.tree.map(jnp.copy, template)),
    )
    res_jax = eval_vars(
        {"params": state.params, "batch_stats": state.batch_stats}, "odc_tpu"
    )

    meta = json.load(open(os.path.join(OUT, "torch_meta.json")))
    report = {
        "config": meta,
        "torch_reference": res_torch,
        "odc_tpu": res_jax,
        "delta_map_50": res_jax["map_50"] - res_torch["map_50"],
        "delta_map_50_95": res_jax["map_50_95"] - res_torch["map_50_95"],
    }
    path = os.path.join(OUT, "report.json")
    json.dump(report, open(path, "w"), indent=2)
    print(json.dumps(report, indent=2))
    print(f"written: {path}")


if __name__ == "__main__":
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase in ("torch", "all"):
        phase_torch()
    if phase in ("jax", "all"):
        phase_jax()
    if phase in ("report", "all"):
        phase_report()
