"""Inference + VOC mAP evaluation.

``Detector.detect`` mirrors the reference single-image contract
(``models/yolov1.py:439-554`` / ``models/yolov2.py:651-745``): v1 resizes
to the model input size, clips boxes to the frame, and inverse-resizes them
back to the original image; v2 runs at native size.  Returns the same
``annot_pred`` dict (bbox/lbl/conf/cls-spec-conf lists).

``evaluate_model`` is the reference's per-image evaluation loop
(``models/utils.py:171-338``).  ``evaluate_batched`` is the TPU-native
streaming path (BASELINE.md config 5): fixed-size batches through one jitted
infer program, boxes rescaled per image, same AP math — orders of magnitude
faster than per-image detect.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from odc_tpu.core.ap import APAccumulator, DEFAULT_LEVELS
from odc_tpu.data.voc import CLASS_LIST
from odc_tpu.ops.detect import make_infer_fn


def _resize_host(img: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    from odc_tpu.native import loader as native_loader

    if img.shape[:2] == tuple(out_hw):
        return img
    if native_loader.available():
        return native_loader.resize_bilinear(img, out_hw)
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BILINEAR)
    )


class Detector:
    """Model + params bound into jitted inference programs (cached per
    image shape).

    Note: v2 native-size ``detect`` compiles one program per unique input
    shape (reference parity demands native pixels).  For throughput over
    many differently-sized images use ``evaluate_batched`` /
    ``infer_batch`` at a fixed size instead; jax's persistent compilation
    cache amortizes repeat shapes across processes."""

    def __init__(
        self,
        model,
        variables,
        cls_list: Sequence[str] = tuple(CLASS_LIST),
        conf_thre: float = 0.9,
        iou_thre: float = 0.5,
        max_keep: int = 64,
        class_wise: bool = False,
        int8_neck: bool = False,
        int8_scales=None,
        int8_stem: str = "s2d",
    ) -> None:
        self.model = model
        self.variables = variables
        self.cls_list = list(cls_list)
        self.conf_thre = conf_thre
        self.iou_thre = iou_thre
        self.max_keep = max_keep
        self.mode = {"YOLOv1": "v1", "YOLOv3": "v3"}.get(
            type(model).__name__, "v2"
        )
        if (int8_neck or int8_scales is not None) and self.mode != "v2":
            # Silently dropping the int8 config would evaluate bf16 under
            # an int8 label (the round-3 advisor's mislabeling class).
            raise ValueError(
                "int8_neck/int8_scales are YOLOv2-only (the engine "
                "hardcodes the Darknet-19/quadrant graph; PROFILE.md "
                "'int8 and YOLOv1')"
            )
        self._make_kwargs = dict(
            class_wise=class_wise,
            int8_neck=int8_neck,
            int8_scales=int8_scales,
            int8_stem=int8_stem,
        )
        self._infer = jax.jit(
            make_infer_fn(
                model, conf_thre, iou_thre, max_keep, **self._make_kwargs
            )
        )
        self._infer_compact = None  # built lazily (streaming eval path)

    # -- batched path -------------------------------------------------------

    def infer_batch(
        self,
        images: np.ndarray,
        conf_thre: Optional[float] = None,
        iou_thre: Optional[float] = None,
    ):
        """[B, H, W, 3] uint8 -> (boxes [B,K,4], conf [B,K], cls_scores
        [B,K,C], keep [B,K]) numpy.  Thresholds are traced scalars — one
        compiled program serves every pair."""
        out = self._infer(
            self.variables,
            jnp.asarray(images),
            self.conf_thre if conf_thre is None else conf_thre,
            self.iou_thre if iou_thre is None else iou_thre,
        )
        return tuple(np.asarray(o) for o in out)

    def infer_batch_compact(
        self,
        images: np.ndarray,
        conf_thre: Optional[float] = None,
        iou_thre: Optional[float] = None,
    ):
        """Like :meth:`infer_batch` but with per-box (label, score) computed
        on device: (boxes [B,K,4], conf [B,K], label [B,K] int32,
        label_score [B,K], keep [B,K]) — 5x less D2H than fetching the full
        class-score tensor (what the streaming mAP eval uses)."""
        if self._infer_compact is None:
            self._infer_compact = jax.jit(
                make_infer_fn(
                    self.model, self.conf_thre, self.iou_thre, self.max_keep,
                    compact=True, **self._make_kwargs,
                )
            )
        out = self._infer_compact(
            self.variables,
            jnp.asarray(images),
            self.conf_thre if conf_thre is None else conf_thre,
            self.iou_thre if iou_thre is None else iou_thre,
        )
        return tuple(np.asarray(o) for o in out)

    # -- reference-contract single-image path --------------------------------

    def detect(self, img: np.ndarray, conf_score_thre: Optional[float] = None,
               iou_thre: Optional[float] = None) -> Dict[str, list]:
        orig_h, orig_w = img.shape[:2]

        if self.mode in ("v1", "v3"):
            # v3's top-down upsample+concat needs matched tap sizes, so it
            # runs at the configured network size (resize in, boxes
            # inverse-resized out) — the v1-style contract, not v2's
            # native-size quirk.
            net_hw = self.model.image_size
            x = _resize_host(img, net_hw)
        else:
            # v2 feeds the NATIVE image (yolov2.py:666-667); the pooling
            # chain floors odd dims, and the quadrant neck drops the odd
            # trailing row/col exactly like the reference slicing.
            if orig_h < 64 or orig_w < 64:
                raise ValueError(
                    f"YOLOv2 native-size detect needs images >= 64x64 "
                    f"(stride-32 grid plus the passthrough tap), got "
                    f"{orig_h}x{orig_w}"
                )
            x = img

        boxes, conf, cls_scores, keep = self.infer_batch(
            x[None], conf_score_thre, iou_thre
        )
        boxes, conf, cls_scores = boxes[0][keep[0]], conf[0][keep[0]], cls_scores[0][keep[0]]

        if self.mode in ("v1", "v3"):
            # Clip to the network frame (yolov1.py:518-523) then
            # inverse-resize to the original image (yolov1.py:536-543);
            # v3 follows the same sane contract.
            h, w = net_hw
            boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0.0, w - 1.0)
            boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0.0, h - 1.0)
            boxes = boxes * np.array(
                [orig_w / w, orig_h / h, orig_w / w, orig_h / h]
            )
        # v2: boxes are already in native pixel coordinates (the reference
        # applies no clip or inverse resize, yolov2.py:651-745).

        lbl_idx = cls_scores.argmax(-1) if len(cls_scores) else np.zeros(0, int)
        return {
            "bbox_list": boxes.tolist(),
            "lbl_list": [self.cls_list[i] for i in lbl_idx],
            "conf_score_list": conf.tolist(),
            "cls_spec_conf_score_list": (
                cls_scores.max(-1).tolist() if len(cls_scores) else []
            ),
        }


def evaluate_model(
    detector: Detector,
    dataset,
    levels: Sequence[float] = DEFAULT_LEVELS,
    dedup: bool = False,
    progress: bool = False,
) -> Dict[str, np.ndarray]:
    """Reference-style per-image evaluation loop (utils.py:171-338)."""
    acc = APAccumulator(detector.cls_list, levels, dedup=dedup)
    n = len(dataset)
    for i in range(n):
        _, img, annot = dataset[i]
        if progress:
            print(f"Evaluation: [{i + 1} / {n}]", end="\r")
        pred = detector.detect(img)
        acc.add_image(
            np.asarray(pred["bbox_list"], np.float64).reshape(-1, 4),
            pred["lbl_list"],
            np.asarray(pred["cls_spec_conf_score_list"], np.float64),
            np.asarray(annot["bbox_list"], np.float64).reshape(-1, 4),
            annot["lbl_list"],
        )
    return acc.result()


def evaluate_batched(
    detector: Detector,
    dataset,
    image_hw: Tuple[int, int] = (416, 416),
    batch_size: int = 64,
    levels: Sequence[float] = DEFAULT_LEVELS,
    dedup: bool = False,
    prefetch: int = 2,
) -> Dict[str, np.ndarray]:
    """Streaming batched mAP: fixed-size batches through one compiled
    program; predictions rescaled to original image coordinates.

    Host work (JPEG decode+resize via the C++ thread pool when available,
    else per-sample) runs on a prefetch thread, overlapped with the
    device's inference on the previous batch (BASELINE config 5)."""
    from odc_tpu.native import loader as native_loader
    from odc_tpu.data.voc import dataset_supports_raw_paths

    acc = APAccumulator(detector.cls_list, levels, dedup=dedup)
    n = len(dataset)
    h, w = image_hw
    fast = (
        dataset_supports_raw_paths(dataset)
        and native_loader.batch_available()
    )

    def load(start):
        idxs = range(start, min(start + batch_size, n))
        imgs = np.zeros((batch_size, h, w, 3), np.uint8)
        if fast:
            paths = [dataset.img_path_list[i] for i in idxs]
            decoded, src_hw = native_loader.decode_resize_batch(
                paths, image_hw
            )
            imgs[: len(paths)] = decoded
            metas = [
                (tuple(src_hw[j]), dataset.annot_list[i])
                for j, i in enumerate(idxs)
            ]
        else:
            metas = []
            for j, i in enumerate(idxs):
                _, img, annot = dataset[i]
                imgs[j] = _resize_host(img, image_hw)
                metas.append((img.shape[:2], annot))
        return imgs, metas

    def batches():
        def items():
            for start in range(0, n, batch_size):
                yield load(start)

        if prefetch <= 0:
            yield from items()
            return
        from odc_tpu.data.prefetch import threaded_prefetch

        yield from threaded_prefetch(items, maxsize=prefetch)

    for imgs, metas in batches():
        boxes_b, _conf_b, lbl_b, score_b, keep_b = (
            detector.infer_batch_compact(imgs)
        )
        for j, ((oh, ow), annot) in enumerate(metas):
            keep = keep_b[j]
            boxes = boxes_b[j][keep] * np.array(
                [ow / w, oh / h, ow / w, oh / h]
            )
            acc.add_image(
                boxes,
                [detector.cls_list[k] for k in lbl_b[j][keep]],
                score_b[j][keep],
                np.asarray(annot["bbox_list"], np.float64).reshape(-1, 4),
                annot["lbl_list"],
            )
    return acc.result()


def evaluate_batched_native(
    detector: Detector,
    dataset,
    bucket_multiple: int = 32,
    batch_size: int = 8,
    levels: Sequence[float] = DEFAULT_LEVELS,
    dedup: bool = False,
    prefetch: int = 2,
) -> Dict[str, np.ndarray]:
    """Bucketed NATIVE-parity streaming mAP (YOLOv2).

    The reference evaluates v2 at each image's native size (no resize,
    ``models/yolov2.py:666-667``) — one compiled program per unique size if
    done naively (the ``Detector.detect`` caveat).  Here images are PADDED
    (never resized) to the next ``bucket_multiple`` bucket and batched per
    bucket; the masked forward + per-image native decode
    (``make_native_infer_fn``) reproduce each image's native-size boxes
    while the executable set is bounded by the number of DISTINCT BUCKETS
    (~a dozen on VOC at 32-multiples), not unique image sizes.

    Streaming memory is bounded: at most ``#buckets x batch_size`` decoded
    images are pending at any time; each bucket flushes when full.
    """
    if detector.mode != "v2":
        raise ValueError("native-parity bucketed eval is v2-only "
                         "(v1 resizes to the network size)")
    if detector._make_kwargs.get("int8_neck"):
        # The single-layer dynamic-PTQ neck rides model.apply's
        # neck_override hook, which is incompatible with the masked
        # valid_hw forward; the FULL engine (int8_scales) has its own
        # masked native path and is supported below.
        raise ValueError(
            "native-parity bucketed eval does not support int8_neck; use "
            "the full engine (int8_scales) or the bf16 detector"
        )
    from odc_tpu.ops.detect import make_native_infer_fn

    infer = jax.jit(
        make_native_infer_fn(
            detector.model, detector.conf_thre, detector.iou_thre,
            detector.max_keep,
            class_wise=detector._make_kwargs.get("class_wise", False),
            int8_scales=detector._make_kwargs.get("int8_scales"),
            int8_stem=detector._make_kwargs.get("int8_stem", "s2d"),
        )
    )
    acc = APAccumulator(detector.cls_list, levels, dedup=dedup)

    def flush(bucket_hw, items):
        bh, bw = bucket_hw
        imgs = np.zeros((batch_size, bh, bw, 3), np.uint8)
        vhw = np.full((batch_size, 2), 64, np.int32)  # pad slots: dummy 64²
        for j, (img, _annot) in enumerate(items):
            h, w = img.shape[:2]
            imgs[j, :h, :w] = img
            vhw[j] = (h, w)
        boxes_b, _conf_b, lbl_b, score_b, keep_b = (
            np.asarray(o)
            for o in infer(
                detector.variables, jnp.asarray(imgs), jnp.asarray(vhw),
                detector.conf_thre, detector.iou_thre,
            )
        )
        for j, (_img, annot) in enumerate(items):
            keep = keep_b[j]
            acc.add_image(
                boxes_b[j][keep],
                [detector.cls_list[k] for k in lbl_b[j][keep]],
                score_b[j][keep],
                np.asarray(annot["bbox_list"], np.float64).reshape(-1, 4),
                annot["lbl_list"],
            )

    def items():
        for i in range(len(dataset)):
            yield dataset[i]

    source = items()
    if prefetch > 0:
        # Overlap host JPEG decode with the device's inference on already
        # flushed buckets (same pattern as evaluate_batched).
        from odc_tpu.data.prefetch import threaded_prefetch

        source = threaded_prefetch(
            items, maxsize=max(1, prefetch * batch_size)
        )

    pending: Dict[Tuple[int, int], list] = {}
    for _id, img, annot in source:
        h, w = img.shape[:2]
        if h < 64 or w < 64:
            raise ValueError(
                f"native-size v2 eval needs images >= 64x64, got {h}x{w}"
            )
        bucket = (
            -(-h // bucket_multiple) * bucket_multiple,
            -(-w // bucket_multiple) * bucket_multiple,
        )
        items = pending.setdefault(bucket, [])
        items.append((img, annot))
        if len(items) == batch_size:
            flush(bucket, pending.pop(bucket))
    for bucket in sorted(pending):
        flush(bucket, pending[bucket])
    return acc.result()
