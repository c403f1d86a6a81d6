"""Batched detection input pipeline.

Replaces the reference's per-sample, per-tensor host→device collate
(``models/yolov1.py:1178-1355``, the ★ H2D-per-box anti-pattern in
SURVEY.md §3.5) with:

* one uint8 image tensor per batch (normalization happens on device, fused
  into the first conv) and compact padded targets (``odc_tpu/ops/assign``,
  float64 host math for bitwise parity);
* JPEG decode + resize through the native C++ loader when built (libjpeg +
  cv2-convention bilinear, matching the reference's cv2 path) or PIL;
* a background prefetch thread so decode overlaps device compute —
  the reference runs ``num_workers=0``, fully serial (train.py:64-71).

Multi-scale training (v2): the pipeline re-targets its static image size
from ``multiscale_sizes`` per epoch according to the configured policy
(SURVEY.md note D: the reference re-picks only at epoch 1 due to a
precedence bug; both behaviors supported).
"""

from __future__ import annotations

from typing import Callable, Iterator, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from odc_tpu.data.voc import VOCDataset, CLASS_LIST
from odc_tpu.ops.assign import assign_numpy


class Batch(NamedTuple):
    """Everything the train step consumes, as host numpy (static shapes)."""

    image: np.ndarray     # [B, H, W, 3] uint8
    cell: np.ndarray      # [B, M, 2] int32
    sig_txty: np.ndarray  # [B, M, 2] f32
    twth: np.ndarray      # [B, M, 2] f32
    box: np.ndarray       # [B, M, 4] f32
    cls: np.ndarray       # [B, M] int32
    valid: np.ndarray     # [B, M] bool
    img_id: np.ndarray    # [B] int32 (dataset indices)


def _resize_with_boxes(img, boxes, out_hw):
    """cv2-convention bilinear resize + box rescale (the reference's
    albumentations Resize behavior)."""
    from odc_tpu.native import loader as native_loader

    h, w = img.shape[:2]
    oh, ow = out_hw
    if (h, w) != (oh, ow):
        if native_loader.available():
            img = native_loader.resize_bilinear(img, (oh, ow))
        else:
            from PIL import Image

            img = np.asarray(
                Image.fromarray(img).resize((ow, oh), Image.BILINEAR)
            )
        if len(boxes):
            boxes = np.asarray(boxes, np.float64) * np.array(
                [ow / w, oh / h, ow / w, oh / h]
            )
    return img, np.asarray(boxes, np.float64).reshape(-1, 4)


AugmentFn = Callable[
    [np.ndarray, np.ndarray, np.ndarray, np.random.Generator],
    Tuple[np.ndarray, np.ndarray, np.ndarray],
]


class DetectionPipeline:
    """Epoch iterator producing static-shape :class:`Batch` objects."""

    def __init__(
        self,
        dataset: VOCDataset,
        image_hw: Tuple[int, int] = (416, 416),
        batch_size: int = 32,
        max_boxes: int = 64,
        mode: str = "v2",
        shuffle: bool = True,
        augment: Optional[AugmentFn] = None,
        cls_list: Sequence[str] = tuple(CLASS_LIST),
        seed: int = 0,
        drop_remainder: bool = True,
        prefetch: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ) -> None:
        self.dataset = dataset
        self.image_hw = tuple(image_hw)
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.mode = mode
        self.shuffle = shuffle
        self.augment = augment
        self.cls2idx = {c: i for i, c in enumerate(cls_list)}
        self.drop_remainder = drop_remainder
        self.prefetch = prefetch

        # Multi-host data parallelism: ``batch_size`` stays the GLOBAL
        # batch; each process materializes only its contiguous
        # ``batch_size/process_count`` slice of every seed-aligned global
        # batch (``parallel.shard_batch`` assembles the global array via
        # ``jax.make_array_from_process_local_data``).  The shuffle rng is
        # shared (identical order on every host); the augment rng is
        # per-process (each host only augments its own samples).
        if not 0 <= process_index < process_count:
            raise ValueError(
                f"process_index {process_index} not in [0, {process_count})"
            )
        if batch_size % process_count:
            raise ValueError(
                f"global batch {batch_size} not divisible by "
                f"process_count {process_count}"
            )
        self.process_index = process_index
        self.process_count = process_count
        self.local_batch_size = batch_size // process_count
        if process_count > 1:
            self._order_rng = np.random.default_rng(seed)
            self.rng = np.random.default_rng([seed, process_index])
        else:
            # single-process: one stream, exactly the historical behavior
            self.rng = self._order_rng = np.random.default_rng(seed)

    def set_image_size(self, image_hw: Tuple[int, int]) -> None:
        """Re-target the static image size (multi-scale training)."""
        self.image_hw = tuple(image_hw)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # -- sample/batch construction ----------------------------------------

    def _load_sample(self, idx: int):
        img_id, img, annot = self.dataset[idx]
        boxes = np.asarray(annot["bbox_list"], np.float64).reshape(-1, 4)
        labels = np.asarray(
            [self.cls2idx[c] for c in annot["lbl_list"]], np.int32
        )
        if self.augment is not None:
            img, boxes, labels = self.augment(img, boxes, labels, self.rng)
        img, boxes = _resize_with_boxes(img, boxes, self.image_hw)
        return img_id, img, boxes, labels

    def _make_batch(self, indices) -> Batch:
        # Short tail batches (drop_remainder=False) are PADDED to the full
        # static batch size: padded rows have zero images, no valid boxes,
        # and img_id == -1.  Every LOSS term is masked by box validity, so
        # padded rows contribute nothing at EVAL (the compiled step is
        # reused, no tail-shape recompile, and no image is silently dropped
        # — the reference validates over every image, train.py:68-71).
        # NOT safe for training: zero images would still feed BatchNorm
        # batch statistics — Trainer rejects drop_remainder=False train
        # pipelines.
        b = self.local_batch_size
        m = self.max_boxes
        h, w = self.image_hw
        image = np.zeros((b, h, w, 3), np.uint8)
        cell = np.zeros((b, m, 2), np.int32)
        sig_txty = np.zeros((b, m, 2), np.float32)
        twth = np.zeros((b, m, 2), np.float32)
        box = np.zeros((b, m, 4), np.float32)
        cls = np.zeros((b, m), np.int32)
        valid = np.zeros((b, m), bool)
        img_ids = np.full((b,), -1, np.int32)

        boxes_of = self._load_batch_images(indices, image)
        for i, (idx, (boxes, labels)) in enumerate(zip(indices, boxes_of)):
            img_ids[i] = idx
            (
                cell[i], sig_txty[i], twth[i], box[i], cls[i], valid[i]
            ) = assign_numpy(
                boxes, labels, self.image_hw, mode=self.mode, max_boxes=m
            )

        return Batch(image, cell, sig_txty, twth, box, cls, valid, img_ids)

    def _load_batch_images(self, indices, image_out: np.ndarray):
        """Fill ``image_out[:len(indices)]`` and return per-sample
        (boxes, labels).

        Fast path (no host augmentation, JPEG-backed dataset, native loader
        built): ONE call into the C++ thread pool decodes and resizes the
        whole batch off the GIL (``odc_decode_resize_batch``) — the
        resize/rescale math is bitwise-identical to the per-sample path."""
        from odc_tpu.native import loader as native_loader
        from odc_tpu.data.voc import dataset_supports_raw_paths

        h, w = self.image_hw
        fast = (
            self.augment is None
            and dataset_supports_raw_paths(self.dataset)
            and native_loader.batch_available()
        )
        if fast:
            paths = [self.dataset.img_path_list[i] for i in indices]
            imgs, src_hw, rcs = native_loader.decode_resize_batch(
                paths, (h, w), return_status=True
            )
            image_out[: len(indices)] = imgs
            # A non-JPEG or corrupt file must not abort the epoch: fall back
            # to the per-sample slow path (PIL decodes other formats) for
            # just the failed indices.
            fallback = {}
            for i in np.flatnonzero(rcs):
                _img_id, img, fb_boxes, fb_labels = self._load_sample(
                    int(indices[i])
                )
                image_out[i] = img
                fallback[int(i)] = (fb_boxes, fb_labels)
            out = []
            for i, idx in enumerate(indices):
                if i in fallback:
                    # boxes already network-scaled by _load_sample's
                    # _resize_with_boxes.
                    out.append(fallback[i])
                    continue
                annot = self.dataset.annot_list[idx]
                boxes = np.asarray(
                    annot["bbox_list"], np.float64
                ).reshape(-1, 4)
                labels = np.asarray(
                    [self.cls2idx[c] for c in annot["lbl_list"]], np.int32
                )
                sh, sw = int(src_hw[i, 0]), int(src_hw[i, 1])
                if (sh, sw) != (h, w) and len(boxes):
                    boxes = boxes * np.array([w / sw, h / sh, w / sw, h / sh])
                out.append((boxes, labels))
            return out

        out = []
        for i, idx in enumerate(indices):
            _img_id, img, boxes, labels = self._load_sample(idx)
            image_out[i] = img
            out.append((boxes, labels))
        return out

    # -- iteration ----------------------------------------------------------

    def _batch_indices(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._order_rng.shuffle(order)
        bs = self.batch_size
        lb = self.local_batch_size
        stop = (len(order) // bs) * bs if self.drop_remainder else len(order)
        for start in range(0, stop, bs):
            chunk = order[start : start + bs]
            # this process's contiguous slice of the global batch (may be
            # short or empty on the tail when drop_remainder=False — the
            # padded-batch path keeps every host yielding the same number
            # of batches, which lockstep collectives require)
            yield chunk[self.process_index * lb : (self.process_index + 1) * lb]

    def __iter__(self) -> Iterator[Batch]:
        if self.prefetch <= 0:
            for idxs in self._batch_indices():
                yield self._make_batch(idxs)
            return

        from odc_tpu.data.prefetch import threaded_prefetch

        def items():
            for idxs in self._batch_indices():
                yield self._make_batch(idxs)

        yield from threaded_prefetch(items, maxsize=self.prefetch)
