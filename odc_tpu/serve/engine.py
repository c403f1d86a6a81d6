"""AOT serving engine — a self-contained compiled deployment artifact.

The reference's deployment story is a live torch process: rebuild the
model class, ``torch.load`` a state_dict, call ``detect()`` per image
(``models/yolov1.py:439-554``; ``train.py:46-50`` saves nothing but
state_dicts + a config json).  The TPU-native serving story is
TensorRT-like instead: :func:`export_engine` AOT-lowers the FULL
end-to-end inference program — uint8 pixels → normalize → backbone →
decode → NMS, optionally the full-int8 PTQ engine with its calibration
baked in — via ``jax.export`` (StableHLO), embeds the weights as module
constants, and writes ONE file.  A serving host needs only
``load_engine(path)``: no model code, no checkpoint, no re-trace, and the
artifact is immune to drift in the Python model definition.  The
confidence/IoU thresholds stay RUNTIME scalars, so a single artifact
serves every operating point (the reference re-runs ``detect`` with new
kwargs; same surface here without recompilation).

Container format (single file)::

    b"ODCE" | u8 version | u32 LE manifest length | manifest JSON (utf-8)
           | jax.export serialized blob

The manifest carries the I/O contract (batch/image shape, max_keep,
class list, output layout, precision) so hosts can validate inputs and
label outputs without deserializing the program.
"""

from __future__ import annotations

import io
import json
import struct
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from odc_tpu.data.voc import CLASS_LIST
from odc_tpu.ops.detect import make_infer_fn

_MAGIC = b"ODCE"
_VERSION = 1


def export_engine(
    model,
    variables,
    *,
    batch_size: Optional[int],
    image_hw: Tuple[int, int],
    conf_thre: float = 0.9,
    iou_thre: float = 0.5,
    max_keep: int = 64,
    class_wise: bool = False,
    compact: bool = False,
    int8_scales=None,
    int8_stem: str = "s2d",
    cls_list: Sequence[str] = tuple(CLASS_LIST),
    platforms: Optional[Sequence[str]] = None,
    weights_dtype=None,
) -> bytes:
    """Compile + serialize an inference engine; returns the artifact bytes.

    The exported callable signature is
    ``(images [B,H,W,3] uint8, conf_thre f32, iou_thre f32)`` returning
    the :func:`make_infer_fn` outputs (``compact=False``: boxes, conf,
    cls_scores, keep; ``compact=True``: boxes, conf, label, label_score,
    keep).  ``platforms`` defaults to the current backend; pass e.g.
    ``("tpu", "cpu")`` for a multi-platform artifact (larger, but runs on
    either).

    ``batch_size=None`` exports with a SYMBOLIC batch dimension
    (``jax.export`` shape polymorphism): one artifact serves every batch
    size, at the cost of one device compile per distinct size at load
    time — production hosts should still bucket sizes; fixed-batch
    artifacts keep the TensorRT-style single-executable guarantee.
    """
    if int8_scales is not None and type(model).__name__ != "YOLOv2":
        # Silently exporting a bf16 artifact while the manifest claims
        # int8_full would mislabel every downstream measurement (the same
        # failure class the round-3 advisor flagged on
        # evaluate_batched_native).
        raise ValueError("int8_scales is YOLOv2-only (PROFILE.md "
                         "'int8 and YOLOv1')")
    infer = make_infer_fn(
        model,
        conf_thre,
        iou_thre,
        max_keep,
        class_wise=class_wise,
        compact=compact,
        int8_scales=int8_scales,
        int8_stem=int8_stem,
    )
    # Close over the weights: they become StableHLO module constants — the
    # artifact is self-contained (the TensorRT-engine analog; ~4 bytes/param
    # f32).  int8_scales ride along the same way.  ``weights_dtype=bf16``
    # halves the artifact: the bf16 compute path casts weights down anyway,
    # so only the BN-fold/requant constants lose precision (a ~1e-2-scale
    # head shift; keep f32 for strict-parity serving or int8 calibration
    # fidelity).
    consts = jax.tree.map(jnp.asarray, variables)
    if weights_dtype is not None:
        consts = jax.tree.map(
            lambda a: a.astype(weights_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            consts,
        )

    def call(images, conf, iou):
        return infer(consts, images, conf, iou)

    h, w = image_hw
    from jax import export as jax_export

    if batch_size is None:
        (bdim,) = jax_export.symbolic_shape("b")
    else:
        bdim = batch_size
    args = (
        jax.ShapeDtypeStruct((bdim, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.float32),
    )

    exp = jax_export.export(
        jax.jit(call),
        platforms=tuple(platforms) if platforms is not None else None,
    )(*args)
    blob = exp.serialize()

    if int8_scales is not None:
        precision = "int8_full"
    else:
        precision = "bf16"
    manifest = {
        "format_version": _VERSION,
        "model": type(model).__name__,
        "batch_size": int(batch_size) if batch_size is not None else None,
        "image_hw": [int(h), int(w)],
        "max_keep": int(max_keep),
        "cls_list": list(cls_list),
        "conf_thre_default": float(conf_thre),
        "iou_thre_default": float(iou_thre),
        "class_wise": bool(class_wise),
        "compact": bool(compact),
        "precision": precision,
        "int8_stem": int8_stem if int8_scales is not None else None,
        "platforms": list(exp.platforms),
        "weights_dtype": (
            jnp.dtype(weights_dtype).name if weights_dtype is not None
            else "checkpoint"
        ),
        "jax_version": jax.__version__,
        "outputs": (
            ["boxes", "conf", "label", "label_score", "keep"]
            if compact
            else ["boxes", "conf", "cls_scores", "keep"]
        ),
    }
    mbytes = json.dumps(manifest).encode("utf-8")
    buf = io.BytesIO()
    buf.write(_MAGIC)
    buf.write(struct.pack("<B", _VERSION))
    buf.write(struct.pack("<I", len(mbytes)))
    buf.write(mbytes)
    buf.write(blob)
    return buf.getvalue()


def save_engine(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def _split(data: bytes) -> Tuple[Dict, bytes]:
    if data[:4] != _MAGIC:
        raise ValueError("not an ODCE engine artifact (bad magic)")
    version = data[4]
    if version > _VERSION:
        raise ValueError(f"engine format v{version} is newer than supported "
                         f"v{_VERSION}")
    (mlen,) = struct.unpack("<I", data[5:9])
    manifest = json.loads(data[9 : 9 + mlen].decode("utf-8"))
    return manifest, data[9 + mlen :]


class ServingEngine:
    """A loaded engine: validated input contract + numpy in/out predict.

    ``predict`` accepts any leading batch 1..B (padded up to the compiled
    batch on the host, outputs trimmed back).  ``predict_annots`` renders
    the reference ``detect()`` output contract (``annot_pred`` dicts with
    ``bbox_list``/``lbl_list``/``conf_score_list``/
    ``cls_spec_conf_score_list``, ``models/yolov1.py:545-553``) from the
    engine outputs.
    """

    def __init__(self, manifest: Dict, exported) -> None:
        self.manifest = manifest
        self._exported = exported
        self._call = jax.jit(exported.call)

    @property
    def batch_size(self) -> Optional[int]:
        """Compiled batch, or ``None`` for a symbolic-batch artifact."""
        return self.manifest["batch_size"]

    def predict(
        self,
        images: np.ndarray,
        conf_thre: Optional[float] = None,
        iou_thre: Optional[float] = None,
    ) -> Tuple[np.ndarray, ...]:
        images = np.asarray(images)
        b = self.batch_size
        h, w = self.manifest["image_hw"]
        if images.ndim != 4 or images.shape[1:] != (h, w, 3):
            raise ValueError(
                f"engine expects [n{f'<={b}' if b else ''}, {h}, {w}, 3] "
                f"uint8, got {images.shape}"
            )
        n = images.shape[0]
        if b is not None:
            if n > b:
                raise ValueError(f"batch {n} exceeds compiled batch {b}")
            if n < b:
                images = np.concatenate(
                    [images, np.zeros((b - n, h, w, 3), np.uint8)], 0
                )
        out = self._call(
            jnp.asarray(images, jnp.uint8),
            jnp.float32(
                self.manifest["conf_thre_default"]
                if conf_thre is None
                else conf_thre
            ),
            jnp.float32(
                self.manifest["iou_thre_default"]
                if iou_thre is None
                else iou_thre
            ),
        )
        return tuple(np.asarray(o)[:n] for o in out)

    def predict_annots(
        self,
        images: np.ndarray,
        conf_thre: Optional[float] = None,
        iou_thre: Optional[float] = None,
    ) -> List[Dict]:
        outs = self.predict(images, conf_thre, iou_thre)
        cls_list = self.manifest["cls_list"]
        annots = []
        if self.manifest["compact"]:
            boxes, conf, label, label_score, keep = outs
        else:
            boxes, conf, cls_scores, keep = outs
            label = np.argmax(cls_scores, axis=-1)
            label_score = np.take_along_axis(
                cls_scores, label[..., None], axis=-1
            )[..., 0]
        for i in range(boxes.shape[0]):
            k = keep[i].astype(bool)
            annots.append(
                {
                    "bbox_list": boxes[i][k].tolist(),
                    "lbl_list": [cls_list[j] for j in label[i][k]],
                    "conf_score_list": conf[i][k].tolist(),
                    "cls_spec_conf_score_list": label_score[i][k].tolist(),
                }
            )
        return annots


def load_engine(path_or_bytes) -> ServingEngine:
    """Load an artifact from a path or raw bytes."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    manifest, blob = _split(data)
    from jax import export as jax_export

    return ServingEngine(manifest, jax_export.deserialize(blob))
