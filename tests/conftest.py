"""Test config: force the CPU backend with 8 virtual devices.

The ambient environment pins ``JAX_PLATFORMS`` to a tunneled TPU backend and
``sitecustomize`` imports jax at interpreter start, so plain env-var edits
here are too late — we must go through ``jax.config`` before any backend
initializes.  8 virtual CPU devices are the standard JAX substitute for
multi-chip hardware (SURVEY.md §4): sharded train/eval steps compile and run
in CI without TPUs.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import importlib.util
import pathlib

import pytest

assert jax.devices()[0].platform == "cpu"

REFERENCE_UTILS = pathlib.Path("/root/reference/models/utils.py")


@pytest.fixture(scope="session")
def reference_utils():
    """The reference repo's utils module (torch CPU), used ONLY as a test
    oracle for parity checks.  Skips if the reference isn't mounted."""
    if not REFERENCE_UTILS.exists():
        pytest.skip("reference repo not available")
    spec = importlib.util.spec_from_file_location(
        "reference_utils", REFERENCE_UTILS
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REFERENCE_ROOT = pathlib.Path("/root/reference")


def _install_albumentations_stub():
    """Package-shaped albumentations stub so the reference model modules
    import (they build TRANSFORM/RESIZE pipelines at module scope).

    Augmentation transforms are identity (parity tests control the pixels),
    but ``Resize`` is REAL: it resizes the image with the cv2-INTER_LINEAR
    fixed-point scheme (``tests/cv2_resize_oracle.py``, bitwise-equal to the
    native ``loader.cc`` resize) and linearly rescales pascal_voc bboxes,
    matching real albumentations ``Resize`` semantics.  This lets the
    reference's detect/train resize path (``models/yolov1.py:456-461,
    536-543``) run for real on odd-sized inputs — for pre-sized inputs it
    degenerates to the old identity behavior."""
    import types

    if "albumentations" in sys.modules:
        return

    stub = types.ModuleType("albumentations")
    stub.__path__ = []  # mark as package for "import albumentations.pytorch"
    stub.__odc_stub__ = True  # tests must not mistake this for the real lib

    class _Identity:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *, image=None, bboxes=None, labels=None, **k):
            return {"image": image, "bboxes": bboxes, "labels": labels}

    class _Resize(_Identity):
        def __init__(self, height, width, *a, **k):
            self.h, self.w = int(height), int(width)

        def __call__(self, *, image=None, bboxes=None, labels=None, **k):
            from cv2_resize_oracle import resize_inter_linear

            sh, sw = image.shape[:2]
            out = resize_inter_linear(image, self.h, self.w)
            if bboxes:
                fx, fy = self.w / sw, self.h / sh
                bboxes = [
                    (b[0] * fx, b[1] * fy, b[2] * fx, b[3] * fy, *b[4:])
                    for b in bboxes
                ]
            return {"image": out, "bboxes": bboxes, "labels": labels}

    class _Compose(_Identity):
        def __init__(self, transforms, *a, **k):
            self.transforms = transforms

        def __call__(self, *, image=None, bboxes=None, labels=None, **k):
            res = {"image": image, "bboxes": bboxes, "labels": labels}
            for t in self.transforms:
                res = t(**res)
            return res

    for name in (
        "RandomScale", "Affine", "OneOf", "HorizontalFlip",
        "VerticalFlip", "ChannelShuffle", "HueSaturationValue",
        "BboxParams",
    ):
        setattr(stub, name, _Identity)
    stub.Resize = _Resize
    stub.Compose = _Compose

    sys.modules["albumentations"] = stub
    sys.modules["albumentations.pytorch"] = types.ModuleType(
        "albumentations.pytorch"
    )


@pytest.fixture(scope="session")
def reference_models():
    """The reference repo's yolov1/yolov2 modules (torch CPU), imported with
    an identity-albumentations stub — used ONLY as parity-test oracles.

    Returns a dict with the two modules; model objects must be
    ``__new__``-constructed by the tests (``__init__`` downloads weights)."""
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference repo not available")
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch not available")

    _install_albumentations_stub()
    ref = str(REFERENCE_ROOT)
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import importlib

    yolov1 = importlib.import_module("models.yolov1")
    yolov2 = importlib.import_module("models.yolov2")
    return {"yolov1": yolov1, "yolov2": yolov2}
