import os

import numpy as np
import pytest

from odc_tpu.data.voc import VOC, make_synthetic_voc, parse_annotation, CLASS_LIST
from odc_tpu.data.pipeline import DetectionPipeline


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc")
    return make_synthetic_voc(str(root), num_train=10, num_val=4, seed=3)


def test_index_and_cache(voc_root):
    voc = VOC(dataset_dir=voc_root)
    assert len(voc.train_dataset) == 10
    assert len(voc.val_dataset) == 4
    assert os.path.exists(os.path.join(voc_root, "voc_dataset.pkl"))
    # Cache hit path.
    voc2 = VOC(dataset_dir=voc_root)
    assert voc2.train_img_path_list == voc.train_img_path_list
    assert voc.cls2idx["aeroplane"] == 0 and len(voc.cls_list) == 20


def test_dataset_sample_contract(voc_root):
    voc = VOC(dataset_dir=voc_root)
    idx, img, annot = voc.train_dataset[0]
    assert idx == 0
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3
    assert set(annot) == {"bbox_list", "lbl_list"}
    assert len(annot["bbox_list"]) == len(annot["lbl_list"]) >= 1
    for bb in annot["bbox_list"]:
        x1, y1, x2, y2 = bb
        assert 0 <= x1 < x2 <= img.shape[1]
        assert 0 <= y1 < y2 <= img.shape[0]
    assert all(l in CLASS_LIST for l in annot["lbl_list"])


def test_parse_annotation_truncates_floats(tmp_path):
    p = tmp_path / "a.xml"
    p.write_text(
        "<annotation><object><name>dog</name><bndbox>"
        "<xmin>10.7</xmin><ymin>3.2</ymin><xmax>99.9</xmax><ymax>80.1</ymax>"
        "</bndbox></object></annotation>"
    )
    annot = parse_annotation(str(p))
    assert annot["bbox_list"] == [[10, 3, 99, 80]]  # int(float(...)) rule


def test_pipeline_static_shapes(voc_root):
    voc = VOC(dataset_dir=voc_root)
    pipe = DetectionPipeline(
        voc.train_dataset, image_hw=(128, 128), batch_size=4, max_boxes=8,
        mode="v2", seed=0,
    )
    batches = list(pipe)
    assert len(batches) == len(pipe) == 2
    for b in batches:
        assert b.image.shape == (4, 128, 128, 3)
        assert b.image.dtype == np.uint8
        assert b.valid.shape == (4, 8)
        assert b.box.shape == (4, 8, 4)
        # Valid boxes land inside the image and grid.
        vb = b.box[b.valid]
        assert np.all(vb[:, 2] <= 128) and np.all(vb[:, 0] >= 0)
        vc = b.cell[b.valid]
        assert np.all((vc >= 0) & (vc < 4))


def test_pipeline_resize_scales_boxes(voc_root):
    voc = VOC(dataset_dir=voc_root)
    idx, img, annot = voc.train_dataset[1]
    h, w = img.shape[:2]
    pipe = DetectionPipeline(
        voc.train_dataset, image_hw=(2 * h, 2 * w), batch_size=1,
        max_boxes=8, shuffle=False, prefetch=0,
    )
    batch = next(iter(pipe._make_batch([1]) for _ in [0]))
    got = batch.box[0][batch.valid[0]]
    expect = np.asarray(annot["bbox_list"], np.float64) * 2.0
    np.testing.assert_allclose(got, expect[: len(got)], rtol=1e-6)


def test_pipeline_multiscale_retarget(voc_root):
    voc = VOC(dataset_dir=voc_root)
    pipe = DetectionPipeline(
        voc.train_dataset, image_hw=(96, 96), batch_size=2, max_boxes=8,
    )
    b1 = next(iter(pipe))
    pipe.set_image_size((160, 160))
    b2 = next(iter(pipe))
    assert b1.image.shape[1:3] == (96, 96)
    assert b2.image.shape[1:3] == (160, 160)


def test_host_augment_pipeline(voc_root):
    from odc_tpu.data.host_augment import reference_augment

    voc = VOC(dataset_dir=voc_root)
    pipe = DetectionPipeline(
        voc.train_dataset, image_hw=(96, 96), batch_size=4, max_boxes=8,
        augment=reference_augment, seed=5, prefetch=0,
    )
    b = next(iter(pipe))
    assert b.image.shape == (4, 96, 96, 3)
    vb = b.box[b.valid]
    if len(vb):
        assert np.all(vb[:, 0::2] >= 0) and np.all(vb[:, 0::2] <= 96)
        assert np.all(vb[:, 2] > vb[:, 0]) and np.all(vb[:, 3] > vb[:, 1])


def test_host_augment_deterministic():
    from odc_tpu.data.host_augment import reference_augment

    rng1 = np.random.default_rng(9)
    rng2 = np.random.default_rng(9)
    img = np.random.default_rng(0).integers(0, 255, (48, 64, 3), dtype=np.uint8)
    boxes = np.array([[5, 5, 30, 40]], np.float64)
    labels = np.array([3])
    a = reference_augment(img, boxes, labels, rng1)
    b = reference_augment(img, boxes, labels, rng2)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_allclose(a[1], b[1])


def test_val_tail_batch_padded_not_dropped(tmp_path):
    """drop_remainder=False pads the tail to the static batch size with
    img_id == -1 rows instead of dropping images (reference validates over
    every image, train.py:68-71)."""
    import numpy as np

    from odc_tpu.data.pipeline import DetectionPipeline
    from odc_tpu.data.voc import VOC, make_synthetic_voc

    make_synthetic_voc(str(tmp_path), num_train=4, num_val=7)
    ds = VOC(dataset_dir=str(tmp_path)).val_dataset

    pipe = DetectionPipeline(
        ds, image_hw=(64, 64), batch_size=4, mode="v2",
        shuffle=False, drop_remainder=False, prefetch=0,
    )
    batches = list(pipe)
    assert len(batches) == len(pipe) == 2
    real = np.concatenate([np.asarray(b.img_id) for b in batches])
    assert (real >= 0).sum() == 7  # every val image present exactly once
    tail = batches[-1]
    assert tail.image.shape[0] == 4  # static shape kept
    assert not tail.valid[np.asarray(tail.img_id) < 0].any()
    assert not tail.image[np.asarray(tail.img_id) < 0].any()


def test_batch_decode_fast_path_matches_per_sample(tmp_path, monkeypatch):
    """The C++ thread-pool batch decode path must produce bitwise-identical
    batches to the per-sample path (same resize convention, same box
    rescale math)."""
    import numpy as np
    import pytest

    from odc_tpu.data.pipeline import DetectionPipeline
    from odc_tpu.data.voc import VOC, make_synthetic_voc
    from odc_tpu.native import loader

    if not loader.batch_available():
        pytest.skip("native loader not built")

    make_synthetic_voc(str(tmp_path), num_train=6, num_val=2)
    ds = VOC(dataset_dir=str(tmp_path)).train_dataset

    def batches(force_slow):
        if force_slow:
            monkeypatch.setattr(loader, "batch_available", lambda: False)
        else:
            monkeypatch.undo()
        pipe = DetectionPipeline(
            ds, image_hw=(96, 128), batch_size=3, mode="v2",
            shuffle=False, prefetch=0,
        )
        return list(pipe)

    fast = batches(False)
    slow = batches(True)
    assert len(fast) == len(slow) == 2
    for bf, bs in zip(fast, slow):
        for name, a, b in zip(bf._fields, bf, bs):
            assert np.array_equal(np.asarray(a), np.asarray(b)), name


def test_threaded_prefetch_consumer_abort_releases_worker():
    """If the consumer stops early, the producer thread must exit instead
    of blocking forever on a full queue (review finding r2)."""
    import threading
    import time

    from odc_tpu.data.prefetch import threaded_prefetch

    produced = []

    def items():
        for i in range(100):
            produced.append(i)
            yield i

    before = threading.active_count()
    gen = threaded_prefetch(items, maxsize=1)
    assert next(gen) == 0
    gen.close()  # consumer walks away
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
    assert len(produced) < 100  # producer stopped early, not drained


def test_threaded_prefetch_propagates_worker_error():
    import pytest

    from odc_tpu.data.prefetch import threaded_prefetch

    def items():
        yield 1
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(threaded_prefetch(items, maxsize=2))


def test_threaded_prefetch_warns_on_suppressed_worker_error():
    """A worker error racing a consumer close must not vanish silently
    (advisor finding r2): it is surfaced as a RuntimeWarning."""
    import warnings

    from odc_tpu.data.prefetch import threaded_prefetch

    def items():
        yield 1
        raise RuntimeError("lost boom")

    gen = threaded_prefetch(items, maxsize=2)
    assert next(gen) == 1
    import time

    time.sleep(0.3)  # let the worker hit its error before the close
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        gen.close()
    assert any("lost boom" in str(w.message) for w in caught)


def test_undecodable_file_falls_back_per_sample(tmp_path):
    """A non-JPEG file hiding behind a .jpg name must not abort the epoch:
    the batch fast path retries the failed index through PIL (advisor
    finding r2)."""
    from PIL import Image

    from odc_tpu.data.pipeline import DetectionPipeline
    from odc_tpu.data.voc import VOC, make_synthetic_voc

    make_synthetic_voc(str(tmp_path), num_train=4, num_val=2)
    voc = VOC(dataset_dir=str(tmp_path))
    ds = voc.train_dataset
    # Overwrite one image with a PNG payload (same .jpg path).
    rogue = np.random.default_rng(0).integers(
        0, 255, (40, 60, 3), dtype=np.uint8
    )
    Image.fromarray(rogue).save(ds.img_path_list[2], format="PNG")

    pipe = DetectionPipeline(
        ds, image_hw=(64, 64), batch_size=4, mode="v2",
        shuffle=False, prefetch=0,
    )
    (batch,) = list(pipe)
    assert batch.image.shape == (4, 64, 64, 3)
    assert batch.image[2].any()  # rogue image decoded, not zero-filled
    assert (np.asarray(batch.img_id) == np.arange(4)).all()


def test_raw_paths_fast_path_respects_getitem_override(tmp_path):
    """A dataset subclass that overrides item loading must NOT be bypassed
    by the raw-path batch decoder (advisor finding r2)."""
    from odc_tpu.data.pipeline import DetectionPipeline
    from odc_tpu.data.voc import (
        VOC, VOCDataset, dataset_supports_raw_paths, make_synthetic_voc,
    )

    make_synthetic_voc(str(tmp_path), num_train=3, num_val=2)
    base = VOC(dataset_dir=str(tmp_path)).train_dataset

    class ConstantDataset(VOCDataset):
        def __getitem__(self, index):
            idx, img, annot = super().__getitem__(index)
            return idx, np.full_like(img, 7), annot

    assert dataset_supports_raw_paths(base)
    ds = ConstantDataset(base.img_path_list, base.annot_list)
    assert not dataset_supports_raw_paths(ds)

    pipe = DetectionPipeline(
        ds, image_hw=(32, 32), batch_size=3, mode="v2",
        shuffle=False, prefetch=0,
    )
    (batch,) = list(pipe)
    assert (batch.image == 7).all()  # override honored, fast path skipped

    class OptedBackIn(ConstantDataset):
        supports_raw_paths = True  # explicit re-declaration re-enables

    assert dataset_supports_raw_paths(
        OptedBackIn(base.img_path_list, base.annot_list)
    )
