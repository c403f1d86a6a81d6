"""Micro-batching serving front-end + HTTP door (odc_tpu/serve/server.py,
httpd.py): request coalescing, op-point batch splits with FIFO order,
symbolic-batch bucket padding, lifecycle validation, and the HTTP
predict/manifest/stats surface over a real loaded engine."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from odc_tpu.models import YOLOv2
from odc_tpu.serve import export_engine, load_engine
from odc_tpu.serve.server import BatchingServer

HW = (64, 64)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    model = YOLOv2(dtype=jnp.float32)
    imgs = rng.integers(0, 255, (4,) + HW + (3,), dtype=np.uint8)
    variables = model.init(jax.random.key(0), jnp.asarray(imgs))
    fixed = load_engine(export_engine(
        model, variables, batch_size=4, image_hw=HW,
        conf_thre=0.0, max_keep=8,
    ))
    return fixed, imgs


def test_coalesces_full_batch_and_matches_direct(setup):
    eng, imgs = setup
    direct = eng.predict(imgs, conf_thre=0.0)
    with BatchingServer(eng, max_delay_ms=2000) as srv:
        futs = [srv.submit(img, conf_thre=0.0) for img in imgs]
        results = [f.result(timeout=300) for f in futs]
    # all four rode ONE device batch
    assert srv.stats["batch_sizes"] == [4]
    assert srv.stats["images"] == 4
    for i, outs in enumerate(results):
        for got, ref in zip(outs, direct):
            np.testing.assert_allclose(got, ref[i], rtol=1e-5, atol=1e-5)


def test_partial_batch_flushes_on_delay(setup):
    eng, imgs = setup
    with BatchingServer(eng, max_delay_ms=20) as srv:
        out = srv.predict_one(imgs[0], conf_thre=0.0)
    assert srv.stats["batch_sizes"] == [1]
    ref = eng.predict(imgs[:1], conf_thre=0.0)
    for got, r in zip(out, ref):
        np.testing.assert_allclose(got, r[0], rtol=1e-5, atol=1e-5)


def test_op_point_change_splits_batch_fifo(setup):
    """Thresholds are per-batch scalars in the compiled program: a request
    with different (conf, iou) must flush the batch ahead of it, not share
    it or jump the queue."""
    eng, imgs = setup
    with BatchingServer(eng, max_delay_ms=2000) as srv:
        f_lo = srv.submit(imgs[0], conf_thre=0.0)
        f_hi = srv.submit(imgs[0], conf_thre=0.9)
        lo = f_lo.result(timeout=300)
        hi = f_hi.result(timeout=300)
    assert srv.stats["batch_sizes"] == [1, 1]
    np.testing.assert_allclose(
        lo[0], eng.predict(imgs[:1], conf_thre=0.0)[0][0],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        hi[0], eng.predict(imgs[:1], conf_thre=0.9)[0][0],
        rtol=1e-5, atol=1e-5,
    )
    # conf=0.9 keeps strictly fewer boxes than conf=0.0 on random init
    assert hi[-1].sum() <= lo[-1].sum()


def test_annot_surface_and_validation(setup):
    eng, imgs = setup
    with BatchingServer(eng, max_delay_ms=20) as srv:
        annot = srv.predict_annot(imgs[0], conf_thre=0.0)
        assert set(annot) == {"bbox_list", "lbl_list", "conf_score_list",
                              "cls_spec_conf_score_list"}
        assert len(annot["bbox_list"]) == len(annot["lbl_list"]) > 0
        with pytest.raises(ValueError):
            srv.submit(np.zeros((32, 32, 3), np.uint8))  # wrong size
        with pytest.raises(ValueError):
            srv.submit(imgs)  # a batch, not one image
    with pytest.raises(RuntimeError):
        srv.submit(imgs[0])  # stopped server rejects


def test_symbolic_engine_requires_max_batch_and_buckets_pad(setup):
    _, imgs = setup
    model = YOLOv2(dtype=jnp.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(imgs))
    sym = load_engine(export_engine(
        model, variables, batch_size=None, image_hw=HW,
        conf_thre=0.0, max_keep=8,
    ))
    with pytest.raises(ValueError):
        BatchingServer(sym)  # unbounded compile ladder
    with BatchingServer(sym, max_batch=4, max_delay_ms=2000) as srv:
        assert srv._buckets == (1, 2, 4)
        futs = [srv.submit(img, conf_thre=0.0) for img in imgs[:3]]
        results = [f.result(timeout=300) for f in futs]
    # 3 requests pad up to the 4-bucket on device, stats count real images
    assert srv.stats["batch_sizes"] == [3]
    direct = sym.predict(imgs[:3], conf_thre=0.0)
    for i, outs in enumerate(results):
        for got, ref in zip(outs, direct):
            np.testing.assert_allclose(got, ref[i], rtol=1e-5, atol=1e-5)


def test_http_server_end_to_end(setup):
    from odc_tpu.serve.httpd import start_http_server

    eng, imgs = setup
    httpd, batcher = start_http_server(eng, port=0, max_delay_ms=20)
    try:
        base = f"http://127.0.0.1:{httpd.server_port}"

        with urllib.request.urlopen(f"{base}/manifest") as r:
            manifest = json.loads(r.read())
        assert manifest == eng.manifest

        buf = io.BytesIO()
        np.save(buf, imgs[:2])
        req = urllib.request.Request(
            f"{base}/predict?conf=0.0", data=buf.getvalue(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            annots = json.loads(r.read())
        assert annots == eng.predict_annots(imgs[:2], conf_thre=0.0)

        with urllib.request.urlopen(f"{base}/stats") as r:
            stats = json.loads(r.read())
        assert stats["images"] == 2

        # contract errors surface as HTTP codes, not hangs
        bad = urllib.request.Request(
            f"{base}/predict", data=b"not npy", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{base}/nope")
        assert ei.value.code == 404
        # malformed query params get a 400 JSON error, not a dropped
        # connection (ADVICE r4)
        bad_q = urllib.request.Request(
            f"{base}/predict?conf=abc", data=buf.getvalue(), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad_q)
        assert ei.value.code == 400
        assert "bad query param" in json.loads(ei.value.read())["error"]
    finally:
        httpd.shutdown()
        batcher.stop()


def test_concurrent_http_clients_share_device_batches(setup):
    """The point of the server: independent single-image HTTP clients get
    coalesced into shared device batches."""
    from odc_tpu.serve.httpd import start_http_server

    eng, imgs = setup
    httpd, batcher = start_http_server(eng, port=0, max_delay_ms=1000)
    try:
        base = f"http://127.0.0.1:{httpd.server_port}"
        results = [None] * 4
        errors = []

        def client(i):
            try:
                buf = io.BytesIO()
                np.save(buf, imgs[i])
                req = urllib.request.Request(
                    f"{base}/predict?conf=0.0", data=buf.getvalue(),
                    method="POST",
                )
                with urllib.request.urlopen(req, timeout=300) as r:
                    results[i] = json.loads(r.read())
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors
        # Coalescing happened: fewer device batches than clients.
        assert batcher.stats["images"] == 4
        assert len(batcher.stats["batch_sizes"]) < 4
        ref = eng.predict_annots(imgs, conf_thre=0.0)
        for i in range(4):
            assert results[i] == [ref[i]]
    finally:
        httpd.shutdown()
        batcher.stop()
