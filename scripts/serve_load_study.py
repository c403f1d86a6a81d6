"""Serving host under load (round-4 verdict next #9).

Drives :class:`odc_tpu.serve.server.BatchingServer` with concurrent
synthetic clients and reports achieved img/s, p50/p99 request latency and
the coalesced batch-size histogram at several ``max_delay_ms`` settings.

Two engine backends, because of an environment fact (PROFILE.md "Streaming
batched eval"): the dev relay moves host->device bytes at ~7 MB/s, so any
host-fed path here measures the TUNNEL, not the chip (one 416² image is
0.5 MB = ~74 ms of relay time; production PCIe does it in ~0.05 ms).

* ``sim``: a calibrated-sleep engine — ``predict`` sleeps the REAL
  measured device step time for the padded batch size (the bs->ms curve
  passed via --curve, defaults to the round-4 real-chip int8 engine
  measurements).  This isolates what the serving host itself adds
  (queueing, coalescing, futures, padding) on top of the chip's ceiling —
  the number that is NOT already in bench.py.
* ``real``: the full stack (export_engine -> load_engine -> BatchingServer)
  on the live backend — functional under load, with the relay caveat.

Usage:
    python scripts/serve_load_study.py sim  [clients] [requests_per_client]
    python scripts/serve_load_study.py real [clients] [requests_per_client]
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

MODE = sys.argv[1] if len(sys.argv) > 1 else "sim"
CLIENTS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
PER_CLIENT = int(sys.argv[3]) if len(sys.argv) > 3 else 64

# Real-chip YOLOv2-416 int8 engine step times (ms) by batch size
# (PROFILE.md round 4: 46.6 ms @256, 178.5 @1024; small sizes measured
# round 2 curve shape).  Interpolated log-linearly between anchors.
DEFAULT_CURVE = {1: 7.0, 2: 7.4, 4: 8.2, 8: 9.8, 16: 13.0, 32: 19.5,
                 64: 30.0, 128: 36.0, 256: 46.6}


class SimEngine:
    """Manifest-compatible stand-in whose predict() costs the measured
    device time for the (padded) batch — the serving host's overhead is
    everything the study measures above this floor."""

    def __init__(self, image_hw=(416, 416), batch_size=None, curve=None):
        self.manifest = {
            "image_hw": list(image_hw),
            "batch_size": batch_size,
            "cls_list": ["obj"],
            "compact": True,
            "conf_thre_default": 0.9,
            "iou_thre_default": 0.5,
        }
        self.curve = dict(curve or DEFAULT_CURVE)
        self._keys = sorted(self.curve)

    @property
    def batch_size(self):
        return self.manifest["batch_size"]

    def _ms(self, n):
        ks = self._keys
        if n <= ks[0]:
            return self.curve[ks[0]]
        if n >= ks[-1]:
            return self.curve[ks[-1]] * n / ks[-1]
        for lo, hi in zip(ks, ks[1:]):
            if lo <= n <= hi:
                f = (np.log(n) - np.log(lo)) / (np.log(hi) - np.log(lo))
                return self.curve[lo] * (1 - f) + self.curve[hi] * f
        raise AssertionError

    def predict(self, images, conf=None, iou=None):
        n = images.shape[0]
        time.sleep(self._ms(n) / 1e3)
        k = 8
        boxes = np.zeros((n, k, 4), np.float32)
        scores = np.zeros((n, k), np.float32)
        labels = np.zeros((n, k), np.int32)
        keep = np.zeros((n, k), bool)
        return boxes, scores, labels, scores, keep


def drive(server, image, clients, per_client):
    """Closed-loop load: each client thread submits, waits, repeats."""
    lat = []
    lock = threading.Lock()

    def client(seed):
        rng = np.random.default_rng(seed)
        my = []
        for _ in range(per_client):
            t0 = time.perf_counter()
            server.predict_one(image)
            my.append(time.perf_counter() - t0)
            # tiny think time spread so arrivals aren't lockstep
            time.sleep(float(rng.uniform(0, 0.002)))
        with lock:
            lat.extend(my)

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    lat_ms = np.asarray(lat) * 1e3
    sizes = np.asarray(server.stats["batch_sizes"])
    return {
        "img_per_s": round(len(lat) / wall, 1),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 2),
        "mean_batch": round(float(sizes.mean()), 1) if len(sizes) else 0,
        "batches": int(server.stats["batches"]),
    }


def run_sim():
    from odc_tpu.serve.server import BatchingServer

    image = np.zeros((416, 416, 3), np.uint8)
    rows = []
    for compiled, tag in ((256, "fixed-256"), (None, "symbolic")):
        for delay in (1.0, 5.0, 20.0):
            eng = SimEngine(batch_size=compiled)
            kw = {"max_delay_ms": delay}
            if compiled is None:
                kw["max_batch"] = 256
            with BatchingServer(eng, **kw) as srv:
                r = drive(srv, image, CLIENTS, PER_CLIENT)
            r.update(engine=tag, max_delay_ms=delay, clients=CLIENTS)
            rows.append(r)
            print(json.dumps(r), flush=True)
    # ceiling for context: the raw curve at the mean coalesced batch
    eng = SimEngine()
    for r in rows:
        if r["mean_batch"]:
            r["device_floor_img_per_s"] = round(
                r["mean_batch"] / eng._ms(max(int(r["mean_batch"]), 1)) * 1e3,
                1,
            )
    print("\n| engine | delay ms | img/s | p50 ms | p99 ms | mean bs | "
          "device floor img/s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['engine']} | {r['max_delay_ms']} | {r['img_per_s']} "
              f"| {r['p50_ms']} | {r['p99_ms']} | {r['mean_batch']} "
              f"| {r.get('device_floor_img_per_s', '-')} |")


def run_real():
    import jax

    if os.environ.get("PLATFORM") == "cpu":
        # The dev relay 413s baked-weight artifacts (CLAUDE.md); CPU runs
        # the identical serve stack, as tests/test_serve.py does.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from odc_tpu.models import YOLOv2
    from odc_tpu.serve.engine import export_engine, load_engine
    from odc_tpu.serve.server import BatchingServer

    size = int(os.environ.get("SIZE", 128))  # small: relay H2D is ~7 MB/s
    model = YOLOv2(dtype=jnp.bfloat16, image_size=(size, size))
    variables = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, size, size, 3), jnp.uint8)
    )
    data = export_engine(
        model, variables, batch_size=32, image_hw=(size, size), compact=True
    )
    eng = load_engine(data)
    image = np.zeros((size, size, 3), np.uint8)
    print(f"real engine: YOLOv2-{size} bs=32 on {jax.devices()[0]}")
    rows = []
    for delay in (1.0, 5.0, 20.0):
        with BatchingServer(eng, max_delay_ms=delay) as srv:
            srv.predict_one(image)  # warm the compiled path
            r = drive(srv, image, CLIENTS, PER_CLIENT)
        r.update(max_delay_ms=delay, clients=CLIENTS)
        rows.append(r)
        print(json.dumps(r), flush=True)
    print("\nCAVEAT: host->device here rides the dev relay (~7 MB/s); "
          "these latencies measure the tunnel + host, not the chip "
          "(PROFILE.md 'Streaming batched eval').")


if __name__ == "__main__":
    if MODE == "sim":
        run_sim()
    elif MODE == "real":
        run_real()
    else:
        raise SystemExit("mode must be 'sim' or 'real'")
