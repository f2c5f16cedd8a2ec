"""Serving under concurrent load (VERDICT r4 Next #8): N client threads
hammer the dynamic-batching server (cli/serve.py) fronting the flagship
int8 StableHLO artifact on the real chip; reports throughput, batch
occupancy, and client-side p50/p90/p99.

The reference has no serving surface at all (its only inference is the
offline dataset walk, test.py:113-175) — this benchmark sets the rebuild's
own bar. On this environment every dispatch crosses the axon tunnel
(~0.3-1 s per round trip, PERFORMANCE.md "Input-inclusive throughput"), so
the absolute latencies measure the tunnel; the DESIGN numbers are batch
occupancy (does the batcher actually coalesce under load?) and
throughput-vs-dispatch-cost (does adding clients amortize dispatches?).
A directly-attached host pays ~2 ms PCIe where this host pays ~0.5 s.

Usage: python scripts/bench_serve.py [--clients 8] [--requests 24]
           [--quantize int8] [--image_size 224] [--out serve_report.json]
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_clip_bytes(cfg, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    T, S = cfg.data.num_frames, cfg.data.image_size
    buf = io.BytesIO()
    np.savez(
        buf,
        src_video=rng.integers(0, 256, (T, S, S, 3), np.uint8),
        src_sketch=rng.integers(0, 256, (S, S, 3), np.uint8),
    )
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=24,
                    help="requests per client")
    ap.add_argument("--quantize", default="int8", choices=["int8", "none"])
    ap.add_argument("--batch_timeout_ms", type=float, default=25.0)
    ap.add_argument("--image_size", type=int, default=224)
    ap.add_argument("--export_bs", type=int, default=8)
    ap.add_argument("--out", default="serve_report.json")
    args = ap.parse_args()

    from svol_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax

    from svol_tpu.serving import export_model
    from svol_tpu.cli.serve import start_server
    from svol_tpu.config import SvolConfig
    from svol_tpu.models import build_model
    from svol_tpu.train.state import create_train_state, init_sample_batch

    cfg = SvolConfig()
    cfg.data.image_size = args.image_size
    cfg.model.quantize = None if args.quantize == "none" else args.quantize
    model = build_model(cfg)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               init_sample_batch(cfg))

    tmp = tempfile.mkdtemp(prefix="svol_serve_bench_")
    print(f"[bench_serve] exporting artifact (bs={args.export_bs}, "
          f"quantize={cfg.model.quantize})", flush=True)
    export_dir = export_model(cfg, state, os.path.join(tmp, "export"),
                              batch_size=args.export_bs,
                              pixel_dtype="uint8")

    server, batcher, stats, port = start_server(
        export_dir, port=0, batch_timeout_ms=args.batch_timeout_ms)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/predict"
    print(f"[bench_serve] server up on :{port}", flush=True)

    # pre-serialized clips (1-core host: client threads must stay light)
    clips = [make_clip_bytes(cfg, seed=i) for i in range(4)]
    latencies: list[float] = []
    errors: list[str] = []
    lock = threading.Lock()
    start_evt = threading.Event()

    def client(cid: int) -> None:
        start_evt.wait()
        for i in range(args.requests):
            body = clips[(cid + i) % len(clips)]
            t0 = time.perf_counter()
            try:
                req = urllib.request.Request(
                    url, data=body,
                    headers={"Content-Type": "application/octet-stream"})
                with urllib.request.urlopen(req, timeout=300) as r:
                    json.loads(r.read())
                dt = (time.perf_counter() - t0) * 1e3
                with lock:
                    latencies.append(dt)
            except Exception as e:  # noqa: BLE001 — report, don't die
                with lock:
                    errors.append(repr(e))

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    for t in threads:
        t.start()
    t0 = time.perf_counter()
    start_evt.set()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=60) as r:
        server_metrics = json.loads(r.read())

    server.shutdown()
    server.server_close()
    batcher.stop()

    lat = np.asarray(sorted(latencies))
    n_ok = len(lat)
    report = {
        "clients": args.clients,
        "requests_per_client": args.requests,
        "quantize": args.quantize,
        "export_bs": args.export_bs,
        "batch_timeout_ms": args.batch_timeout_ms,
        "ok": n_ok,
        "errors": len(errors),
        "wall_s": round(wall, 2),
        "requests_per_s": round(n_ok / wall, 2),
        "frames_per_s": round(n_ok * cfg.data.num_frames / wall, 1),
        "client_latency_ms": {
            "p50": round(float(np.percentile(lat, 50)), 1) if n_ok else None,
            "p90": round(float(np.percentile(lat, 90)), 1) if n_ok else None,
            "p99": round(float(np.percentile(lat, 99)), 1) if n_ok else None,
            "min": round(float(lat[0]), 1) if n_ok else None,
        },
        "server_metrics": server_metrics,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    if errors:
        print(f"[bench_serve] {len(errors)} errors, first: {errors[0]}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
