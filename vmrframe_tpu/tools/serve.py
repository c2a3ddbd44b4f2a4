"""Batched moment-retrieval serving — the online-inference path.

The reference has no serving story (its main.py --eval is an offline metrics
pass); this tool packages the jitted eval step as a production-style service:

- ONE compiled eval step at a fixed batch shape (recompilation-free; the
  first request pays the compile, everything after runs at on-chip speed);
- micro-batching: concurrent requests are queued and dispatched together
  when ``batch_size`` accumulate or ``flush_ms`` elapse, whichever first —
  the standard accelerator-serving latency/throughput trade;
- host work (tokenize → vocab ids → feature fetch → static-shape batch
  assembly) runs in the dispatcher thread while the device executes the
  previous micro-batch, so H2D/compute overlap batch-to-batch;
- localhost HTTP JSON API (stdlib ThreadingHTTPServer — no extra deps):
  POST /predict  {"vid": ..., "sentence": ...}            -> {"pred_time": [s, e], ...}
  POST /predict  [{...}, {...}]                            -> [{...}, {...}]
  GET  /healthz                                            -> {"ok": true}
- multi-model routing (``ModelRouter``): several named models behind one
  port, each with its own compiled step + micro-batch queue; route via
  POST /predict/<name>, a "model" body field, or the default; GET /models
  lists routes.  CLI: repeatable ``--model NAME=CONFIG[:CKPT]``.
- observability + ops: GET /metrics[/name] (request counters + rolling
  latency percentiles per model); POST /reload {"model": ..., "checkpoint":
  ...} hot-swaps weights atomically with zero recompiles (in-flight
  micro-batches finish on the old weights).

``--selftest`` boots the service on synthetic data, fires concurrent
requests through real HTTP, and prints latency percentiles + throughput.

Usage:
  python -m vmrframe_tpu.tools.serve --config <yaml> [--checkpoint <dir>]
      [--port 8901] [--batch-size N] [--flush-ms 5] [--synthetic]
  python -m vmrframe_tpu.tools.serve --config tests/configs/charades_seqpan.yaml --selftest
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from typing import Dict, List, Optional

import numpy as np


class MomentRetrievalService:
    """Owns the model state + compiled eval step; turns (vid, sentence)
    requests into predicted [start, end] seconds via micro-batched device
    execution."""

    def __init__(self, cfg, derived, word_dict, char_dict, word_vector,
                 feature_store, checkpoint: Optional[str] = None,
                 batch_size: Optional[int] = None, flush_ms: float = 5.0):
        from vmrframe_tpu.train.trainer import Trainer

        self.cfg = cfg
        self.derived = derived
        self.word_dict = word_dict
        self.char_dict = char_dict
        self.store = feature_store
        self.batch_size = int(batch_size or cfg.train.batch_size)
        self.flush_ms = float(flush_ms)
        self.trainer = Trainer(cfg, derived, word_vector)

        import jax

        warm_vid = next(iter(feature_store.lengths()))
        warm = self._assemble([self._make_record(warm_vid, "warm up", 1.0)])
        self.state = self.trainer.init_state(jax.random.PRNGKey(0), warm)
        if checkpoint:
            from vmrframe_tpu.train.checkpoints import restore_into_state

            self.state = restore_into_state(checkpoint, self.state)
        self._eval_step = self.trainer.compiled_eval_step()
        # pay the compile before serving traffic
        self._run(warm)

        self._queue: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._stats_lock = threading.Lock()
        self._latencies: List[float] = []  # ring buffer, last 4096
        self._n_ok = 0
        self._n_err = 0
        self._worker = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._worker.start()

    # ---------- request → record → batch ----------

    def _make_record(self, vid: str, sentence: str, duration: float) -> dict:
        from vmrframe_tpu.data.tokenize import word_tokenize

        words = word_tokenize(sentence)[: int(self.cfg.model.tlen)]
        unk = self.word_dict.get("<UNK>", 1)
        cunk = self.char_dict.get("<UNK>", 1)
        return {
            "vid": vid,
            "se_time": [0.0, float(duration)],
            "duration": float(duration),
            "se_frac": [0.0, 1.0],
            "sentence": sentence,
            "words": words,
            "wids": [self.word_dict.get(w, unk) for w in words],
            "cids": [[self.char_dict.get(c, cunk) for c in w] for w in words],
        }

    def _assemble(self, records: List[dict]):
        """Static-shape batch from arbitrary records (test-mode Batcher:
        identity augmentation, sample_mask padding to batch_size)."""
        from vmrframe_tpu.data.batcher import Batcher
        from vmrframe_tpu.registry import get_model_entry

        entry = get_model_entry(self.cfg.model.name)
        batcher_cls = entry.batcher_cls or Batcher
        # the device batch must be shaped to the SERVICE batch size, not the
        # config's train batch size — with --batch-size > train.batch_size the
        # default would silently drop the overflow records and misalign props
        b = batcher_cls(records, self.store, self.cfg, self.derived, "test",
                        batch_size=self.batch_size)
        return next(b.epoch(seed=0, shuffle=False))

    def _run(self, batch) -> np.ndarray:
        metrics = self._eval_step(self.state, self.trainer._shard_batch(batch))
        return np.asarray(metrics["props"])  # (B, 2) predicted fractions

    # ---------- micro-batching ----------

    def _dispatch_loop(self):
        while not self._stop.is_set():
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                continue
            pending = [first]
            deadline = time.perf_counter() + self.flush_ms / 1e3
            while len(pending) < self.batch_size:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    pending.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            try:
                batch = self._assemble([p["record"] for p in pending])
                props = self._run(batch)
                for i, p in enumerate(pending):
                    dur = p["record"]["duration"]
                    p["result"] = {
                        "vid": p["record"]["vid"],
                        "sentence": p["record"]["sentence"],
                        "pred_time": [float(props[i, 0]) * dur, float(props[i, 1]) * dur],
                        "pred_frac": [float(props[i, 0]), float(props[i, 1])],
                    }
                    p["event"].set()
            except Exception as e:  # surface assembly/device errors per request
                for p in pending:
                    p["error"] = f"{type(e).__name__}: {e}"
                    p["event"].set()

    def predict(self, vid: str, sentence: str, duration: Optional[float] = None,
                timeout: float = 60.0) -> Dict:
        """Thread-safe single prediction (micro-batched under the hood)."""
        if vid not in self.store:
            raise KeyError(f"unknown vid: {vid}")
        if duration is None:
            duration = float(self.store.lengths()[str(vid)])
        item = {"record": self._make_record(vid, sentence, duration),
                "event": threading.Event()}
        t0 = time.perf_counter()
        self._queue.put(item)
        if not item["event"].wait(timeout):
            with self._stats_lock:
                self._n_err += 1
            raise TimeoutError("prediction timed out")
        dt = time.perf_counter() - t0
        with self._stats_lock:
            if "error" in item:
                self._n_err += 1
            else:
                self._n_ok += 1
                self._latencies.append(dt)
                if len(self._latencies) > 4096:
                    del self._latencies[:2048]
        if "error" in item:
            raise RuntimeError(item["error"])
        return item["result"]

    def metrics(self) -> Dict:
        """Served-request counters + latency percentiles (rolling window)."""
        with self._stats_lock:
            lat = sorted(self._latencies[-4096:])
            ok, err = self._n_ok, self._n_err
        pct = lambda p: round(lat[min(int(p * len(lat)), len(lat) - 1)] * 1e3, 2) \
            if lat else None
        return {"requests_ok": ok, "requests_error": err,
                "batch_size": self.batch_size, "flush_ms": self.flush_ms,
                "p50_ms": pct(0.50), "p90_ms": pct(0.90), "p99_ms": pct(0.99)}

    def reload_checkpoint(self, checkpoint: str) -> None:
        """Hot-swap weights: restore into a copy of the current state and
        publish atomically — in-flight micro-batches finish on the old
        weights, the next batch runs the new ones.  No recompile (same
        shapes)."""
        from vmrframe_tpu.train.checkpoints import restore_into_state

        self.state = restore_into_state(checkpoint, self.state)

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)


# ---------- multi-model routing ----------


class ModelRouter:
    """Routes requests to one of several named MomentRetrievalServices —
    each owns its own compiled eval step and micro-batch queue, so models
    serve concurrently without recompilation or queue interference.

    Route selection, in precedence order: URL path (``/predict/<name>``),
    then a ``"model"`` field in the request body, then the default (the
    first registered model).
    """

    def __init__(self, services: Dict[str, MomentRetrievalService]):
        if not services:
            raise ValueError("ModelRouter needs at least one service")
        self.services = dict(services)
        self.default = next(iter(services))

    def get(self, name: Optional[str]) -> MomentRetrievalService:
        name = name or self.default
        if name not in self.services:
            raise KeyError(f"unknown model: {name!r} (have: {sorted(self.services)})")
        return self.services[name]

    def predict(self, vid: str, sentence: str, duration: Optional[float] = None,
                model: Optional[str] = None, timeout: float = 60.0) -> Dict:
        out = self.get(model).predict(vid, sentence, duration, timeout)
        out["model"] = model or self.default
        return out

    def close(self):
        for s in self.services.values():
            s.close()


# ---------- HTTP front end ----------


def make_http_server(service, port: int):
    """`service` is a MomentRetrievalService or a ModelRouter."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    router = service if isinstance(service, ModelRouter) \
        else ModelRouter({"default": service})

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload):
            body = json.dumps(payload).encode("utf8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"ok": True, "models": {
                    n: {"batch_size": s.batch_size, "model": str(s.cfg.model.name)}
                    for n, s in router.services.items()}})
            elif self.path == "/models":
                self._send(200, {"models": sorted(router.services),
                                 "default": router.default})
            elif self.path.startswith("/metrics"):
                name = self.path[len("/metrics"):].strip("/") or None
                try:
                    if name:
                        self._send(200, router.get(name).metrics())
                    else:
                        self._send(200, {n: s.metrics()
                                         for n, s in router.services.items()})
                except KeyError as e:
                    self._send(400, {"error": str(e)})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path.startswith("/reload"):
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(length))
                    svc = router.get(req.get("model"))
                    svc.reload_checkpoint(req["checkpoint"])
                    self._send(200, {"ok": True,
                                     "model": req.get("model") or router.default})
                except (KeyError, ValueError, FileNotFoundError) as e:
                    self._send(400, {"error": f"{type(e).__name__}: {e}"})
                except Exception as e:  # corrupt/partial ckpt: OSError, msgpack
                    # decode errors, shape-mismatch TypeError — return JSON 500
                    # instead of dropping the connection
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if not self.path.startswith("/predict"):
                self._send(404, {"error": "not found"})
                return
            path_model = self.path[len("/predict"):].strip("/") or None
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length))
                reqs = req if isinstance(req, list) else [req]
                out = [router.predict(r["vid"], r["sentence"], r.get("duration"),
                                      model=path_model or r.get("model"))
                       for r in reqs]
                self._send(200, out if isinstance(req, list) else out[0])
            except (KeyError, TimeoutError, RuntimeError, ValueError) as e:
                self._send(400, {"error": str(e)})

        def log_message(self, *a):  # quiet
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


# ---------- bootstrapping ----------


def build_service(cfg_path: str, checkpoint: Optional[str], synthetic: bool,
                  batch_size: Optional[int], flush_ms: float,
                  n_synthetic: int = 64, compute_dtype: str = "bfloat16"):
    from vmrframe_tpu.config import Derived, load_config

    cfg = load_config(cfg_path)
    # serving default is bf16 (metric-guarded: tests/test_mixed_precision.py
    # ::test_bf16_eval_close_to_f32); --dtype float32 opts out
    if compute_dtype:
        cfg = cfg.updated({"train.compute_dtype": compute_dtype})
    if synthetic:
        from vmrframe_tpu.testing import make_synthetic_data

        dataset, store = make_synthetic_data(cfg, seed=0, n_train=n_synthetic,
                                             n_test=n_synthetic)
    else:
        from vmrframe_tpu.data.datasets import load_dataset
        from vmrframe_tpu.data.features import open_feature_store

        derived0 = Derived()
        dataset = load_dataset(cfg, derived0)
        store = open_feature_store(cfg.paths.feature_path, cfg.model.vlen, lazy=True)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=1, steps_per_epoch=1)
    return MomentRetrievalService(
        cfg, derived, dataset["word_dict"], dataset["char_dict"],
        dataset["word_vector"], store, checkpoint=checkpoint,
        batch_size=batch_size, flush_ms=flush_ms,
    ), dataset


def selftest(service: MomentRetrievalService, dataset, port: int,
             n_requests: int = 256, concurrency: int = 32) -> dict:
    """Boot the HTTP server, fire concurrent real-HTTP requests, report
    latency percentiles + throughput."""
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    server = make_http_server(service, port)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    records = dataset["test_set"]
    lat: List[float] = []
    lock = threading.Lock()

    def one(i):
        import http.client

        rec = records[i % len(records)]
        body = json.dumps({"vid": rec["vid"], "sentence": rec["sentence"],
                           "duration": rec["duration"]}).encode("utf8")
        t0 = time.perf_counter()
        for attempt in range(3):
            try:
                with urllib.request.urlopen(
                        urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                               data=body,
                                               headers={"Content-Type": "application/json"}),
                        timeout=120) as resp:
                    out = json.loads(resp.read())
                break
            except (ConnectionResetError, http.client.RemoteDisconnected):
                # transient socket drop under concurrency (stdlib
                # ThreadingHTTPServer); retry on a fresh connection
                if attempt == 2:
                    raise
                time.sleep(0.05 * (attempt + 1))
        dt = time.perf_counter() - t0
        assert "pred_time" in out and len(out["pred_time"]) == 2
        with lock:
            lat.append(dt)

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=concurrency) as ex:
        list(ex.map(one, range(n_requests)))
    wall = time.perf_counter() - t0
    server.shutdown()
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    stats = {
        "requests": n_requests,
        "concurrency": concurrency,
        "batch_size": service.batch_size,
        "qps": round(n_requests / wall, 1),
        "p50_ms": round(float(lat_ms[int(0.50 * len(lat_ms))]), 2),
        "p90_ms": round(float(lat_ms[int(0.90 * len(lat_ms))]), 2),
        "p99_ms": round(float(lat_ms[min(int(0.99 * len(lat_ms)), len(lat_ms) - 1)]), 2),
    }
    print(json.dumps(stats))
    return stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--model", action="append", default=None,
                    metavar="NAME=CONFIG[:CKPT]",
                    help="serve several models behind one port (repeatable); "
                         "route via POST /predict/<NAME> or a 'model' body "
                         "field.  Mutually additive with --config (which "
                         "registers as 'default').")
    ap.add_argument("--port", type=int, default=8901)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--flush-ms", type=float, default=5.0)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--selftest", action="store_true")
    ap.add_argument("--dtype", choices=["bfloat16", "float32"],
                    default="bfloat16",
                    help="serving compute dtype (params stay f32; "
                         "default bf16 — the MXU-native eval path)")
    args = ap.parse_args()
    if not args.config and not args.model:
        ap.error("need --config and/or --model")

    synthetic = args.synthetic or args.selftest
    services: Dict[str, MomentRetrievalService] = {}
    dataset = None
    if args.config:
        services["default"], dataset = build_service(
            args.config, args.checkpoint, synthetic, args.batch_size,
            args.flush_ms, compute_dtype=args.dtype)
    for spec in args.model or []:
        name, _, rest = spec.partition("=")
        if not rest:
            ap.error(f"--model needs NAME=CONFIG[:CKPT], got {spec!r}")
        cfg_path, _, ckpt = rest.partition(":")
        services[name], ds = build_service(
            cfg_path, ckpt or None, synthetic, args.batch_size, args.flush_ms,
            compute_dtype=args.dtype)
        dataset = dataset or ds
    router = ModelRouter(services)
    service = next(iter(services.values()))
    if args.selftest:
        selftest(service, dataset, args.port)
        router.close()
        return
    server = make_http_server(router if len(services) > 1 else service, args.port)
    print(f"serving {sorted(services)} on http://127.0.0.1:{args.port}  "
          f"(batch {service.batch_size}, flush {service.flush_ms} ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        router.close()


if __name__ == "__main__":
    main()
