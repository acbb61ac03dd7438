"""HTTP frontend for the online serving engine (stdlib-only).

The reference has no serving daemon at all — its inference surface is a
CLI that writes a predictions JSON offline (reference
src/nsvqa/train/trainer.py:685-760 via gqa_interpreter_experiments.py -p).
This wraps ``ServingEngine`` (serve.py) in a threaded HTTP server so the
continuous batcher sees genuinely concurrent traffic: each connection gets
a handler thread, ``submit`` does the per-request compile/canonicalize work
on that thread, and the threads then block on their futures while the
dispatcher aggregates same-spec requests into padded device batches.

Endpoints (JSON in/out):

  GET  /healthz      -> {"ok": true, "backend": ...}
  GET  /stats        -> engine counters + latency percentiles
  POST /v1/answer    -> {"question": {...}, "objects"?: [[..]], "obj_mask"?: [..]}
                        -> {"answers": [...], "latency_ms", "batch_size"}
  POST /v1/answers   -> {"questions": [{...}, ...]} -> {"results": [...]}
  POST /v1/trace     -> {"question": {...}} -> hop-by-hop attention trace
                        (per-slot object attentions + decoded answer)

``objects``/``obj_mask`` are optional when the engine owns a FeatureSource
(then ``question["imageId"]`` is looked up). Questions use the reference's
preprocessed program schema — the same dicts the offline loaders consume.

Start a demo server (planted world + random or checkpointed weights):

    python scripts/http_serve.py --port 8787 [--ckpt DIR --ckpt-name best]
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def _latency_summary(lats) -> dict:
    xs = np.asarray(lats, dtype=np.float64)
    if xs.size == 0:
        return {"n": 0}
    return {
        "n": int(xs.size),
        "p50_ms": float(np.percentile(xs, 50)),
        "p90_ms": float(np.percentile(xs, 90)),
        "p99_ms": float(np.percentile(xs, 99)),
        "mean_ms": float(xs.mean()),
    }


class ServingHTTPFrontend:
    """Threaded HTTP server over a running ServingEngine.

    ``port=0`` binds an ephemeral port (read ``.port`` after construction —
    the tests use this). ``serve_forever`` runs on a daemon thread so the
    caller owns the lifecycle; ``close()`` stops the server (the engine is
    NOT stopped — it may be shared)."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        from dfol_vqa_tpu.serve import EngineOverloaded

        self.engine = engine
        frontend = self

        class Handler(BaseHTTPRequestHandler):
            # quiet: one access-log line per request ruins benchmark loops
            def log_message(self, fmt, *args):
                pass

            def _reply(self, code: int, payload: dict):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                try:
                    if self.path == "/healthz":
                        self._reply(200, frontend.healthz())
                    elif self.path == "/stats":
                        self._reply(200, frontend.stats())
                    else:
                        self._reply(404, {"error": f"no such path: {self.path}"})
                except Exception as e:  # always answer; never drop the socket
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

            def do_POST(self):
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    req = json.loads(self.rfile.read(n) or b"{}")
                except (ValueError, json.JSONDecodeError) as e:
                    return self._reply(400, {"error": f"bad JSON: {e}"})
                try:
                    if self.path == "/v1/answer":
                        self._reply(200, frontend.answer(req))
                    elif self.path == "/v1/answers":
                        self._reply(200, frontend.answers(req))
                    elif self.path == "/v1/trace":
                        self._reply(200, frontend.trace(req))
                    else:
                        self._reply(404, {"error": f"no such path: {self.path}"})
                except EngineOverloaded as e:
                    # admission control (serve.EngineOverloaded): queue at
                    # max_pending — retryable, tell the client to back off
                    self._reply(429, {"error": str(e), "retryable": True})
                except (KeyError, ValueError, TypeError, IndexError) as e:
                    self._reply(400, {"error": str(e)})
                except Exception as e:  # engine-side failure: surface as 500
                    self._reply(500, {"error": f"{type(e).__name__}: {e}"})

        self._server = ThreadingHTTPServer((host, port), Handler)
        self._server.daemon_threads = True
        self.host, self.port = self._server.server_address[:2]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------- handlers

    def healthz(self) -> dict:
        import jax

        return {"ok": True, "backend": jax.default_backend()}

    def stats(self) -> dict:
        s = self.engine.stats
        # snapshot under the engine's locks: counters/latencies are written
        # by the completion pool (_stats_lock), _pending by submitters and
        # the dispatcher (_cond)
        with self.engine._stats_lock:
            out = {k: v for k, v in s.items() if k != "latencies_ms"}
            lats = list(s["latencies_ms"])
        with self.engine._cond:
            pending = sum(len(q) for q in self.engine._pending.values())
        out["latency"] = _latency_summary(lats)
        out["pending"] = pending
        return out

    @staticmethod
    def _parse_features(req: dict):
        """Shared inline-feature parsing/validation for answer + trace."""
        objs = req.get("objects")
        mask = req.get("obj_mask")
        if objs is not None:
            if mask is None:
                raise ValueError("objects given without obj_mask")
            objs = np.asarray(objs, dtype=np.float32)
            mask = np.asarray(mask, dtype=np.float32)
        return objs, mask

    def _submit(self, req: dict):
        objs, mask = self._parse_features(req)
        return self.engine.submit(req["question"], objs, mask)

    @staticmethod
    def _result_json(r) -> dict:
        return {
            "answers": r.answers,
            "latency_ms": r.latency_ms,
            "batch_size": r.batch_size,
        }

    def answer(self, req: dict) -> dict:
        return self._result_json(self._submit(req).result())

    def answers(self, req: dict) -> dict:
        futs = [
            self._submit({"question": q, **extra})
            for q, extra in _per_question(req)
        ]
        return {"results": [self._result_json(f.result()) for f in futs]}

    def trace(self, req: dict) -> dict:
        objs, mask = self._parse_features(req)
        return self.engine.trace(req["question"], objs, mask)

    def close(self):
        self._server.shutdown()
        self._server.server_close()


def _per_question(req: dict):
    qs = req["questions"]
    objs = req.get("objects")
    masks = req.get("obj_mask")
    if objs is not None:
        if masks is None:
            raise ValueError("objects given without obj_mask")
        if len(objs) != len(qs) or len(masks) != len(qs):
            raise ValueError(
                f"objects/obj_mask length ({len(objs)}/{len(masks)}) must "
                f"match questions ({len(qs)})"
            )
    for i, q in enumerate(qs):
        extra = {}
        if objs is not None:
            extra = {"objects": objs[i], "obj_mask": masks[i]}
        yield q, extra


# -------------------------------------------------------------- daemon CLI


def main(argv=None):
    """``dfol-vqa-serve``: start the HTTP daemon.

    Demo feature source is the planted world (exact ground truth, all 13
    families); real weights load from a trainer checkpoint and the AOT
    artifact (export.py) preloads the executable set so the daemon never
    traces."""
    import argparse
    import os
    import time

    ap = argparse.ArgumentParser(prog="dfol-vqa-serve")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="small demo dims")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--objects", type=int, default=24)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-delay-ms", type=float, default=10.0)
    ap.add_argument("--max-pending", type=int, default=256,
                    help="admission-control bound on queued requests; "
                         "arrivals beyond it get HTTP 429 (0 = unbounded)")
    ap.add_argument("--ckpt", default=None, help="checkpoint dir (export_path_base)")
    ap.add_argument("--ckpt-name", default="best")
    ap.add_argument("--artifact", default=None, help="AOT serving set dir (export.py)")
    ap.add_argument("--warmup", action="store_true",
                    help="precompile the executable set from a planted sample")
    ap.add_argument("--jit-cache", default=None, metavar="DIR",
                    help="persistent XLA compilation cache: daemon restarts "
                         "(and mesh serving, which the AOT artifact does not "
                         "cover) skip recompiles of previously seen specs")
    args = ap.parse_args(argv)
    if not args.tpu:
        # all three are needed — the axon TPU plugin ignores JAX_PLATFORMS
        # alone and would then hang on an unreachable tunnel
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    if args.jit_cache:
        jax.config.update("jax_compilation_cache_dir", args.jit_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    backend = jax.default_backend()
    if args.tpu and backend != "tpu":
        raise SystemExit(f"--tpu requested but backend is {backend}")

    from dfol_vqa_tpu.data.planted import ALL_FAMILIES
    from dfol_vqa_tpu.serve import build_demo_engine
    from dfol_vqa_tpu.train import checkpoint

    cfg, ont, world, eng = build_demo_engine(
        tiny=args.tiny, objects=args.objects,
        max_batch=args.max_batch, max_delay_ms=args.max_delay_ms,
        max_pending=args.max_pending or None)
    if args.ckpt:
        loaded, step = checkpoint.load(args.ckpt, args.ckpt_name, eng.params)
        eng.params = jax.device_put(loaded)
        print(f"[dfol-vqa-serve] loaded {args.ckpt_name} @ step {step}", flush=True)
    if args.artifact:
        from dfol_vqa_tpu.export import load_serving_set

        eng._exported.update(load_serving_set(args.artifact, engine=eng))
        print(f"[dfol-vqa-serve] preloaded {len(eng._exported)} AOT modules",
              flush=True)
    if args.warmup:
        qs = []
        for fi, fam in enumerate(ALL_FAMILIES):
            for li, ln in enumerate((0, 1, 2)):
                qs.extend(world.generate_family(
                    fam, 1, length=ln, seed=3 + 10 * fi + li,
                    id_prefix=f"w{fam}{ln}-"))
        print(f"[dfol-vqa-serve] warmup {eng.warmup(qs, traces=True)}",
              flush=True)

    front = ServingHTTPFrontend(eng, host=args.host, port=args.port)
    print(f"[dfol-vqa-serve] backend={backend} listening on "
          f"http://{front.host}:{front.port}", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        front.close()
        eng.stop()
