"""Start the HTTP serving daemon (http_frontend.py over serve.py).

Demo mode serves the planted world with random-init (or checkpointed)
weights — enough to exercise the full online path end-to-end:

  python scripts/http_serve.py --port 8787 --tiny          # CPU demo
  python scripts/http_serve.py --tpu --port 8787 \
      --ckpt runs/exp1 --ckpt-name best                    # real weights

Then:

  curl localhost:8787/healthz
  curl localhost:8787/stats
  curl -X POST localhost:8787/v1/answer -d '{"question": {...}}'

An ``--artifact DIR`` produced by scripts/export_serving.py preloads the
AOT executable set so the daemon never traces the model.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--objects", type=int, default=24)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--max-delay-ms", type=float, default=10.0)
    ap.add_argument("--ckpt", default=None, help="checkpoint dir (export_path_base)")
    ap.add_argument("--ckpt-name", default="best")
    ap.add_argument("--artifact", default=None, help="AOT serving set dir (export.py)")
    ap.add_argument("--warmup", action="store_true",
                    help="precompile the executable set from a planted sample")
    args = ap.parse_args()
    if not args.tpu:
        # all three are needed — the axon TPU plugin ignores JAX_PLATFORMS
        # alone and would then hang on an unreachable tunnel
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    if args.tpu and backend != "tpu":
        raise SystemExit(f"--tpu requested but backend is {backend}")

    import serving_bench

    from dfol_vqa_tpu.http_frontend import ServingHTTPFrontend
    from dfol_vqa_tpu.train import checkpoint

    bargs = argparse.Namespace(
        tiny=args.tiny, objects=args.objects,
        max_batch=args.max_batch, max_delay_ms=args.max_delay_ms,
    )
    cfg, ont, world, eng = serving_bench.build(bargs)
    if args.ckpt:
        params, step = checkpoint.load(args.ckpt, args.ckpt_name, eng.params)
        eng.params = jax.device_put(params)
        print(f"[http_serve] loaded {args.ckpt_name} @ step {step}", flush=True)
    if args.artifact:
        from dfol_vqa_tpu.export import load_serving_set

        eng._exported.update(load_serving_set(args.artifact, engine=eng))
        print(f"[http_serve] preloaded {len(eng._exported)} AOT modules", flush=True)
    if args.warmup:
        qs, _ = serving_bench.request_pool(
            world, cfg.tpu.max_object_num, n_per=1, lengths=(0, 1, 2), seed=3)
        print(f"[http_serve] warmup {eng.warmup(qs)}", flush=True)

    front = ServingHTTPFrontend(eng, host=args.host, port=args.port)
    print(f"[http_serve] backend={backend} listening on "
          f"http://{front.host}:{front.port}", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        pass
    finally:
        front.close()
        eng.stop()


if __name__ == "__main__":
    main()
