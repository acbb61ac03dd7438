"""Export + verify the AOT serving artifact (export.py) on a live backend.

Builds a representative request pool, exports the closed executable set to
STABLEHLO (one module per canonical BucketSpec x batch rung), reloads it,
and verifies a fresh engine serves identical answers with ZERO Python
traces — the deployment path a serving fleet would run.

Usage:
  python scripts/export_serving.py --tpu --out /tmp/serving_art --json EXPORT_r03.json
  python scripts/export_serving.py --tiny            # CPU smoke
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from serving_bench import FAMILIES  # noqa: E402  (same pool definition)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--out", default="/tmp/dfol_serving_art")
    ap.add_argument("--json", default=None)
    ap.add_argument("--objects", type=int, default=24)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--n-per", type=int, default=2)
    ap.add_argument("--platforms", default=None, metavar="P1,P2",
                    help="lowering targets, e.g. 'cpu,tpu': a CPU build host "
                         "can produce an artifact a TPU fleet deserializes "
                         "(TPU lowering is ahead-of-time; note Pallas kernel "
                         "selection happens at trace time, so O>=64 TPU "
                         "kernels require exporting ON a TPU host)")
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

    tiny = args.tiny or not args.tpu
    if tiny:  # CPU smoke: trim the spec space (CPU lowering is slow)
        serving_bench.FAMILIES[:] = FAMILIES[:5]
        args.max_batch = min(args.max_batch, 4)
    bargs = argparse.Namespace(
        tiny=tiny, objects=args.objects,
        max_batch=args.max_batch, max_delay_ms=5.0,
    )
    cfg, ont, world, eng = serving_bench.build(bargs)
    eng.stop()  # exporter engine needs no dispatcher
    qs, feats = serving_bench.request_pool(
        world, cfg.tpu.max_object_num, n_per=args.n_per,
        lengths=(0, 1) if tiny else (0, 1, 2), seed=3,
    )

    from dfol_vqa_tpu.export import export_serving_set, load_serving_set
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from dfol_vqa_tpu.serve import ServingEngine

    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    t0 = time.perf_counter()
    manifest = export_serving_set(eng, qs, args.out, platforms=platforms,
                                  include_traces=True)
    export_s = time.perf_counter() - t0
    size = sum(
        os.path.getsize(os.path.join(args.out, f)) for f in os.listdir(args.out)
    )
    print(f"[export] {len(manifest['executables'])} modules "
          f"({manifest['n_specs']} specs x {manifest['batch_sizes']}), "
          f"{size/1e6:.1f} MB, {export_s:.1f}s", flush=True)

    t1 = time.perf_counter()
    loaded = load_serving_set(args.out, engine=eng)
    load_s = time.perf_counter() - t1

    # live (tracing) ground truth
    live = ServingEngine(cfg, ont, eng.params, features=world,
                         max_batch=args.max_batch, transfer_dtype=eng.transfer_dtype)
    try:
        want = [r.answers for r in live.answer_many(qs)]
    finally:
        live.stop()

    # deployment replica: serves from the artifact, forbidden to trace
    eng2 = ServingEngine(cfg, ont, eng.params, features=world,
                         max_batch=args.max_batch, transfer_dtype=eng.transfer_dtype,
                         executables=loaded)
    Interpreter.forward = property()  # any trace attempt now raises
    try:
        t2 = time.perf_counter()
        got = [r.answers for r in eng2.answer_many(qs)]
        serve_s = time.perf_counter() - t2
    finally:
        eng2.stop()
    agree = sum(a == b for a, b in zip(got, want))
    out = {
        "backend": backend,
        "device": str(jax.devices()[0]),
        "n_modules": len(manifest["executables"]),
        "n_specs": manifest["n_specs"],
        "batch_sizes": manifest["batch_sizes"],
        "artifact_mb": size / 1e6,
        "export_s": export_s,
        "load_s": load_s,
        "first_serve_pass_s": serve_s,
        "n_questions": len(qs),
        "answers_agree": f"{agree}/{len(qs)}",
        "compiled_steps_on_serve_host": eng2.stats["compiled_steps"],
        "aot_steps": eng2.stats["aot_steps"],
        "ok": agree == len(qs) and eng2.stats["compiled_steps"] == 0,
    }
    js = json.dumps(out, indent=1)
    if args.json:
        with open(args.json, "w") as f:
            f.write(js)
    print(js)
    if not out["ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
