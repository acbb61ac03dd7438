"""On-chip serving smoke: warm a small executable set, serve a burst,
assert zero serve-time compiles. Exit 3 when no TPU backend is reachable
(the hardware-gated test in tests/test_tpu_hw.py skips on that)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    # persistent compile cache: the shared tunnel compile service can take
    # ~60s/executable cold; re-runs re-warm from disk in seconds
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".serve_jit_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    if jax.default_backend() != "tpu":
        print(f"backend={jax.default_backend()}")
        return 3

    from dfol_vqa_tpu.serve import build_demo_engine

    # Coarse (1, 8) batch ladder: the dispatcher may flush PARTIAL groups
    # (deadline), and any group of 2..8 then pads to rung 8 — so the default
    # warmup over the ladder rungs really closes the executable set. (The r3
    # version warmed batch_sizes=[1, 8] on the full ladder; a deadline flush
    # of 3 requests padded to rung 4 and minted a serve-time compile.)
    cfg, ont, world, eng = build_demo_engine(objects=24, max_batch=8,
                                             batch_ladder=(1, 8))
    try:
        qs = []
        for fam, ln in (("exist", 0), ("exist", 2), ("query_attr", 1)):
            qs.extend(world.generate_family(fam, 4, length=ln, seed=5,
                                            id_prefix=f"t{fam}{ln}"))
        winfo = eng.warmup(qs)
        warm = eng.stats["compiled_steps"]
        t0 = time.perf_counter()
        results = eng.answer_many(qs * 4)
        dt = time.perf_counter() - t0
        ok = (eng.stats["compiled_steps"] == warm
              and all(r.answers for r in results))
        print(f"warmup={winfo} burst_qps={len(qs) * 4 / dt:.1f} "
              f"serve_compiles={eng.stats['compiled_steps'] - warm}")
        print(f"serving_ok={ok}")
        return 0 if ok else 1
    finally:
        eng.stop()


if __name__ == "__main__":
    raise SystemExit(main())
