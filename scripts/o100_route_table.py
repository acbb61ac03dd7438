"""Measure the relation-route table: Mosaic kernels vs XLA tail per dims.

VERDICT r4 item 2 asked for a MEASURED per-dims choice instead of the
stale `use_pallas and O >= 64` gate (after the r5 vocab-major attribute
cache + contract-then-gather optimizations, the XLA tail beats the kernel
route at O=100/B=32). This sweeps the full production eval step (the same
measure_device harness bench.py uses — scan-length differencing, host RTT
cancelled) over batch x O x route and writes O100_ROUTE.json; the winning
entries are encoded in config.TPUConfig.resolve_rel_route's table.

Usage: python scripts/o100_route_table.py [--out O100_ROUTE.json]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print(f"SKIP: backend={jax.default_backend()}")
        return 3

    import bench

    device = jax.devices()[0].device_kind
    rows = []
    for B, kb in ((32, 256), (256, 34)):
        for o in (100,):
            for route in ("pallas", "xla"):
                bench.BATCH, bench.O_PAD = B, o
                bench.MIN_OBJ, bench.MAX_OBJ = 30, o
                try:
                    sec, _ = bench.measure_device(
                        hops=4, use_pallas=(route == "pallas"),
                        k_small=4, k_big=kb,
                    )
                finally:
                    bench.BATCH, bench.O_PAD = 32, 24
                    bench.MIN_OBJ, bench.MAX_OBJ = 8, 24
                row = {"batch": B, "O": o, "route": route,
                       "device_ms_per_batch": round(sec * 1e3, 3),
                       "qps": round(B / sec, 1)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    winners = {}
    for B in sorted({r["batch"] for r in rows}):
        for o in sorted({r["O"] for r in rows}):
            sub = [r for r in rows if r["batch"] == B and r["O"] == o]
            if sub:
                best = max(sub, key=lambda r: r["qps"])
                winners[f"B{B}_O{o}"] = best["route"]

    out = {"device": device, "rows": rows, "winners": winners}
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "O100_ROUTE.json"))
    args = ap.parse_args()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"winners": winners, "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
