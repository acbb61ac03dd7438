"""Merge production + stressed curriculum runs into CURRICULUM_r03.json
(same two-regime schema as CURRICULUM_r02.json, plus device stamps and a
TPU-vs-CPU per-stage wall-clock table against the r02 CPU run).

Usage:
  python scripts/merge_curriculum.py prod.json stressed.json \
      [--r02 CURRICULUM_r02.json] [--out CURRICULUM_r03.json]
"""

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prod")
    ap.add_argument("stressed")
    ap.add_argument("--r02", default=os.path.join(REPO, "CURRICULUM_r02.json"))
    ap.add_argument("--out", default=os.path.join(REPO, "CURRICULUM_r03.json"))
    ap.add_argument("--note", default="")
    ap.add_argument("--prepad", default=None, help=(
        "earlier TPU artifact run WITHOUT tpu.pad_chunks (one executable "
        "per partial-chunk tail length); adds a compile_hygiene section "
        "comparing cold per-stage wall-clock"))
    args = ap.parse_args()

    prod = json.load(open(args.prod))
    stressed = json.load(open(args.stressed))

    timing = None
    if os.path.exists(args.r02):
        r02 = json.load(open(args.r02))
        cpu_secs = [s["seconds"] for s in r02["production"]["stages"]]
        tpu_secs = [s["seconds"] for s in prod["stages"]]
        timing = {
            "r02_cpu_stage_seconds": cpu_secs,
            "r03_tpu_stage_seconds": tpu_secs,
            "speedup_per_stage": [
                round(c / t, 2) for c, t in zip(cpu_secs, tpu_secs)
            ],
            "total_speedup": round(sum(cpu_secs) / sum(tpu_secs), 2),
            "note": (
                "r02 ran on the host CPU (curriculum_run.py forced CPU); r03 "
                "runs the identical recipe on the TPU through the remote "
                "tunnel with train_chunk=8 / eval_chunk=8 fused dispatch and "
                "the persistent jit cache. Datasets differ slightly from r02 "
                "(planted noise is now seeded process-independently, ADVICE "
                "r2 medium), so accuracies are comparable within noise, not "
                "bit-identical."
            ),
        }

    compile_hygiene = None
    if args.prepad and os.path.exists(args.prepad):
        pre = json.load(open(args.prepad))
        pre_secs = [s["seconds"] for s in pre["production"]["stages"]]
        pad_secs = [s["seconds"] for s in prod["stages"]]
        compile_hygiene = {
            "prepad_cold_stage_seconds": pre_secs,
            "padded_cold_stage_seconds": pad_secs,
            "prepad_total": round(sum(pre_secs), 1),
            "padded_total": round(sum(pad_secs), 1),
            "worst_stage_prepad": round(max(pre_secs), 1),
            "worst_stage_padded": round(max(pad_secs), 1),
            "note": (
                "Both are COLD runs (fresh jit-cache dir) of the identical "
                "recipe/seed on the TPU. Without tpu.pad_chunks every "
                "partial train/eval chunk tail length is a distinct XLA "
                "executable; one stray compile on the shared compile "
                "service stalled stage 4 ~45 min. With pad_chunks (default "
                "on) partial chunks pad to one n_valid-gated executable per "
                "bucket spec, eliminating the tail-length compile family."
            ),
        }

    artifact = {
        "description": (
            "The reference's 8-stage curriculum (README.md:77-100) executed "
            "end-to-end ON THE TPU through the production experiment path "
            "(stage configs, -l best checkpoint forwarding, calibrator-on-"
            "frozen-oracle stages 6-7) on the planted-signal world with "
            "exact ground-truth answers; test set = 13 terminal families x "
            "lengths 0-2 on held-out scenes. Two regimes: 'production' "
            "(full data/epochs) and 'stressed' (half data/epochs; imperfect "
            "oracle — the regime the paper's calibrator targets). "
            "Per-family rows omit empty test buckets (r2 hygiene fix). "
            + args.note
        ),
        "device": prod.get("device"),
        "backend": prod.get("backend"),
        "production": prod,
        "stressed": stressed,
        "tpu_vs_cpu_timing": timing,
        "compile_hygiene": compile_hygiene,
        "summary": {
            "production_final_acc": prod["stages"][-1]["test_acc_overall"],
            "stressed_final_acc": stressed["stages"][-1]["test_acc_overall"],
            "stressed_stage5_acc": stressed["stages"][5]["test_acc_overall"],
            "stressed_stage6_acc": stressed["stages"][6]["test_acc_overall"],
            "stressed_calibrator_gain": stressed.get("calibrator_gain"),
        },
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}")
    print(json.dumps(artifact["summary"]))
    if timing:
        print("speedups:", timing["speedup_per_stage"], "total:", timing["total_speedup"])


if __name__ == "__main__":
    main()
