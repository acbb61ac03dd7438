"""Answer-distribution parity report: ours vs the reference, same weights.

Runs identical synthetic GQA-style evaluation workloads (mixed terminal ops,
mixed program lengths, shared scenes) through (a) this framework and (b) the
reference PyTorch pipeline loaded with the SAME parameters, then reports
per-op answer agreement and log-probability deltas.

Writes PARITY_REPORT.json at the repo root.

Usage: python scripts/answer_parity.py [--per-op 24]
"""

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler, batch_arrays
from dfol_vqa_tpu.models.interpreter import Interpreter, question_type_of
from dfol_vqa_tpu.ontology import GQAOntology
from dfol_vqa_tpu.types import QuestionType

import test_full_model_parity as fmp  # reuse the weight-exporting harness

TERMS = [
    "exist", "verify_attrs", "verify_rel", "query_attr", "choose_attr",
    "choose_rel", "and", "or", "all_same", "all_different", "two_same",
    "two_different", "compare",
]


def synth_questions(ont, rng, terminal, n):
    from dfol_vqa_tpu.data.synthetic import generate_questions

    return generate_questions(ont, n, terminal=terminal, length=int(rng.integers(1, 4)),
                              seed=int(rng.integers(0, 1 << 30)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-op", type=int, default=24)
    ap.add_argument("--batch", type=int, default=6)
    args = ap.parse_args()

    ont = GQAOntology()
    cfg = fmp.tiny_cfg()
    interp = Interpreter(cfg, ont)
    params = interp.init_params(jax.random.PRNGKey(99))
    rng = np.random.default_rng(7)

    report = {}
    total_match = total_n = 0
    for term in TERMS:
        qs_all = synth_questions(ont, rng, term, args.per_op)
        agree = n = 0
        lp_deltas = []
        for s in range(0, len(qs_all), args.batch):
            qs = qs_all[s : s + args.batch]
            counts = [int(rng.integers(2, fmp.O_PAD + 1)) for _ in qs]
            objs, mask = fmp.make_scene(rng, counts)
            try:
                ref = fmp.run_reference(params, qs, objs, mask, counts)
            except Exception as e:  # reference crashes on some shapes
                report[term] = {"error": f"reference failed: {e}"}
                break
            spec, cb, ours = fmp.run_ours(ont, params, qs, objs, mask)
            qtype = question_type_of(spec.terminal_op)
            lp = np.asarray(ours["log_probability"])
            ref_lp = ref["log_probability"].detach().numpy().flatten()
            flags = np.asarray(ours["answer_flags"])
            if qtype == QuestionType.QUERY:
                flat = []
                for qi in range(len(qs)):
                    flat.extend(lp[qi, : len(cb.option_strings[qi])])
                lp_deltas.append(np.max(np.abs(np.array(flat) - ref_lp)))
                for qi in range(len(qs)):
                    k = len(cb.option_strings[qi])
                    mine = [cb.option_strings[qi][j] for j in range(k) if flags[qi, j]]
                    agree += int(mine == [str(x) for x in ref["answer"][qi]])
                    n += 1
            else:
                lp_deltas.append(np.max(np.abs(lp - ref_lp)))
                for qi in range(len(qs)):
                    mine = "yes" if flags[qi, 0] else "no"
                    agree += int(mine == str(ref["answer"][qi][0]))
                    n += 1
        else:
            report[term] = {
                "questions": n,
                "answer_agreement": agree / max(n, 1),
                "max_abs_logprob_delta": float(np.max(lp_deltas)) if lp_deltas else None,
            }
            total_match += agree
            total_n += n

    report["_overall"] = {
        "questions": total_n,
        "answer_agreement": total_match / max(total_n, 1),
    }
    out = os.path.join(REPO, "PARITY_REPORT.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["_overall"]))
    for term in TERMS:
        print(term, report.get(term))


if __name__ == "__main__":
    main()
