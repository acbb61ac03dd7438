"""Answer-distribution parity report: ours vs the reference, same weights.

Runs identical synthetic GQA-style evaluation workloads (mixed terminal ops,
program lengths 1-3, ``not(x)`` negations, ``_`` wildcard selects, ragged
option counts, shared scenes) through (a) this framework and (b) the
reference PyTorch pipeline loaded with the SAME parameters, then reports
per-op answer agreement and log-probability deltas. A second phase repeats
a subset with the attention-transfer CALIBRATOR active (shared bi-LSTM
weights, eval + train modulator modes), via the tests/test_calibrator_parity
harness.

Writes PARITY_REPORT.json at the repo root.

Usage: python scripts/answer_parity.py [--per-op 330] [--calib-per-op 150]
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


def synth_questions(ont, rng, terminal, n, length, neg_prob=0.15, wildcard_prob=0.1):
    from dfol_vqa_tpu.data.synthetic import generate_questions

    return generate_questions(
        ont, n, terminal=terminal, length=length, seed=int(rng.integers(0, 1 << 30)),
        neg_prob=neg_prob, wildcard_prob=wildcard_prob,
    )


def _compare_batch(qs, cb, spec, ours, ref):
    """Returns (agree_count, n, max_lp_delta) for one batch."""
    qtype = question_type_of(spec.terminal_op)
    lp = np.asarray(ours["log_probability"])
    ref_lp = ref["log_probability"].detach().numpy().flatten()
    flags = np.asarray(ours["answer_flags"])
    agree = n = 0
    # the reference emits answers only with give_answer=True (eval); on the
    # is_training leg agreement is derived from the log-probabilities
    has_answers = len(ref["answer"]) >= len(qs) and all(
        len(ref["answer"][qi]) > 0 for qi in range(len(qs))
    )
    if qtype == QuestionType.QUERY:
        flat, offsets, off = [], [], 0
        for qi in range(len(qs)):
            k = len(cb.option_strings[qi])
            flat.extend(lp[qi, :k])
            offsets.append((off, off + k))
            off += k
        delta = float(np.max(np.abs(np.array(flat) - ref_lp)))
        for qi in range(len(qs)):
            k = len(cb.option_strings[qi])
            if has_answers:
                mine = [cb.option_strings[qi][j] for j in range(k) if flags[qi, j]]
                agree += int(mine == [str(x) for x in ref["answer"][qi]])
            else:
                lo, hi = offsets[qi]
                agree += int(int(np.argmax(lp[qi, :k])) == int(np.argmax(ref_lp[lo:hi])))
            n += 1
    else:
        delta = float(np.max(np.abs(lp - ref_lp)))
        for qi in range(len(qs)):
            if has_answers:
                mine = "yes" if flags[qi, 0] else "no"
                agree += int(mine == str(ref["answer"][qi][0]))
            else:
                agree += int((lp[qi] > np.log(0.5)) == (ref_lp[qi] > np.log(0.5)))
            n += 1
    return agree, n, delta


def run_plain_phase(ont, params, rng, per_op, batch, report):
    total_match = total_n = 0
    for term in TERMS:
        agree = n = 0
        lp_deltas = []
        failed = None
        for length in (1, 2, 3):
            qs_all = synth_questions(ont, rng, term, per_op // 3, length)
            for s in range(0, len(qs_all), batch):
                qs = qs_all[s : s + batch]
                counts = [int(rng.integers(2, fmp.O_PAD + 1)) for _ in qs]
                objs, mask = fmp.make_scene(rng, counts)
                try:
                    ref = fmp.run_reference(params, qs, objs, mask, counts)
                except Exception as e:  # reference crashes on some shapes
                    failed = f"reference failed: {e}"
                    break
                spec, cb, ours = fmp.run_ours(ont, params, qs, objs, mask)
                a, m, d = _compare_batch(qs, cb, spec, ours, ref)
                agree += a
                n += m
                lp_deltas.append(d)
            if failed:
                break
        report[term] = (
            {"error": failed}
            if failed
            else {
                "questions": n,
                "answer_agreement": agree / max(n, 1),
                "max_abs_logprob_delta": float(np.max(lp_deltas)) if lp_deltas else None,
            }
        )
        if not failed:
            total_match += agree
            total_n += n
    return total_match, total_n


def run_calibrator_phase(ont_dim, rng, per_op, batch, report):
    """Subset of terminals with the attention-transfer calibrator ACTIVE and
    shared bi-LSTM weights (test_calibrator_parity harness); exercises both
    the eval and training modulator modes (trainer.py:97)."""
    import test_calibrator_parity as cp
    from dfol_vqa_tpu.ontology import GQAOntology as OurOntology

    ont = OurOntology(embedding_dim=cp.EMB_DIM)
    cfg = cp.calib_cfg()
    interp = Interpreter(cfg, ont)
    params = cp.randomize_output_head(interp.init_params(jax.random.PRNGKey(41)))

    total_match = total_n = 0
    for term in ["exist", "verify_rel", "query_attr", "choose_rel", "two_same"]:
        agree = n = 0
        lp_deltas = []
        failed = None
        for length, is_training in ((1, False), (2, False), (2, True)):
            qs_all = synth_questions(ont, rng, term, per_op // 3, length)
            for s in range(0, len(qs_all), batch):
                qs = qs_all[s : s + batch]
                counts = [int(rng.integers(2, cp.O_PAD + 1)) for _ in qs]
                objs, mask = cp.make_scene(rng, counts)
                try:
                    ref = cp.run_reference(params, qs, objs, mask, counts, is_training)
                except Exception as e:
                    failed = f"reference failed: {e}"
                    break
                spec, cb, ours = cp.run_ours(ont, params, qs, objs, mask, is_training)
                a, m, d = _compare_batch(qs, cb, spec, ours, ref)
                agree += a
                n += m
                lp_deltas.append(d)
            if failed:
                break
        report[f"calibrated_{term}"] = (
            {"error": failed}
            if failed
            else {
                "questions": n,
                "answer_agreement": agree / max(n, 1),
                "max_abs_logprob_delta": float(np.max(lp_deltas)) if lp_deltas else None,
            }
        )
        if not failed:
            total_match += agree
            total_n += n
    return total_match, total_n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-op", type=int, default=330)
    ap.add_argument("--calib-per-op", type=int, default=150)
    ap.add_argument("--batch", type=int, default=6)
    args = ap.parse_args()

    ont = GQAOntology()
    cfg = fmp.tiny_cfg()
    interp = Interpreter(cfg, ont)
    params = interp.init_params(jax.random.PRNGKey(99))
    rng = np.random.default_rng(7)

    report = {}
    m1, n1 = run_plain_phase(ont, params, rng, args.per_op, args.batch, report)
    m2, n2 = run_calibrator_phase(fmp.EMB_DIM, rng, args.calib_per_op, args.batch, report)

    report["_overall"] = {
        "questions": n1 + n2,
        "answer_agreement": (m1 + m2) / max(n1 + n2, 1),
        "fuzz": "lengths 1-3, neg_prob 0.15, wildcard_prob 0.1, ragged options",
    }
    out = os.path.join(REPO, "PARITY_REPORT.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["_overall"]))
    for k in report:
        if k != "_overall":
            print(k, report[k])


if __name__ == "__main__":
    main()
