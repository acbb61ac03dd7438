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


def run_hard_phase(ont, params, rng, per_op, batch, report):
    """Eval legs with hard_mode=True both sides (reference trainer.py:96-117
    evaluation aggregation: min/max instead of soft products). Pins the
    reference's hard-mode quirks: GQAQueryAttrBatch / GQAAllDifferentBatch /
    GQATwoDifferentBatch drop hard_mode when delegating (batch_gqa_ops.py:
    304-305, 627-628, 702-703), so those terminals stay soft."""
    total_match = total_n = 0
    for term in TERMS:
        agree = n = 0
        lp_deltas = []
        failed = None
        for length in (1, 2):
            qs_all = synth_questions(ont, rng, term, per_op // 2, length)
            for s in range(0, len(qs_all), batch):
                qs = qs_all[s : s + batch]
                counts = [int(rng.integers(2, fmp.O_PAD + 1)) for _ in qs]
                objs, mask = fmp.make_scene(rng, counts)
                try:
                    ref = fmp.run_reference(params, qs, objs, mask, counts,
                                            hard_mode=True)
                except Exception as e:
                    failed = f"reference failed: {e}"
                    break
                spec, cb, ours = fmp.run_ours(ont, params, qs, objs, mask,
                                              hard_mode=True)
                a, m, d = _compare_batch(qs, cb, spec, ours, ref)
                agree += a
                n += m
                lp_deltas.append(d)
            if failed:
                break
        report[f"hard_{term}"] = (
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


def run_reference_supervision(params, questions, objs, mask, counts,
                              cached=True, is_training=False):
    """Reference runner for the direct-supervision terminals.

    Unlike fmp.run_reference: ships ``object_pairs`` meta_data (the
    BatchGQABoxFeaturesCollator contract, batch_gqa_boxfeatures_pipeline.py:
    94-97 / featurizer :225-249) and exposes cached/is_training, because two
    reference legs are dead upstream: GQAObjectRelBatch's give_answer path
    crashes (`range(relation_list)` on a list, batch_gqa_ops.py:872) and
    GQASceneOpBatch is incompatible with cached=True (it re-applies the
    networks to the likelihood cache, :888-890)."""
    import sys as _s

    import torch
    import torch.nn as nn_t

    _s.path.insert(0, "/root/reference/src")
    from nsvqa.nn.vision.classifier_oracle import ClassifierOracle
    from nsvqa.nn.interpreter.batch_gqa_ops import GQAOntology as RefOntology
    from nsvqa.nn.interpreter.batch_gqa_interpreter import BatchGQAInterpreter
    from nsvqa.data.batch_gqa_boxfeatures_pipeline import BatchGQABoxFeaturizer
    from nsvqa.data.data_pipeline import ProgramCollaterBase

    meta = "/root/reference/src/nsvqa/data/metadata"
    ont = RefOntology(
        meta + "/gqa_all_attribute.json", meta + "/gqa_all_class.json",
        meta + "/gqa_vocab.json", None, relation_json_path=meta + "/gqa_relation.json",
    )
    featurizer_net = fmp.to_torch_mlp(torch, nn_t, params["featurizer"], nn_t.Sigmoid())
    attr_net = fmp.to_torch_mlp(torch, nn_t, params["attribute_network"], nn_t.Sigmoid())
    rel_net = fmp.to_torch_mlp(torch, nn_t, params["relation_network"], nn_t.Sigmoid())
    emb_lin = nn_t.Linear(fmp.EMB_DIM, 2335)
    emb_lin.weight.data = torch.tensor(np.asarray(params["embedding"]["w"]).T)
    emb_lin.bias.data = torch.tensor(np.asarray(params["embedding"]["b"]))
    emb = nn_t.Sequential(emb_lin, nn_t.LogSigmoid())
    featurizer = BatchGQABoxFeaturizer(featurizer_network=featurizer_net)
    oracle = ClassifierOracle(ont, attr_net, rel_net, emb, normalize=True, cached=cached)
    interp = BatchGQAInterpreter("m", oracle, ont, featurizer, cached=cached)
    interp.eval()

    rows, batch_index = [], []
    for b, n in enumerate(counts):
        rows.append(objs[b, :n])
        batch_index.extend([b] * n)
    obj_t = torch.tensor(np.concatenate(rows, 0))
    qsx = [dict(q, original_dict=None) for q in questions]
    collater = ProgramCollaterBase("select", "relate", "filter", split_num=1)
    pbs = collater.collate(qsx)
    md = {}
    if any("object_pairs" in q for q in questions):
        md["object_pairs"] = {
            "subject_id": [q.get("object_pairs", {}).get("subject_id", []) for q in questions],
            "object_id": [q.get("object_pairs", {}).get("object_id", []) for q in questions],
        }
    for pb in pbs:
        pb.create_sparse_tensors()
        pb._object_features = obj_t
        pb._object_batch_index = torch.tensor(np.asarray(batch_index, np.int64))
        pb._device = torch.device("cpu")
        pb._meta_data = md
    with torch.no_grad():
        return interp(pbs, is_training)


def _gen_supervision(ont, rng, terminal, counts):
    """Supervision questions honoring the REFERENCE's implicit contracts:
    object_attr groups must cover every object in order (GQAObjectAttrBatch
    reads the GLOBAL group counter as the global object column,
    batch_gqa_ops.py:799-820); object_rel pairs are unique per question
    (the reference scatter overwrites duplicates in list order)."""
    adjs = [t for t in ont._adjectives if t in ont._arg_to_idx]
    rels = [t for t in ont._relations if t in ont._arg_to_idx]
    out = []
    for b, n in enumerate(counts):
        base = {"imageId": f"pimg{b}", "question_id": f"sv{b}"}
        if terminal == "object_attr":
            groups, answers, weights = [], [], []
            for _o in range(n):  # one group per object, in order (contract)
                attrs = [str(a) for a in rng.choice(adjs, int(rng.integers(1, 3)),
                                                    replace=False)]
                groups.append(attrs)
                answers.append([str(rng.choice(["yes", "no"])) for _ in attrs])
                weights.extend([float(rng.uniform(0.5, 1.0)) for _ in attrs])
            base["program"] = {"branches": [], "last_op": {
                "operator": "object_attr", "arguments": [groups]}}
            base["answer"] = answers
            base["weights"] = weights
        elif terminal == "object_rel":
            k = int(rng.integers(1, min(4, n * (n - 1)) + 1))
            all_pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
            pick = rng.choice(len(all_pairs), k, replace=False)
            base["program"] = {"branches": [], "last_op": {
                "operator": "object_rel",
                "arguments": [[str(rng.choice(rels)) for _ in range(k)]]}}
            base["object_pairs"] = {
                "subject_id": [int(all_pairs[p][0]) for p in pick],
                "object_id": [int(all_pairs[p][1]) for p in pick],
            }
            base["answer"] = [str(rng.choice(["yes", "no"])) for _ in range(k)]
        else:  # scene
            k = int(rng.integers(1, min(4, n * (n - 1)) + 1))
            all_pairs = [(i, j) for i in range(n) for j in range(n) if i != j]
            pick = rng.choice(len(all_pairs), k, replace=False)
            base["program"] = {"branches": [], "last_op": {
                "operator": "scene", "arguments": []}}
            base["answer"] = []
            base["attribute_dict"] = {
                str(o): [(str(rng.choice(adjs)), float(rng.uniform(0.5, 1.0)))]
                for o in range(n)
            }
            base["object_pairs"] = {
                "subject_id": [int(all_pairs[p][0]) for p in pick],
                "object_id": [int(all_pairs[p][1]) for p in pick],
            }
            base["relation_list"] = [
                (str(rng.choice(rels)), float(rng.uniform(0.5, 1.0))) for _ in range(k)
            ]
        out.append(base)
    return out


def run_supervision_phase(ont, params, rng, per_op, batch, report):
    """Direct-supervision terminals (object_attr / object_rel / scene) vs
    the reference with shared weights. Agreement = thresholded statement
    predictions (exp(lp) > 0.5) equal on every statement."""
    total_match = total_n = 0
    for term in ("object_attr", "object_rel", "scene"):
        agree = n = 0
        lp_deltas = []
        failed = None
        n_batches = max(1, per_op // batch)
        for bi in range(n_batches):
            counts = [int(rng.integers(2, fmp.O_PAD + 1)) for _ in range(batch)]
            qs = _gen_supervision(ont, rng, term, counts)
            objs, mask = fmp.make_scene(rng, counts)
            cached = term != "scene"  # reference scene op breaks with cache
            is_training = term != "object_attr"  # object_rel eval leg broken
            try:
                ref = run_reference_supervision(
                    params, qs, objs, mask, counts, cached=cached,
                    is_training=is_training,
                )
            except Exception as e:
                failed = f"reference failed: {e}"
                break
            spec, cb, ours = fmp.run_ours(ont, params, qs, objs, mask)
            if term == "scene":
                a = np.asarray(ours["log_probability"]["attr"])
                r = np.asarray(ours["log_probability"]["rel"])
                attr_ref = ref["log_probability"][0].detach().numpy().reshape(-1, a.shape[-1])
                rel_ref = ref["log_probability"][1].detach().numpy().reshape(-1, r.shape[-1])
                ours_attr = np.concatenate([a[qi, : counts[qi]] for qi in range(len(qs))], 0)
                ours_rel = np.concatenate(
                    [r[qi, : len(qs[qi]["relation_list"])] for qi in range(len(qs))], 0
                )
                lp_deltas.append(max(
                    float(np.max(np.abs(ours_attr - attr_ref))),
                    float(np.max(np.abs(ours_rel - rel_ref))),
                ))
                for o, rr in ((ours_attr, attr_ref), (ours_rel, rel_ref)):
                    agree += int(np.array_equal(np.exp(o) > 0.5, np.exp(rr) > 0.5))
                    n += 1
            else:
                lp = np.asarray(ours["log_probability"])
                ref_lp = ref["log_probability"].detach().numpy().flatten()
                flat = []
                for qi, q in enumerate(qs):
                    if term == "object_attr":
                        k = sum(len(g) for g in q["program"]["last_op"]["arguments"][0])
                    else:
                        k = len(q["program"]["last_op"]["arguments"][0])
                    flat.extend(lp[qi, :k])
                flat = np.asarray(flat)
                lp_deltas.append(float(np.max(np.abs(flat - ref_lp))))
                agree += int(np.array_equal(np.exp(flat) > 0.5, np.exp(ref_lp) > 0.5))
                n += 1
                if term == "object_attr":  # eval leg: compare answer strings
                    mine = ["yes" if v else "no" for v in (np.exp(flat) > 0.5)]
                    theirs = [str(a[0]) for a in ref["answer"]]
                    agree += int(mine == theirs)
                    n += 1
        report[f"supervision_{term}"] = (
            {"error": failed}
            if failed
            else {
                "statement_batches": n,
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


def run_serving_phase(ont, rng, per_op, batch, report):
    """ServingEngine.submit vs the offline executor, same weights, the same
    fuzz corpus (VERDICT r3 item 10): the engine's request canonicalization
    (spec zeroing, seg/fill/batch ladders, pad rows) must NEVER change an
    answer. Legs: F=1, trainable F=4, calibrated."""
    from dfol_vqa_tpu.data.dataset import ProgramDataset
    from dfol_vqa_tpu.data.features import SyntheticFeatures
    from dfol_vqa_tpu.data.loader import BatchLoader
    from dfol_vqa_tpu.models.interpreter import decode_answer_flags
    from dfol_vqa_tpu.serve import ServingEngine

    legs = {
        "f1": {},
        "f4_trainable": dict(oracle_output_dim=4, operator_layers_config=[8]),
        "calibrated": dict(activate_attention_transfer=True,
                           freeze_attention_network=False),
    }
    section = {}
    total_match = total_n = 0
    for leg, overrides in legs.items():
        cfg = fmp.tiny_cfg()
        for k, v in overrides.items():
            setattr(cfg, k, v)
        interp = Interpreter(cfg, ont)
        params = interp.init_params(jax.random.PRNGKey(17))
        # jitter all weights so zero-init subtrees (residual operator
        # modules, calibrator output head) are ACTIVE in the comparison
        jit_key = jax.random.PRNGKey(5)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jit_key, len(leaves))
        leaves = [
            x + 0.05 * jax.random.normal(k, x.shape, x.dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x
            for x, k in zip(leaves, keys)
        ]
        params = jax.tree_util.tree_unflatten(treedef, leaves)

        feats = SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=3,
                                  max_objects=cfg.tpu.max_object_num, seed=3)
        compiler = ProgramCompiler(
            ont, object_num=cfg.tpu.max_object_num, rel_slots=cfg.tpu.rel_table_size
        )
        eng = ServingEngine(cfg, ont, params, features=feats, max_batch=8,
                            max_delay_ms=2.0)
        agree = n = 0
        mismatches = []
        for term in TERMS:
            for length in (1, 2):
                qs = synth_questions(ont, rng, term, max(per_op // 2, 2), length)
                loader = BatchLoader(
                    [ProgramDataset(qs, ont)], compiler, feats, batch,
                    cfg.tpu.max_object_num, shuffle=False, prefetch=0,
                )
                offline = {}
                for b in loader:
                    step = interp.step(b.spec, is_training=False)
                    out = step(
                        params, jnp.asarray(b.objects), jnp.asarray(b.obj_mask),
                        {k: jnp.asarray(v) for k, v in b.arrays.items()}, None,
                    )
                    answers = decode_answer_flags(out["answer_flags"], b.spec, b.compiled)
                    for qi, qid in enumerate(b.compiled.question_ids):
                        if b.compiled.question_mask[qi]:
                            offline[qid] = [str(a) for a in answers[qi]]
                results = eng.answer_many(qs)
                for q, r in zip(qs, results):
                    ok = [str(a) for a in r.answers] == offline[q["question_id"]]
                    agree += int(ok)
                    n += 1
                    if not ok and len(mismatches) < 5:
                        mismatches.append(
                            {"term": term, "qid": q["question_id"],
                             "serving": list(r.answers),
                             "offline": offline[q["question_id"]]}
                        )
        stats = dict(eng.stats)
        eng.stop()
        section[leg] = {
            "questions": n,
            "answer_agreement": agree / max(n, 1),
            "serve_compiled_steps": stats["compiled_steps"],
        }
        if mismatches:
            section[leg]["mismatches_sample"] = mismatches
        total_match += agree
        total_n += n
    report["serving"] = section
    return total_match, total_n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-op", type=int, default=330)
    ap.add_argument("--calib-per-op", type=int, default=150)
    ap.add_argument("--serving-per-op", type=int, default=48)
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
    m3, n3 = run_hard_phase(ont, params, rng, args.per_op // 2, args.batch, report)
    m4, n4 = run_supervision_phase(ont, params, rng, args.per_op // 4, args.batch, report)
    m5, n5 = run_serving_phase(ont, rng, args.serving_per_op, args.batch, report)

    report["_overall"] = {
        "questions": n1 + n2 + n3 + n4 + n5,
        "answer_agreement": (m1 + m2 + m3 + m4 + m5)
        / max(n1 + n2 + n3 + n4 + n5, 1),
        "fuzz": "lengths 1-3, neg_prob 0.15, wildcard_prob 0.1, ragged options; "
                "hard_mode eval legs (13 terminals x lengths 1-2); supervision "
                "terminals object_attr/object_rel/scene (full coverage: "
                "16/16 terminals x {soft, hard}); serving-engine-vs-offline "
                "legs (f1 / trainable f4 / calibrated) over 13 terminals x "
                "lengths 1-2",
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
