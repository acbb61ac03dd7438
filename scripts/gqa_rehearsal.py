"""Real-GQA day-1 rehearsal: official-format questions -> submission JSON.

One command exercises the ENTIRE first-day-with-the-dataset flow on
reference-format fixtures (VERDICT r3 missing #1), mirroring the reference
pipeline `gqa_preprocess.py:365-398` -> `gqa_interpreter_experiments.py:
266-283 -p -u`:

  1. fixture: official GQA questions JSON (dict qid -> {semantic, answer,
     imageId}) + official objects HDF5 chunk files + gqa_objects_info.json,
     generated from a planted world so ground-truth answers are exact;
  2. `python -m dfol_vqa_tpu.compiler.preprocess_cli <questions> <out> -b`
     (program JSON-lines segregated by terminal op, then int-coded H5);
  3. program verification (GQAProgramVerifier) over every emitted program;
  4. curriculum stage-0 style training from the H5 program files + official
     objects H5 (`python -m dfol_vqa_tpu.experiments.gqa_experiment cfg -c`);
  5. predict + GQA submission JSON (`-t -p -u -l best -c`);
  6. format + accuracy asserts; every stage's outputs hashed into
     GQA_REHEARSAL_r05.json.

Run:  python scripts/gqa_rehearsal.py [--out GQA_REHEARSAL_r05.json]
      (CPU-only, ~10-20 min incl. XLA compiles; --fast shrinks everything)
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# preprocess/fixture stages never touch jax; the train/predict stages run in
# subprocesses with their own (CPU-pinned) jax. Pin here too for safety.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")


def sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def file_record(path: str) -> dict:
    rec = {"path": os.path.relpath(path, REPO) if path.startswith(REPO) else path,
           "sha256": sha256(path), "bytes": os.path.getsize(path)}
    if path.endswith(".h5"):
        import h5py

        with h5py.File(path, "r") as f:
            rec["shapes"] = {k: list(f[k].shape) for k in f.keys()}
    return rec


def run_stage(name: str, cmd: list, env=None, timeout=3600) -> dict:
    t0 = time.time()
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env,
                          timeout=timeout, cwd=REPO)
    rec = {"stage": name, "cmd": " ".join(cmd), "rc": proc.returncode,
           "seconds": round(time.time() - t0, 1)}
    if proc.returncode != 0:
        rec["stderr_tail"] = proc.stderr[-3000:]
        raise RuntimeError(f"stage {name} failed rc={proc.returncode}:\n"
                           f"{proc.stderr[-3000:]}")
    return rec


# --------------------------------------------------------------- fixture gen

# Inverse comparative map for the `compare` terminal: official GQA spells
# comparisons as "choose <comparative>" op names (op_map, reference
# gqa_preprocess.py:348-361 strips the -er / resolves more/less). Only
# attributes whose comparative is an op_map key are invertible to official
# format; (token, is_less) -> official operation string.
_COMPARE_INVERSE = {
    ("small", False): "choose smaller",
    ("tall", False): "choose taller",
    ("short", False): "choose shorter",
    ("long", False): "choose longer",
    ("high", False): "choose higher",
    ("low", False): "choose lower",
    ("young", False): "choose younger",
    ("old", False): "choose older",
    ("healthy", False): "choose healthier",
    ("healthy", True): "choose less healthy",
}
# official two_same / two_different op names are category-specific keys
_TWO_SAME_CATS = ("color", "material", "shape")
_TWO_DIFF_CATS = ("color", "shape")


def to_semantic(world, q: dict) -> list:
    """Program-format planted question -> official GQA `semantic` list
    (inverse of the preprocessor's parse path, gqa_preprocess.py:292-361),
    for ALL 13 servable terminal families incl. the multi-branch logical /
    comparison forms (their branch tails grow the exist/verify ops that
    `_fix_logical_branches` strips back off)."""
    sem = []

    def emit_branch(branch) -> int:
        prev = -1
        for op in branch:
            o, args = op["operator"], op["arguments"]
            if o == "select":
                sem.append({"operation": "select", "argument": f"{args[0]} (1)",
                            "dependencies": []})
            elif o == "filter":
                # bare "filter" is a valid op_map key; category-suffixed
                # forms ("filter color") parse identically
                sem.append({"operation": "filter", "argument": args[0],
                            "dependencies": [prev]})
            elif o == "relate":
                rel, is_subject, aux = args
                marker = "s" if is_subject else "o"
                sem.append({"operation": "relate",
                            "argument": f"{aux},{rel},{marker} (2)",
                            "dependencies": [prev]})
            else:
                raise ValueError(o)
            prev = len(sem) - 1
        return prev

    branches = q["program"]["branches"]
    last = q["program"]["last_op"]
    lo, largs = last["operator"], last["arguments"]

    if lo in ("and", "or"):
        # official form: each branch ends in its own `exist`, the logical op
        # depends on the two exists (preprocess drops the tails again)
        ends = []
        for br in branches:
            p = emit_branch(br)
            sem.append({"operation": "exist", "argument": "?",
                        "dependencies": [p]})
            ends.append(len(sem) - 1)
        sem.append({"operation": lo, "argument": "?", "dependencies": ends})
        return sem
    if lo in ("two_same", "two_different"):
        cat = largs[0]
        word = "same" if lo == "two_same" else "different"
        p1 = emit_branch(branches[0])
        p2 = emit_branch(branches[1])
        sem.append({"operation": f"{word} {cat}", "argument": "?",
                    "dependencies": [p1, p2]})
        return sem
    if lo == "compare":
        tok, is_less = largs
        op_name = _COMPARE_INVERSE[(tok, bool(is_less))]
        p1 = emit_branch(branches[0])
        p2 = emit_branch(branches[1])
        sem.append({"operation": op_name, "argument": "?",
                    "dependencies": [p1, p2]})
        return sem

    prev = emit_branch(branches[0])
    if lo == "exist":
        sem.append({"operation": "exist", "argument": "?", "dependencies": [prev]})
    elif lo == "query_attr":
        sem.append({"operation": "query", "argument": largs[0],
                    "dependencies": [prev]})
    elif lo == "verify_attrs":
        attrs = largs[0]
        if len(attrs) == 1:
            sem.append({"operation": "verify", "argument": attrs[0],
                        "dependencies": [prev]})
        else:
            # official: one verify per attribute off the same trace + `and`;
            # the preprocessor's _combine_verify folds them back together
            idx = []
            for a in attrs:
                sem.append({"operation": "verify", "argument": a,
                            "dependencies": [prev]})
                idx.append(len(sem) - 1)
            sem.append({"operation": "and", "argument": "?",
                        "dependencies": idx[:2]})
    elif lo == "verify_rel":
        rel, is_subject, aux = largs
        marker = "s" if is_subject else "o"
        sem.append({"operation": "verify rel",
                    "argument": f"{aux},{rel},{marker} (2)",
                    "dependencies": [prev]})
    elif lo == "choose_attr":
        pair = largs[0]
        sem.append({"operation": "choose", "argument": "|".join(pair),
                    "dependencies": [prev]})
    elif lo == "choose_rel":
        rels, is_subject, aux = largs
        marker = "s" if is_subject else "o"
        sem.append({"operation": "choose rel",
                    "argument": f"{aux},{'|'.join(rels)},{marker} (2)",
                    "dependencies": [prev]})
    elif lo in ("all_same", "all_different"):
        word = "same" if lo == "all_same" else "different"
        sem.append({"operation": word, "argument": largs[0],
                    "dependencies": [prev]})
    else:
        raise ValueError(lo)
    return sem


def generate_invertible(world, fam: str, n: int, **kw) -> list:
    """generate_family, post-filtered to questions whose official `semantic`
    form round-trips (two_same/two_different categories and comparatives are
    constrained by the official op vocabulary — see the maps above)."""
    out = []
    seed = kw.pop("seed", 0)
    for attempt in range(40):
        qs = world.generate_family(fam, n, seed=seed + 1000 * attempt, **kw)
        for q in qs:
            largs = q["program"]["last_op"]["arguments"]
            if fam == "compare" and (largs[0], bool(largs[1])) not in _COMPARE_INVERSE:
                continue
            if fam == "two_same" and largs[0] not in _TWO_SAME_CATS:
                continue
            if fam == "two_different" and largs[0] not in _TWO_DIFF_CATS:
                continue
            q = dict(q)
            q["question_id"] = f"{kw.get('id_prefix', 'pf')}{len(out)}"
            out.append(q)
            if len(out) == n:
                return out
    raise RuntimeError(f"generate_invertible({fam}): only {len(out)}/{n}")


ALL_FAMS = (
    "exist", "verify_attrs", "verify_rel", "query_attr", "choose_attr",
    "choose_rel", "and", "or", "two_same", "two_different",
    "all_same", "all_different", "compare",
)
# short unambiguous per-family question-id prefixes (per split)
FAM_TAG = {f: f"f{i:02d}" for i, f in enumerate(ALL_FAMS)}


def build_fixture(work: str, fast: bool) -> dict:
    from dfol_vqa_tpu.data.planted import PlantedWorld
    from dfol_vqa_tpu.ontology import GQAOntology

    ont = GQAOntology()
    box_dim = 48
    world = PlantedWorld(ont, box_dim=box_dim, n_nouns=6, n_attrs=6,
                         n_images=32 if fast else 64, min_objects=4,
                         max_objects=10, noise=0.15, seed=11,
                         image_id_space="vocab")

    n_tr_exist = 64 if fast else 192
    n_tr_fam = 12 if fast else 48
    n_eval_fam = 4 if fast else 12

    def family_mix(split: str, n_per: int, seed: int, image_slice):
        lists = []
        for fi, fam in enumerate(ALL_FAMS):
            lists.append(generate_invertible(
                world, fam, n_per, length=1, seed=seed + 10 * fi,
                image_slice=image_slice,
                id_prefix=f"{split[:2]}{FAM_TAG[fam]}-"))
        return lists

    splits = {
        # stage-0 file: exist only (the reference's cur0 family set)
        "train0": (generate_invertible(
            world, "exist", n_tr_exist, length=1, seed=1,
            image_slice=(0.0, 0.7), id_prefix="t0f00-"),),
        # full-curriculum file: every terminal family
        "train": tuple(family_mix("train", n_tr_fam, 100, (0.0, 0.7))),
        "val": tuple(family_mix("val", n_eval_fam, 200, (0.7, 0.85))),
        "test": tuple(family_mix("test", n_eval_fam, 300, (0.85, 1.0))),
    }

    q_files, answers = {}, {}
    for split, family_lists in splits.items():
        official = {}
        for qs in family_lists:
            for q in qs:
                qid = q["question_id"]
                official[qid] = {
                    "semantic": to_semantic(world, q),
                    "answer": q["answer"],
                    "imageId": q["imageId"],
                    "fullAnswer": q["answer"],
                    "question": f"(rehearsal fixture {qid})",
                }
                answers[qid] = q["answer"]
        path = os.path.join(work, f"rehearsal_{split}.json")
        with open(path, "w") as f:
            json.dump(official, f)
        q_files[split] = path

    # official objects HDF5: features (N, O_max, D) + bboxes x1y1x2y2 over
    # 2 chunk files + info JSON (batch_gqa_boxfeatures_pipeline.py:26-73 shape)
    obj_dir = os.path.join(work, "objects")
    os.makedirs(obj_dir, exist_ok=True)
    import h5py

    ids = world.image_ids
    O_max = 12
    chunk_num = 2
    per = (len(ids) + chunk_num - 1) // chunk_num
    info = {}
    for c in range(chunk_num):
        chunk_ids = ids[c * per:(c + 1) * per]
        feats = np.zeros((len(chunk_ids), O_max, box_dim), np.float32)
        bboxes = np.zeros((len(chunk_ids), O_max, 4), np.float32)
        for i, im in enumerate(chunk_ids):
            row, n = world.image(im)
            n = min(n, O_max)
            feats[i, :n] = row[:n, :box_dim]
            x, y = row[:n, box_dim + 2], row[:n, box_dim + 3]
            w, h = row[:n, box_dim + 4], row[:n, box_dim + 5]
            bboxes[i, :n] = np.stack([x, y, x + w, y + h], axis=1)
            info[im] = {"file": c, "idx": i, "objectsNum": int(n),
                        "width": 640, "height": 480}
        with h5py.File(os.path.join(obj_dir, f"gqa_objects_{c}.h5"), "w") as f:
            f.create_dataset("features", data=feats)
            f.create_dataset("bboxes", data=bboxes)
    info_path = os.path.join(obj_dir, "gqa_objects_info.json")
    with open(info_path, "w") as f:
        json.dump(info, f)

    return {"q_files": q_files, "obj_dir": obj_dir, "info_path": info_path,
            "answers": answers, "box_dim": box_dim, "n_images": len(ids)}


def verify_programs(path_dir: str) -> dict:
    from dfol_vqa_tpu.compiler.verifier import GQAProgramVerifier
    from dfol_vqa_tpu.ontology import GQAOntology

    v = GQAProgramVerifier(GQAOntology())
    n = 0
    for root, _, files in os.walk(path_dir):
        for fn in files:
            if not fn.endswith(".json"):
                continue
            with open(os.path.join(root, fn)) as f:
                for line in f:
                    if line.strip():
                        v.verify(json.loads(line)["program"])
                        n += 1
    return {"stage": "verify_programs", "programs_verified": n, "rc": 0}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "GQA_REHEARSAL_r05.json"))
    ap.add_argument("--fast", action="store_true", help="tiny dims (test tier)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()

    work = args.workdir or tempfile.mkdtemp(prefix="gqa_rehearsal_")
    os.makedirs(work, exist_ok=True)
    report = {"workdir": work, "fast": bool(args.fast), "stages": []}
    t_start = time.time()

    # ---- stage 1: fixture ------------------------------------------------
    t0 = time.time()
    fx = build_fixture(work, args.fast)
    report["stages"].append({
        "stage": "fixture", "rc": 0, "seconds": round(time.time() - t0, 1),
        "n_images": fx["n_images"],
        "outputs": [file_record(p) for p in list(fx["q_files"].values())
                    + sorted(os.path.join(fx["obj_dir"], f)
                             for f in os.listdir(fx["obj_dir"]))],
    })

    # ---- stage 2: preprocess CLI (JSON -> programs -> H5) ----------------
    env = dict(os.environ)
    pp_out = {}
    for split, qf in fx["q_files"].items():
        out_dir = os.path.join(work, f"pp_{split}")
        os.makedirs(out_dir, exist_ok=True)
        rec = run_stage(
            f"preprocess_{split}",
            [sys.executable, "-m", "dfol_vqa_tpu.compiler.preprocess_cli",
             qf, out_dir, "-b"],
            env=env,
        )
        name = os.path.splitext(os.path.basename(qf))[0]
        pp_out[split] = {"json_dir": os.path.join(out_dir, "p_" + name),
                         "h5_dir": os.path.join(out_dir, "h5_" + name)}
        rec["outputs"] = [
            file_record(os.path.join(d, f))
            for d in pp_out[split].values()
            for f in sorted(os.listdir(d))
        ]
        report["stages"].append(rec)

    # ---- stage 3: verify every emitted program ---------------------------
    n_ver = 0
    for split in pp_out:
        r = verify_programs(pp_out[split]["json_dir"])
        n_ver += r["programs_verified"]
    report["stages"].append({"stage": "verify_programs", "rc": 0,
                             "programs_verified": n_ver})

    # ---- stage 4: curriculum chain over the official-format artifacts ----
    # stage0 (exist only) -> stage1 (all 13 families, -l best forwarding,
    # with a mid-stage interrupt + `-l last` RESUME leg) -> stage2
    # (calibrator on a frozen oracle: the reference's stages 6-7 mechanism —
    # strict=False restore leaves the absent calibrator params at init,
    # base_experiment.py:54-64 + trainer.py:411-423).
    import shutil

    import yaml

    run_dir = os.path.join(work, "runs")
    e0 = args.epochs if args.epochs is not None else (2 if args.fast else 16)
    e1a = max(1, e0 // 2)  # stage-1 part A (then interrupt + resume)
    e1b = e0
    e2 = max(2, e0 // 2)

    base_cfg = {
        "model_name": "rehearsal",
        "validation_path": pp_out["val"]["h5_dir"],
        "test_path": pp_out["test"]["h5_dir"],
        "train_object_path": fx["obj_dir"],
        "train_object_info_path": fx["info_path"],
        "h5_prefix": "gqa_objects", "h5_chunk_num": 2,
        "model_path": run_dir,
        "repetition_num": 1,
        "train_batch_size": 32, "test_batch_size": 32,
        "ckeckpointing_frequency": 1000,
        "learning_rate": 2e-3, "weight_decay": 1e-10, "dropout": 0.0,
        "clip_norm": 5.0,
        "box_features_dim": fx["box_dim"],
        "oracle_input_dim": 64, "oracle_output_dim": 1,
        "word_embedding_dim": 300,
        "classifier_oracle": True,
        "featurizer_layers_config": [],
        "attribute_network_layers_config": [48],
        "relation_network_layers_config": [48],
        "operator_layers_config": [],
        "normalize_oracle": True,
        "activate_attention_transfer": False,
        "attention_transfer_state_dim": 32,
        "first_answer": True, "verbose": True,
        "tpu": {"max_object_num": 12, "rel_table_size": 4,
                "train_chunk": 2, "eval_chunk": 2, "use_pallas": False},
    }

    def ver_dir(version):
        return os.path.join(run_dir, "rehearsal", version)

    def read_step(version, name="last"):
        p = os.path.join(ver_dir(version), name, "rehearsal.npz")
        return int(np.load(p)["__global_step__"]) if os.path.exists(p) else None

    def train_run(stage_name, version, train_dir, epochs, extra=None,
                  flags=()):
        cfg = dict(base_cfg)
        cfg.update(extra or {})
        cfg.update(version=version, train_path=train_dir, epoch_num=epochs)
        cfg_path = os.path.join(work, f"rehearsal_{stage_name}.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        rec = run_stage(
            stage_name,
            [sys.executable, "-m", "dfol_vqa_tpu.experiments.gqa_experiment",
             cfg_path, "-c", "-s", "0", *flags],
            env=env, timeout=7200,
        )
        rec["global_step_last"] = read_step(version)
        return cfg_path, rec

    def forward_best(src_ver, dst_ver):
        """-l best forwarding between stages (reference README.md:77-100)."""
        dst = os.path.join(ver_dir(dst_ver), "best")
        if not os.path.isdir(dst):
            shutil.copytree(os.path.join(ver_dir(src_ver), "best"), dst)

    # stage 0: exist only, fresh params
    _, rec = train_run("train_stage0", "stage0", pp_out["train0"]["h5_dir"], e0)
    best_ckpt = os.path.join(ver_dir("stage0"), "best")
    rec["outputs"] = [file_record(os.path.join(best_ckpt, f))
                      for f in sorted(os.listdir(best_ckpt))]
    report["stages"].append(rec)

    # stage 1 part A: all families, seeded from stage-0 best
    forward_best("stage0", "stage1")
    _, rec_a = train_run("train_stage1a", "stage1", pp_out["train"]["h5_dir"],
                         e1a, flags=("-l", "best"))
    step_a = rec_a["global_step_last"]
    report["stages"].append(rec_a)

    # stage 1 part B: RESUME mid-stage from the `last` checkpoint (-l last);
    # the global step must continue, not restart
    _, rec_b = train_run("train_stage1b", "stage1", pp_out["train"]["h5_dir"],
                         e1b, flags=("-l", "last"))
    step_b = rec_b["global_step_last"]
    rec_b["resume"] = {"step_before": step_a, "step_after": step_b}
    report["stages"].append(rec_b)
    assert step_a and step_b and step_b > step_a, (
        f"resume leg did not continue the global step: {step_a} -> {step_b}")

    # stage 2: attention-transfer calibrator on a FROZEN oracle (stages 6-7
    # analog). The stage-1 checkpoint has no calibrator params: loading it
    # into the calibrator-active model exercises the strict=False partial
    # restore (absent keys keep their init) the reference relies on.
    forward_best("stage1", "stage2")
    cal_cfg = {
        "activate_attention_transfer": True,
        "freeze_featurizer": True,
        "freeze_attribute_network": True,
        "freeze_relation_network": True,
        "freeze_embedding_network": True,
        "learning_rate": 1e-3,
    }
    cfg_path2, rec = train_run("train_stage2_calibrator", "stage2",
                               pp_out["train"]["h5_dir"], e2,
                               extra=cal_cfg, flags=("-l", "best", "-r"))
    report["stages"].append(rec)

    # ---- stage 5: predict + submission JSON (-t -p -u -l best) -----------
    # predict from the program JSON-lines dir (carries question ids; the H5
    # rows are id-less by the reference's own encoding)
    cfg = dict(base_cfg)
    cfg.update(cal_cfg)
    cfg.update(version="stage2", train_path=pp_out["train"]["h5_dir"],
               epoch_num=e2, test_path=pp_out["test"]["json_dir"])
    with open(cfg_path2, "w") as f:
        yaml.safe_dump(cfg, f)
    rec = run_stage(
        "predict_submission",
        [sys.executable, "-m", "dfol_vqa_tpu.experiments.gqa_experiment",
         cfg_path2, "-c", "-t", "-p", "-u", "-l", "best"],
        env=env, timeout=7200,
    )
    pred_dir = os.path.join(run_dir, "predictions", "rehearsal", "stage2")
    pred_files = [os.path.join(pred_dir, f) for f in sorted(os.listdir(pred_dir))]
    rec["outputs"] = [file_record(p) for p in pred_files]
    report["stages"].append(rec)

    # ---- stage 6: submission format + per-family accuracy ----------------
    with open(pred_files[0]) as f:
        submission = json.load(f)
    assert isinstance(submission, list) and submission, "submission must be a list"
    for entry in submission:
        assert set(entry.keys()) == {"questionId", "prediction"}, entry
        assert isinstance(entry["questionId"], str) and entry["questionId"]
        assert isinstance(entry["prediction"], str)
    answers = fx["answers"]
    tag_to_fam = {f"te{v}": k for k, v in FAM_TAG.items()}
    fam_hits = {f: [0, 0] for f in ALL_FAMS}
    all_hits = 0
    for entry in submission:
        ok = answers.get(entry["questionId"]) == entry["prediction"]
        all_hits += ok
        fam = tag_to_fam.get(entry["questionId"][:5])
        if fam is not None:
            fam_hits[fam][0] += ok
            fam_hits[fam][1] += 1
    per_family = {f: round(h / max(n, 1), 4) for f, (h, n) in fam_hits.items()}
    overall = all_hits / len(submission)
    exist_acc = per_family["exist"]
    assert all(n > 0 for _, n in fam_hits.values()), (
        f"family missing from submission: {fam_hits}")
    report["stages"].append({
        "stage": "submission_check", "rc": 0,
        "n_predictions": len(submission),
        "exist_accuracy": exist_acc,
        "overall_accuracy": round(overall, 4),
        "per_family_accuracy": per_family,
    })
    if not args.fast:  # --fast is a plumbing smoke: 2 epochs on 12
        # questions/family cannot train to the gate; the full run must
        assert exist_acc >= 0.6, f"exist accuracy too low: {exist_acc}"
        assert overall >= 0.5, f"overall accuracy too low: {overall}"

    report["ok"] = True
    report["resume_leg"] = {"step_before": step_a, "step_after": step_b}
    report["total_seconds"] = round(time.time() - t_start, 1)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({"ok": True, "out": args.out,
                      "exist_accuracy": exist_acc,
                      "overall_accuracy": round(overall, 4),
                      "per_family_accuracy": per_family,
                      "resume_leg": report["resume_leg"],
                      "stages": [s["stage"] for s in report["stages"]],
                      "total_seconds": report["total_seconds"]}))


if __name__ == "__main__":
    main()
