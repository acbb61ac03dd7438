"""Run the reference's 8-stage curriculum end-to-end on the planted world.

Replicates the training recipe of /root/reference/README.md:77-100 — the
same stage family sets, Train-All vs Train-Balanced alternation, -l best
checkpoint forwarding, and calibrator-on-frozen-oracle stages 6-7 — using
the shipped stage configs (configs/curriculum_training/cur*.yaml) with
planted-world data (exact ground-truth answers, held-out scenes), since the
GQA download is not available in this environment.

Produces CURRICULUM_r02.json: per-stage accuracy on a FIXED full test set
(all 13 terminal families, unseen scenes), demonstrating the monotone
curriculum trajectory and the calibrator stages' gain over stage 5.

Usage:
    python scripts/curriculum_run.py [--noise 0.35] [--scale 1.0] \
        [--out /tmp/curriculum] [--json CURRICULUM_r02.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
import zlib

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Curriculum family sets (reference README.md:88-96)
T1 = ["exist"]
T2 = T1 + ["verify_attrs", "query_attr", "choose_attr"]
T3 = T2 + ["choose_rel", "verify_rel", "and", "or", "two_different", "two_same"]
T4 = T3 + ["compare", "all_same", "all_different"]

STAGES = [
    dict(i=0, fams=T1, lens=(0, 1), split="all", epochs=60, lr=3e-3),
    dict(i=1, fams=T2, lens=(0, 1), split="all", epochs=30, lr=3e-3),
    dict(i=2, fams=T3, lens=(0, 1), split="all", epochs=18, lr=3e-3),
    dict(i=3, fams=T4, lens=(0, 1), split="bal", epochs=14, lr=1.5e-3),
    dict(i=4, fams=T4, lens=(0, 1, 2), split="all", epochs=12, lr=1.5e-3),
    dict(i=5, fams=T4, lens=(0, 1, 2), split="bal", epochs=10, lr=1e-3),
    dict(i=6, fams=T4, lens=(0, 1, 2), split="all", epochs=12, lr=3e-3),
    dict(i=7, fams=T4, lens=(0, 1, 2), split="bal", epochs=8, lr=1e-3),
]

MODEL_NAME = "classifier-direct-ll"


def write_datasets(world, ontology, root: str, scale: float):
    """Master split dirs: train-all / train-balanced / val / test h5 files
    per (family, length); scenes are disjoint between train and val/test."""
    from dfol_vqa_tpu.compiler.h5_codec import ProgramH5Codec

    codec = ProgramH5Codec(ontology)
    counts = {"all": int(500 * scale), "bal": int(320 * scale),
              "val": int(96 * scale), "test": int(128 * scale)}
    slices = {"all": (0.0, 0.85), "bal": (0.0, 0.85),
              "val": (0.85, 0.925), "test": (0.925, 1.0)}
    balanced = {"all": False, "bal": True, "val": True, "test": True}
    made = {}
    for split in counts:
        d = os.path.join(root, f"data_{split}")
        os.makedirs(d, exist_ok=True)
        for fam in T4:
            for L in (0, 1, 2):
                qs = world.generate_family(
                    fam, counts[split], length=L,
                    # deterministic across processes (builtin hash is
                    # PYTHONHASHSEED-randomised)
                    seed=zlib.crc32(f"{split}/{fam}/{L}".encode()) % (2**31),
                    balanced=balanced[split], image_slice=slices[split],
                    id_prefix=f"{split}_{fam}_{L}_",
                )
                path = os.path.join(d, f"p_{split}_{fam}_{L}.h5")
                codec.write_h5(qs, path)
                made[(split, fam, L)] = path
    return made


def stage_dir(root, name, files):
    d = os.path.join(root, name)
    os.makedirs(d, exist_ok=True)
    for f in files:
        dst = os.path.join(d, os.path.basename(f))
        if not os.path.exists(dst):
            os.symlink(os.path.abspath(f), dst)
    return d


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--scale", type=float, default=1.0,
                    help="dataset size multiplier (0.25 for a quick pilot)")
    ap.add_argument("--epoch-scale", type=float, default=1.0)
    ap.add_argument("--out", default="/tmp/curriculum_run")
    ap.add_argument("--json", default=None, help="artifact output path")
    ap.add_argument("--stages", default=None, help="comma list, e.g. 0,1,2")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jit-cache", default="/tmp/dfol_jit_cache",
                    help="persistent XLA compilation cache dir (shareable "
                         "across runs; compiled code depends only on specs)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default JAX backend (TPU if present); "
                         "default forces CPU for a deterministic, tunnel-free run")
    ap.add_argument("--stage-lr", default=None,
                    help="per-stage LR overrides, e.g. '6:1e-3,7:5e-4' "
                         "(stage-6 stressed-regime investigation)")
    ap.add_argument("--resume", action="store_true",
                    help="parent mode: skip stages whose stage_N.json already "
                         "exists in --out (crash recovery; checkpoints and "
                         "datasets are reused from the interrupted run)")
    args = ap.parse_args(argv)

    if not args.tpu:
        # all three are needed — the axon TPU plugin ignores JAX_PLATFORMS
        # alone (same recipe as tests/conftest.py)
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")

    # share compiled executables across the per-stage subprocesses: the
    # eval buckets (and most train buckets) have identical specs in every
    # stage, so a persistent cache turns 8x repeated XLA compiles into one
    import jax as _jax

    _jax.config.update("jax_compilation_cache_dir", args.jit_cache)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from dfol_vqa_tpu.data.planted import PlantedWorld
    from dfol_vqa_tpu.experiments.experiment import GQAObjectBoxExperiment
    from dfol_vqa_tpu.ontology import GQAOntology
    from dfol_vqa_tpu.train.trainer import OP_INDEX

    class PlantedCurriculumExperiment(GQAObjectBoxExperiment):
        def __init__(self, world):
            self._world = world

        def build_features(self, cfg, logger):
            return self._world

    root = args.out
    os.makedirs(root, exist_ok=True)
    ontology = GQAOntology()
    world = PlantedWorld(
        ontology, box_dim=32, n_nouns=6, n_attrs=9, n_images=512,
        min_objects=3, max_objects=8, noise=args.noise, seed=args.seed,
        image_id_space="vocab",
    )
    print(f"[curriculum] planted world: nouns={world.nouns} "
          f"categories={world.categories} noise={args.noise}", flush=True)

    t0 = time.time()
    marker = os.path.join(root, ".datasets_done")
    stamp = f"scale={args.scale} noise={args.noise} seed={args.seed}"
    if os.path.exists(marker) and open(marker).read() != stamp:
        raise SystemExit(
            f"{root} holds datasets for '{open(marker).read()}' but this run "
            f"wants '{stamp}' — use a fresh --out dir"
        )
    if os.path.exists(marker):
        # deterministic path map — datasets were written by a previous
        # invocation with the same args (subprocess-per-stage mode)
        made = {
            (split, fam, L): os.path.join(root, f"data_{split}",
                                          f"p_{split}_{fam}_{L}.h5")
            for split in ("all", "bal", "val", "test")
            for fam in T4 for L in (0, 1, 2)
        }
    else:
        made = write_datasets(world, ontology, root, args.scale)
        with open(marker, "w") as f:
            f.write(stamp)
        print(f"[curriculum] datasets written in {time.time()-t0:.1f}s", flush=True)

    # fixed full test set: all families, all lengths, unseen scenes
    test_dir = stage_dir(root, "test_full",
                         [made[("test", f, L)] for f in T4 for L in (0, 1, 2)])

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "configs", "curriculum_training")

    if args.stages is None:
        # Parent mode: run each stage in its OWN subprocess. Six stages of
        # fresh Interpreters/jit caches in one process exhaust host memory
        # (XLA executables are never dropped); per-stage isolation also
        # mirrors how the reference curriculum is actually operated (one
        # training job per stage config, README.md:81-83).
        import subprocess

        rows = []
        for st in STAGES:
            i = st["i"]
            stage_json = os.path.join(root, f"stage_{i}.json")
            if args.resume and os.path.exists(stage_json):
                with open(stage_json) as f:
                    rows.append(json.load(f))
                print(f"[curriculum] stage {i} already done — skipping "
                      f"(acc={rows[-1]['test_acc_overall']})", flush=True)
                continue
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--stages", str(i), "--out", root,
                   "--noise", str(args.noise), "--scale", str(args.scale),
                   "--epoch-scale", str(args.epoch_scale),
                   "--seed", str(args.seed),
                   "--jit-cache", args.jit_cache] + (["--tpu"] if args.tpu else []) \
                  + (["--stage-lr", args.stage_lr] if args.stage_lr else [])
            proc = subprocess.run(cmd)
            if proc.returncode != 0:
                raise RuntimeError(f"curriculum stage {i} failed (rc={proc.returncode})")
            with open(os.path.join(root, f"stage_{i}.json")) as f:
                rows.append(json.load(f))
        _write_artifact(args, world, rows, time.time() - t0)
        return

    experiment = PlantedCurriculumExperiment(world)
    run_stages = [int(s) for s in args.stages.split(",")]
    lr_over = {}
    if args.stage_lr:
        for part in args.stage_lr.split(","):
            k, v = part.split(":")
            lr_over[int(k)] = float(v)

    results = []
    for st in STAGES:
        i = st["i"]
        if i not in run_stages:
            continue
        lr = lr_over.get(i, st["lr"])
        split = st["split"]
        train_files = [made[(split, f, L)] for f in st["fams"] for L in st["lens"]]
        val_files = [made[("val", f, L)] for f in st["fams"] for L in st["lens"]]
        train_dir = stage_dir(root, f"train_cur{i}", train_files)
        val_dir = stage_dir(root, f"val_cur{i}", val_files)

        with open(os.path.join(cfg_dir, f"cur{i}_{MODEL_NAME}.yaml")) as f:
            cfg = yaml.safe_load(f)
        epochs = max(2, int(st["epochs"] * args.epoch_scale))
        cfg.update(
            train_path=train_dir, validation_path=val_dir, test_path=test_dir,
            train_object_path=None, train_object_info_path=None,
            word_embedding_file=None, image_path=None,
            model_path=os.path.join(root, "runs"),
            epoch_num=epochs, repetition_num=1,
            train_batch_size=32, test_batch_size=64,
            box_features_dim=32, oracle_input_dim=24, word_embedding_dim=16,
            featurizer_layers_config=[],
            attribute_network_layers_config=[16],
            relation_network_layers_config=[16],
            attention_transfer_state_dim=16,
            learning_rate=lr, dropout=0.0, weight_decay=1e-10,
            ckeckpointing_frequency=10_000, verbose=False,
            tpu={"max_object_num": 8, "rel_table_size": 4},
        )

        # -l best forwarding: seed this stage's best with the previous best
        # (reference curriculum workflow, README.md:81-83)
        ver_dir = os.path.join(root, "runs", MODEL_NAME, cfg["version"])
        if i > 0:
            prev_ver = f"curriculum_{i - 1}"
            src = os.path.join(root, "runs", MODEL_NAME, prev_ver, "best")
            dst = os.path.join(ver_dir, "best")
            if os.path.isdir(src) and not os.path.isdir(dst):
                shutil.copytree(src, dst)

        t1 = time.time()
        res = experiment.run(dict(cfg), is_training=True, load_model="best",
                             seed=args.seed)
        dt = time.time() - t1

        import jax as _jx

        err = np.asarray(res["test_error"], np.float64).flatten()
        per_op = dict(zip(["over_all"] + list(OP_INDEX.keys()), err.tolist()))
        acc = {k: round(1.0 - v, 4) for k, v in per_op.items()}
        # omit EMPTY test buckets (zero questions — e.g. the supervision
        # families, which T4 excludes): they'd render as fake 1.0 accuracies
        counts = res.get("test_counts")
        if counts is not None:
            names = ["over_all"] + list(OP_INDEX.keys())
            empty = {names[j] for j in range(len(names)) if counts[j] == 0}
            acc = {k: v for k, v in acc.items() if k not in empty}
        row = dict(
            stage=i, version=cfg["version"], families=st["fams"],
            lengths=list(st["lens"]), train_split=split, epochs=epochs,
            learning_rate=lr,
            calibrator=bool(cfg.get("activate_attention_transfer")),
            device=_jx.devices()[0].device_kind,
            backend=_jx.default_backend(),
            test_acc_overall=acc["over_all"],
            test_acc_per_family={k: v for k, v in acc.items() if k != "over_all"},
            seconds=round(dt, 1),
        )
        results.append(row)
        with open(os.path.join(root, f"stage_{i}.json"), "w") as f:
            json.dump(row, f, indent=1)
        print(f"[curriculum] stage {i} done in {dt:.0f}s: "
              f"overall test acc={acc['over_all']:.4f}", flush=True)

    if len(run_stages) == 8:
        _write_artifact(args, world, results, time.time() - t0)


def _write_artifact(args, world, results, total_seconds):
    artifact = dict(
        device=(results[0].get("device") if results else None),
        backend=(results[0].get("backend") if results else None),
        world=dict(nouns=world.nouns,
                   categories=[[c, o] for c, o in world.categories],
                   n_images=512, noise=args.noise, box_dim=32,
                   scale=args.scale, epoch_scale=args.epoch_scale),
        test_set=dict(families=T4, lengths=[0, 1, 2],
                      questions_per_file=int(128 * args.scale),
                      scenes="held-out (image_slice 0.925-1.0)"),
        stages=results,
        trajectory=[r["test_acc_overall"] for r in results],
        calibrator_gain=(
            round(results[-1]["test_acc_overall"] - results[5]["test_acc_overall"], 4)
            if len(results) == 8 else None),
        total_seconds=round(total_seconds, 1),
    )
    out_json = args.json or os.path.join(args.out, "CURRICULUM.json")
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[curriculum] wrote {out_json}")
    print(json.dumps({"trajectory": artifact["trajectory"],
                      "calibrator_gain": artifact["calibrator_gain"]}))


if __name__ == "__main__":
    main()
