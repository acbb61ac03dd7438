"""F=1 vs F>1 (trainable interpreter) ablation in the stressed regime.

The reference's `oracle_output_dim > 1` mode never ran upstream (build
crash, gqa_interpreter_experiments.py:209); here it works
(models/oracle.py trainable-interpreter note). This script asks the
obvious next question: does the extra capacity DO anything? Both arms
train identically — same planted world (high noise = imperfect-oracle
stressed regime), same question stream, same step budget, same seeds —
differing only in oracle_output_dim (+ the per-arity operator modules it
brings). Reports held-out accuracy per arm over a seed sweep.

Usage:
    python scripts/trainable_ablation.py [--steps 600] [--noise 0.35]
        [--seeds 3] [--f-dim 4] [--json TRAINABLE_ABLATION.json] [--tpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FAMILIES = ("exist", "verify_attrs", "query_attr", "choose_attr",
            "verify_rel", "choose_rel", "and", "or", "compare")


def run_arm(F, args, seed):
    import jax
    import jax.numpy as jnp

    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
    from dfol_vqa_tpu.config import Config
    from dfol_vqa_tpu.data.dataset import ProgramDataset
    from dfol_vqa_tpu.data.loader import BatchLoader
    from dfol_vqa_tpu.data.planted import PlantedWorld
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from dfol_vqa_tpu.ontology import GQAOntology
    from dfol_vqa_tpu.train.optim import build_optimizer
    from dfol_vqa_tpu.train.trainer import VQATrainer

    ontology = GQAOntology()
    cfg = Config(
        box_features_dim=64,
        oracle_input_dim=32,
        word_embedding_dim=24,
        attribute_network_layers_config=[24],
        relation_network_layers_config=[24],
        featurizer_layers_config=[],
        operator_layers_config=[8],
        oracle_output_dim=F,
        learning_rate=3e-3,
        dropout=0.0,
        weight_decay=0.0,
        verbose=False,
    )
    cfg.tpu.max_object_num = 8
    world = PlantedWorld(ontology, box_dim=64, n_nouns=5, n_attrs=3,
                         n_images=96, min_objects=3, max_objects=8,
                         noise=args.noise, seed=7)
    train_qs, test_qs = [], []
    for i, fam in enumerate(FAMILIES):
        train_qs.append(ProgramDataset(
            world.generate_family(fam, 140, length=1, seed=100 + i,
                                  image_slice=(0.0, 0.7), id_prefix=f"tr{fam}"),
            ontology))
        test_qs.append(ProgramDataset(
            world.generate_family(fam, 48, length=1, seed=200 + i,
                                  image_slice=(0.7, 1.0), id_prefix=f"te{fam}"),
            ontology))
    compiler = ProgramCompiler(ontology, object_num=8, rel_slots=2)

    def loader(ds, shuffle, seed_):
        return BatchLoader(ds, compiler, world, 28, 8, shuffle=shuffle,
                           prefetch=0, seed=seed_)

    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(seed))
    trainer = VQATrainer(cfg, interp)
    trainer._tx = build_optimizer(cfg, params)
    opt_state = trainer._tx.init(params)
    rng = jax.random.PRNGKey(seed)
    eval_points = sorted(args.step_list)
    step, epoch = 0, 0
    t0 = time.time()
    acc_at = {}
    while step < eval_points[-1]:
        for batch in loader(train_qs, True, seed + epoch):
            if step >= eval_points[-1]:
                break
            fn = trainer._train_step(batch.spec)
            params, opt_state, loss, _, rng = fn(
                params, opt_state, jnp.asarray(batch.objects),
                jnp.asarray(batch.obj_mask),
                {k: jnp.asarray(v) for k, v in batch.arrays.items()}, rng,
            )
            step += 1
            if step in eval_points:
                err = trainer.test_epoch(loader(test_qs, False, 0), params)
                acc_at[step] = round(float(1.0 - err[0]), 4)
        epoch += 1
    return {"acc_at_step": acc_at, "acc": acc_at[eval_points[-1]],
            "seconds": round(time.time() - t0, 1),
            "param_count": interp.parameter_count(params)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", default="600",
                    help="comma-separated eval budgets; one run per seed "
                         "evaluated at each point (e.g. 600,1800)")
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--f-dim", type=int, default=4)
    ap.add_argument("--json", default=None)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    args.step_list = [int(s) for s in str(args.steps).split(",")]

    if not args.tpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")

    arms = {}
    for F in (1, args.f_dim):
        rows = [run_arm(F, args, s) for s in range(args.seeds)]
        accs = [r["acc"] for r in rows]
        mean_at = {
            str(p): round(float(np.mean([r["acc_at_step"][p] for r in rows])), 4)
            for p in args.step_list
        }
        arms[f"F{F}"] = {
            "runs": rows,
            "mean_acc": round(float(np.mean(accs)), 4),
            "std_acc": round(float(np.std(accs)), 4),
            "mean_acc_at_step": mean_at,
        }
        print(f"[ablation] F={F}: accs={accs} mean_at={mean_at}")

    out = {
        "description": (
            "Stressed-regime (noisy planted world, imperfect oracle) "
            "ablation of the resurrected trainable-interpreter mode: "
            "identical data/steps/seeds, only oracle_output_dim differs. "
            "The mode cannot run in the reference (build crash), so this "
            "is capability beyond upstream, quantified."
        ),
        "steps": args.step_list, "noise": args.noise, "n_seeds": args.seeds,
        "families": list(FAMILIES),
        "arms": arms,
        "delta_mean_acc": round(
            arms[f"F{args.f_dim}"]["mean_acc"] - arms["F1"]["mean_acc"], 4),
    }
    print(json.dumps({"trainable_ablation": {
        k: v["mean_acc"] for k, v in arms.items()}}))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
