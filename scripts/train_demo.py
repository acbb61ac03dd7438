"""End-to-end learning demo: train the oracle from answer-only supervision.

Builds a planted-signal world (data/planted.py), trains the full model from
scratch on 1-2 hop exist questions, and reports held-out accuracy — the
∇-FOL core claim (concepts learned only from yes/no answers through the
differentiable logic) demonstrated without the GQA download.

Usage: python scripts/train_demo.py [--steps 600] [--hops 2]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--hops", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--box-dim", type=int, default=256)
    ap.add_argument("--calibration-steps", type=int, default=0,
                    help="stage-B: train the attention calibrator on the frozen oracle")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
    from dfol_vqa_tpu.config import Config
    from dfol_vqa_tpu.data.dataset import ProgramDataset
    from dfol_vqa_tpu.data.loader import BatchLoader
    from dfol_vqa_tpu.data.planted import PlantedWorld
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from dfol_vqa_tpu.ontology import GQAOntology
    from dfol_vqa_tpu.train.optim import build_optimizer
    from dfol_vqa_tpu.train.trainer import VQATrainer

    cfg = Config(
        box_features_dim=args.box_dim,
        oracle_input_dim=128,
        word_embedding_dim=300,
        learning_rate=args.lr,
        dropout=0.0,
        weight_decay=0.0,
        verbose=False,
    )
    cfg.tpu.max_object_num = 12
    ont = GQAOntology()
    world = PlantedWorld(ont, box_dim=args.box_dim, seed=0)
    interp = Interpreter(cfg, ont)
    params = jax.device_put(interp.init_params(jax.random.PRNGKey(0)))

    train_qs = world.generate(4096, hops=args.hops, seed=1)
    test_qs = world.generate(512, hops=args.hops, seed=2)
    compiler = ProgramCompiler(ont, object_num=cfg.tpu.max_object_num, rel_slots=4)

    def loader(qs, shuffle):
        return BatchLoader([ProgramDataset(qs, ont)], compiler, world, args.batch,
                           cfg.tpu.max_object_num, shuffle=shuffle, prefetch=2)

    trainer = VQATrainer(cfg, interp)
    trainer._tx = build_optimizer(cfg, params)
    opt_state = trainer._tx.init(params)

    def accuracy(params):
        err = trainer.test_epoch(loader(test_qs, False), params)
        return 1.0 - err[0]

    from dfol_vqa_tpu.data.device_prefetch import device_prefetch

    print(f"initial accuracy: {accuracy(params):.3f} (chance = 0.5)")
    t0 = time.time()
    step = 0
    rng = jax.random.PRNGKey(0)
    while step < args.steps:
        for batch, objects, obj_mask, packed in device_prefetch(loader(train_qs, True), size=2):
            if step >= args.steps:
                break
            fn = trainer._train_step(batch.spec, batch.meta)
            params, opt_state, loss, match, rng = fn(
                params, opt_state, objects, obj_mask, packed, rng,
            )
            step += 1
            if step % 100 == 0:
                print(f"step {step}: loss={float(loss):.4f} "
                      f"batch_match={float(np.mean(np.asarray(match))):.3f}")
    dt = time.time() - t0
    acc = accuracy(params)
    print(f"final held-out accuracy after {step} steps ({dt:.0f}s): {acc:.3f}")

    if args.calibration_steps > 0:
        # stage B (curriculum-6 style): freeze the oracle, train the bi-LSTM
        # attention calibrator on top (README.md curriculum 6-7)
        cfg.activate_attention_transfer = True
        for k in ("freeze_featurizer", "freeze_attribute_network",
                  "freeze_relation_network", "freeze_embedding_network"):
            setattr(cfg, k, True)
        interp_c = Interpreter(cfg, ont)
        params_c = interp_c.init_params(jax.random.PRNGKey(1))
        for key in params:
            # deep-copy: the train step donates its params buffers
            params_c[key] = jax.tree_util.tree_map(jnp.copy, params[key])
        emb_snapshot = np.asarray(params["embedding"]["w"]).copy()

        trainer_c = VQATrainer(cfg, interp_c)
        trainer_c._tx = build_optimizer(cfg, params_c)
        opt_state_c = trainer_c._tx.init(params_c)

        def accuracy_c(p):
            err = trainer_c.test_epoch(loader(test_qs, False), p)
            return 1.0 - err[0]

        print(f"calibration start accuracy (identity modulator): {accuracy_c(params_c):.3f}")
        step = 0
        rng_c = jax.random.PRNGKey(2)
        while step < args.calibration_steps:
            for batch, objects, obj_mask, packed in device_prefetch(loader(train_qs, True), size=2):
                if step >= args.calibration_steps:
                    break
                fn = trainer_c._train_step(batch.spec, batch.meta)
                params_c, opt_state_c, loss, _, rng_c = fn(
                    params_c, opt_state_c, objects, obj_mask, packed, rng_c,
                )
                step += 1
        acc_c = accuracy_c(params_c)
        print(f"accuracy after {step} calibration steps: {acc_c:.3f}")
        # frozen-oracle invariant
        assert np.array_equal(np.asarray(params_c["embedding"]["w"]), emb_snapshot)
        return max(acc, acc_c)
    return acc


if __name__ == "__main__":
    acc = main()
    assert acc > 0.8, f"learning demo under-performed: {acc}"
