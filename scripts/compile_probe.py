"""Map curriculum-stage XLA compiles to bucket specs + persistent-cache keys.

CURRICULUM_r03's cold TPU run paid two pathological compiles (stage 4:
~40 min, stressed stage 6: ~30 min) hidden behind single jit_step cache
entries. This probe rebuilds a stage's exact training setup, enumerates
every distinct (spec, meta, chunk) the epoch loop would dispatch, and
AOT-compiles each one against the SAME persistent cache with
`jax._src.compiler`'s cache-hit logging turned up — so each compile is
attributed to its spec, its key hash, and its wall-clock compile time
(cache hits return in <2s; the pathological entry is whichever spec
misses slowest on a cold cache, or maps to the known-slow key on a warm
one).

Usage:
    python scripts/compile_probe.py --out /tmp/cur_r03_prod --stage 4 \
        --jit-cache /tmp/dfol_jit_cache_tpu --tpu [--noise 0.35]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from curriculum_run import STAGES, T4, MODEL_NAME, stage_dir  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="curriculum run dir (datasets exist)")
    ap.add_argument("--stage", type=int, default=4)
    ap.add_argument("--noise", type=float, default=0.35)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--jit-cache", default=None)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--eval-too", action="store_true",
                    help="also probe the eval (test_epoch) compiles")
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    if not args.tpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    if args.jit_cache:
        jax.config.update("jax_compilation_cache_dir", args.jit_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # capture "Persistent compilation cache hit for '%s' with key %r" /
    # "Writing %s to persistent compilation cache with key %r"
    keys_seen: list = []

    class KeyGrab(logging.Handler):
        def emit(self, rec):
            m = rec.getMessage()
            if "with key" in m:
                keys_seen.append(m)

    for name in ("jax._src.compiler", "jax._src.compilation_cache"):
        lg = logging.getLogger(name)
        lg.setLevel(logging.DEBUG)
        lg.addHandler(KeyGrab())

    from dfol_vqa_tpu.config import Config
    from dfol_vqa_tpu.data.planted import PlantedWorld
    from dfol_vqa_tpu.experiments.experiment import GQAObjectBoxExperiment
    from dfol_vqa_tpu.ontology import GQAOntology
    from dfol_vqa_tpu.train.optim import build_optimizer
    from dfol_vqa_tpu.train.trainer import VQATrainer

    class ProbeExperiment(GQAObjectBoxExperiment):
        def __init__(self, world):
            self._world = world

        def build_features(self, cfg, logger):
            return self._world

    ontology = GQAOntology()
    world = PlantedWorld(
        ontology, box_dim=32, n_nouns=6, n_attrs=9, n_images=512,
        min_objects=3, max_objects=8, noise=args.noise, seed=args.seed,
        image_id_space="vocab",
    )
    st = STAGES[args.stage]
    root = args.out
    made = {
        (split, fam, L): os.path.join(root, f"data_{split}",
                                      f"p_{split}_{fam}_{L}.h5")
        for split in ("all", "bal", "val", "test")
        for fam in T4 for L in (0, 1, 2)
    }
    split = st["split"]
    train_files = [made[(split, f, L)] for f in st["fams"] for L in st["lens"]]
    train_dir = stage_dir(root, f"train_cur{st['i']}", train_files)

    cfg_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "configs", "curriculum_training")
    with open(os.path.join(cfg_dir, f"cur{st['i']}_{MODEL_NAME}.yaml")) as f:
        cfg_d = yaml.safe_load(f)
    cfg_d.update(
        train_path=train_dir, validation_path=train_dir, test_path=train_dir,
        train_object_path=None, train_object_info_path=None,
        word_embedding_file=None, image_path=None,
        model_path=os.path.join(root, "runs"),
        epoch_num=1, repetition_num=1,
        train_batch_size=32, test_batch_size=64,
        box_features_dim=32, oracle_input_dim=24, word_embedding_dim=16,
        featurizer_layers_config=[],
        attribute_network_layers_config=[16],
        relation_network_layers_config=[16],
        attention_transfer_state_dim=16,
        learning_rate=st["lr"], dropout=0.0, weight_decay=1e-10,
        ckeckpointing_frequency=10_000, verbose=False,
        tpu={"max_object_num": 8, "rel_table_size": 4},
    )
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as tf:
        yaml.safe_dump(cfg_d, tf)
        cfg = Config.from_yaml(tf.name)

    exp = ProbeExperiment(world)
    logger = logging.getLogger("probe")
    interp = exp.build_interpreter(cfg, ontology, logger)
    features = exp.build_features(cfg, logger)
    trainer = VQATrainer(cfg, interp, logger)
    params = interp.init_params(jax.random.PRNGKey(args.seed))
    trainer._tx = build_optimizer(cfg, params)
    opt_state = trainer._tx.init(params)
    rng = jax.random.PRNGKey(0)

    loader = exp.build_loader(cfg, train_dir, ontology, features,
                              cfg.train_batch_size, shuffle=True)

    # enumerate distinct (spec, meta, k) chunk groups exactly as the epoch
    # loop does (host side only — no device transfer)
    chunk = max(1, cfg.tpu.train_chunk)
    groups = {}
    buf = []

    def close(buf):
        if not buf:
            return
        b0 = buf[0]
        key = (b0.spec, b0.meta, len(buf))
        if key not in groups:
            groups[key] = buf[:]
        buf.clear()

    for b in loader:
        if buf and (buf[0].spec != b.spec or buf[0].meta != b.meta
                    or buf[0].objects.shape != b.objects.shape):
            close(buf)
        buf.append(b)
        if len(buf) >= chunk:
            close(buf)
    close(buf)

    # pad_chunks (default): every partial group shares the full-chunk padded
    # executable, so the signature set collapses to one per (spec, meta)
    # (plus the single-step one for runs of 1) — mirror the trainer exactly
    if cfg.tpu.pad_chunks:
        collapsed = {}
        for (spec, meta, k), g in groups.items():
            kk = 1 if k == 1 else chunk
            key = (spec, meta, kk)
            if key not in collapsed or len(collapsed[key]) < len(g):
                collapsed[key] = g
        groups = collapsed

    print(f"[probe] stage {st['i']}: {len(groups)} distinct (spec, meta, k) "
          f"train-chunk signatures (pad_chunks={cfg.tpu.pad_chunks})",
          flush=True)

    rows = []
    for (spec, meta, k), g in sorted(
            groups.items(), key=lambda kv: str(kv[0][0])):
        objs = np.stack([b.objects for b in g])
        masks = np.stack([b.obj_mask for b in g])
        packs = np.stack([b.packed for b in g])
        keys_seen.clear()
        t0 = time.time()
        if k == 1 or chunk == 1:
            fn = trainer._train_step(spec, meta)
            compiled = fn.lower(params, opt_state, objs[0], masks[0],
                                packs[0], rng).compile()
        elif cfg.tpu.pad_chunks:
            fn = trainer._train_step_chunk_padded(spec, meta, k)
            compiled = fn.lower(
                params, opt_state,
                trainer._pad_chunk(objs, k), trainer._pad_chunk(masks, k),
                trainer._pad_chunk(packs, k), rng, np.int32(len(g)),
            ).compile()
        else:
            fn = trainer._train_step_chunk(spec, meta, k)
            compiled = fn.lower(params, opt_state, objs, masks, packs,
                                rng).compile()
        dt = time.time() - t0
        key_hash = ""
        for m in keys_seen:
            if "with key" in m:
                key_hash = m.rsplit("key", 1)[1].strip().strip("'\" ")
        row = dict(
            terminal=spec.terminal_op, k=k, spec=str(spec)[:200],
            compile_s=round(dt, 1), cache_key=key_hash,
            hlo_kb=None,
        )
        rows.append(row)
        print(f"[probe] {spec.terminal_op:15s} k={k:2d} "
              f"compile={dt:7.1f}s key={key_hash[:16]} spec={str(spec)[:110]}",
              flush=True)

    if args.eval_too:
        eval_loader = exp.build_loader(cfg, train_dir, ontology, features,
                                       cfg.test_batch_size, shuffle=False)
        echunk = max(1, cfg.tpu.eval_chunk)
        egroups = {}
        buf = []

        def eclose(buf):
            if buf:
                b0 = buf[0]
                egroups.setdefault((b0.spec, b0.meta, len(buf)), buf[:])
                buf.clear()

        for b in eval_loader:
            if buf and (buf[0].spec != b.spec or buf[0].meta != b.meta
                        or buf[0].objects.shape != b.objects.shape):
                eclose(buf)
            buf.append(b)
            if len(buf) >= echunk:
                eclose(buf)
        eclose(buf)
        if cfg.tpu.pad_chunks:
            ecollapsed = {}
            for (spec, meta, k), g in egroups.items():
                kk = 1 if k == 1 else echunk
                key = (spec, meta, kk)
                if key not in ecollapsed or len(ecollapsed[key]) < len(g):
                    ecollapsed[key] = g
            egroups = ecollapsed
        print(f"[probe] eval: {len(egroups)} signatures "
              f"(pad_chunks={cfg.tpu.pad_chunks})", flush=True)
        for (spec, meta, k), g in sorted(
                egroups.items(), key=lambda kv: str(kv[0][0])):
            objs = np.stack([b.objects for b in g])
            masks = np.stack([b.obj_mask for b in g])
            packs = np.stack([b.packed for b in g])
            if len(g) < k:
                objs = np.asarray(trainer._pad_chunk(objs, k))
                masks = np.asarray(trainer._pad_chunk(masks, k))
                packs = np.asarray(trainer._pad_chunk(packs, k))
            keys_seen.clear()
            t0 = time.time()
            if k == 1 or echunk == 1:
                fn = trainer._eval_step(spec, meta)
                fn.lower(params, objs[0], masks[0], packs[0]).compile()
            else:
                fn = interp.step_packed_many(spec, meta, False)
                fn.lower(params, objs, masks, packs).compile()
            dt = time.time() - t0
            key_hash = ""
            for m in keys_seen:
                if "with key" in m:
                    key_hash = m.rsplit("key", 1)[1].strip().strip("'\" ")
            rows.append(dict(terminal=spec.terminal_op, k=k, eval=True,
                             spec=str(spec)[:200], compile_s=round(dt, 1),
                             cache_key=key_hash))
            print(f"[probe] eval {spec.terminal_op:15s} k={k:2d} "
                  f"compile={dt:7.1f}s key={key_hash[:16]}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"[probe] wrote {args.json}")


if __name__ == "__main__":
    main()
