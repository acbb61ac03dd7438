"""Online serving engine tests (serve.py).

Pins the three serving invariants:
  1. grid canonicalization / batch-row padding are EXACT (bitwise answer
     flags + loss) — masked canonical slots are no-ops through both the
     executor and the calibrator's gated LSTM carries;
  2. engine answers == the direct offline eval path for a mixed stream of
     all 13 question families;
  3. the executable set stays CLOSED (bounded spec count) under arbitrary
     traffic, and the batching policy honors max_batch / max_delay.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler, _pad_ladder
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.data.loader import LoadedBatch
from dfol_vqa_tpu.data.planted import PlantedWorld
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.serve import (
    ServingEngine,
    branch_structure,
    canonical_grid,
    canonicalize_batch,
    pad_batch_rows,
)
from dfol_vqa_tpu.train.trainer import VQATrainer

FAMILIES = [
    "exist", "verify_attrs", "query_attr", "choose_attr", "choose_rel",
    "verify_rel", "and", "or", "two_different", "two_same", "compare",
    "all_same", "all_different",
]

O = 8


def small_cfg(**kw) -> Config:
    cfg = Config(
        box_features_dim=32,
        oracle_input_dim=24,
        word_embedding_dim=16,
        attribute_network_layers_config=[16],
        relation_network_layers_config=[16],
        featurizer_layers_config=[],
        dropout=0.0,
        weight_decay=0.0,
        verbose=False,
        **kw,
    )
    cfg.tpu.max_object_num = O
    cfg.tpu.rel_table_size = 4
    return cfg


@pytest.fixture(scope="module")
def world(ontology):
    return PlantedWorld(ontology, box_dim=32, n_nouns=4, n_attrs=3, n_images=32,
                        min_objects=3, max_objects=O, noise=0.1, seed=0)


def mixed_stream(world, n_per_family=3, lengths=(0, 1, 2), seed=0):
    qs = []
    for fi, fam in enumerate(FAMILIES):
        for li, ln in enumerate(lengths):
            qs.extend(world.generate_family(
                fam, n_per_family, length=ln, seed=seed + fi * 10 + li,
                id_prefix=f"{fam}-{ln}-",
            ))
    return qs


def direct_answers(cfg, ontology, world, params, questions):
    """Offline path: per-question compile + jitted eval + trainer decode."""
    interp = Interpreter(cfg, ontology)
    trainer = VQATrainer(cfg, interp)
    compiler = ProgramCompiler(ontology, object_num=O,
                               rel_slots=cfg.tpu.rel_table_size)
    out = []
    for q in questions:
        spec, cb = compiler.compile([q])
        objs, mask = world.batch([q["imageId"]], O)
        lb = LoadedBatch(spec, cb, objs, mask)
        fn = interp.step(spec, False)
        res = fn(params, jnp.asarray(lb.objects), jnp.asarray(lb.obj_mask),
                 {k: jnp.asarray(v) for k, v in lb.arrays.items()}, None)
        out.append(trainer.decode_answers(res, lb)[0])
    return out


# ------------------------------------------------------------ canonical grid


def test_branch_structure_and_canonical_grid():
    from dfol_vqa_tpu.compiler.program_compiler import (
        OP_FILTER, OP_PAD, OP_RELATE, OP_SELECT,
    )

    g = (OP_SELECT, OP_FILTER, OP_RELATE, OP_FILTER, OP_FILTER, OP_RELATE, OP_PAD)
    assert branch_structure(g) == (2, 2)
    g2 = (OP_SELECT, OP_RELATE, OP_FILTER)
    assert branch_structure(g2) == (1, 1)
    assert canonical_grid(0, 0) == (OP_SELECT,)
    assert canonical_grid(1, 2) == (
        OP_SELECT, OP_FILTER, OP_FILTER, OP_RELATE, OP_FILTER, OP_FILTER,
    )


@pytest.mark.parametrize("calibrated", [False, True])
def test_canonicalization_bitwise_exact(ontology, world, calibrated):
    """Canonical padded grid -> bitwise-identical answer flags and loss.

    With the calibrator on, the output head is randomized (the shipped
    zero-init makes modulations state-independent, which would mask a
    carry-advance bug at inserted slots)."""
    cfg = small_cfg(activate_attention_transfer=calibrated)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    if calibrated:
        k = jax.random.PRNGKey(42)
        params["calibrator"]["out"]["w"] = (
            0.5 * jax.random.normal(k, params["calibrator"]["out"]["w"].shape)
        )
    compiler = ProgramCompiler(ontology, object_num=O, rel_slots=4)

    # mixed lengths force a merged grid that canonicalization must re-pad
    qs = (world.generate_family("exist", 2, length=0, seed=1)
          + world.generate_family("exist", 2, length=2, seed=2))
    spec, cb = compiler.compile(qs)
    spec2, cb2 = canonicalize_batch(spec, cb)
    assert spec2.grid != spec.grid
    assert all(g == spec2.grid[0] for g in spec2.grid)

    objs, mask = world.batch([q["imageId"] for q in qs], O)

    def run(s, c):
        lb = LoadedBatch(s, c, objs, mask)
        fn = interp.step(s, False)
        return fn(params, jnp.asarray(lb.objects), jnp.asarray(lb.obj_mask),
                  {k: jnp.asarray(v) for k, v in lb.arrays.items()}, None)

    a, b = run(spec, cb), run(spec2, cb2)
    np.testing.assert_array_equal(np.asarray(a["answer_flags"]),
                                  np.asarray(b["answer_flags"]))
    np.testing.assert_array_equal(np.asarray(a["loss"]), np.asarray(b["loss"]))


def test_row_padding_exact(ontology, world):
    """Padding the batch axis never changes the real rows' flags."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    compiler = ProgramCompiler(ontology, object_num=O, rel_slots=4)
    qs = world.generate_family("query_attr", 3, length=1, seed=3)
    spec, cb = compiler.compile(qs)
    objs, mask = world.batch([q["imageId"] for q in qs], O)

    lb = LoadedBatch(spec, cb, objs, mask)
    base = interp.step(spec, False)(
        params, jnp.asarray(lb.objects), jnp.asarray(lb.obj_mask),
        {k: jnp.asarray(v) for k, v in lb.arrays.items()}, None)

    spec2, cb2 = pad_batch_rows(spec, cb, 8)
    assert spec2.batch_size == 8 and cb2.question_mask.sum() == 3
    objs2 = np.concatenate([objs, np.repeat(objs[:1], 5, axis=0)])
    mask2 = np.concatenate([mask, np.repeat(mask[:1], 5, axis=0)])
    lb2 = LoadedBatch(spec2, cb2, objs2, mask2)
    padded = interp.step(spec2, False)(
        params, jnp.asarray(lb2.objects), jnp.asarray(lb2.obj_mask),
        {k: jnp.asarray(v) for k, v in lb2.arrays.items()}, None)

    np.testing.assert_array_equal(np.asarray(base["answer_flags"]),
                                  np.asarray(padded["answer_flags"])[:3])


# ------------------------------------------------------------------- engine


@pytest.mark.parametrize("calibrated", [False, True])
@pytest.mark.slow
def test_engine_matches_direct_path(ontology, world, calibrated):
    """Engine answers == offline eval answers over all 13 families,
    with and without the attention-transfer calibrator (the production
    curriculum's final checkpoints have it on)."""
    cfg = small_cfg(activate_attention_transfer=calibrated)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    if calibrated:  # randomize the zero-init head so modulation is live
        k = jax.random.PRNGKey(42)
        params["calibrator"]["out"]["w"] = (
            0.5 * jax.random.normal(k, params["calibrator"]["out"]["w"].shape)
        )
    qs = mixed_stream(world, n_per_family=2, lengths=(0, 2), seed=7)

    want = direct_answers(cfg, ontology, world, params, qs)

    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=8, max_delay_ms=5.0)
    try:
        results = eng.answer_many(qs)
    finally:
        eng.stop()
    got = [r.answers for r in results]
    assert got == want
    assert eng.stats["requests"] == len(qs)
    assert all(r.latency_ms > 0 for r in results)


@pytest.mark.slow
def test_executable_set_closed(ontology, world):
    """After warmup over a representative sample, arbitrary traffic with the
    same signatures mints ZERO new executables — queues are keyed by the
    canonical spec, so the executable set is exactly specs x batch rungs."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=8, max_delay_ms=2.0,
                        batch_ladder=(1, 2, 4, 8))
    try:
        mix1 = mixed_stream(world, n_per_family=2, lengths=(0, 1, 2), seed=1)
        mix2 = mixed_stream(world, n_per_family=3, lengths=(0, 1, 2), seed=99)
        sample = mix1 + mix2
        info = eng.warmup(sample)
        assert info["compiled"] == info["specs"] * 4  # every batch rung warm
        warm = eng.stats["compiled_steps"]
        eng.answer_many(mix1)
        eng.answer_many(mix2)
        assert eng.stats["compiled_steps"] == warm  # zero serve-time compiles
    finally:
        eng.stop()


def test_batching_policy(ontology, world):
    """max_batch splits greedily; max_delay flushes stragglers."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=4, max_delay_ms=60.0)
    try:
        qs = world.generate_family("exist", 6, length=0, seed=5)
        futs = [eng.submit(q) for q in qs]
        # first 4 dispatch immediately (full batch), 2 wait for the deadline
        done4 = [f.result(timeout=300) for f in futs[:4]]
        assert all(r.batch_size == 4 for r in done4)
        rest = [f.result(timeout=300) for f in futs[4:]]
        assert all(r.batch_size == 2 for r in rest)
        assert eng.stats["batches"] >= 2
    finally:
        eng.stop()


@pytest.mark.slow
def test_engine_on_mesh_matches_single_device(ontology, world):
    """Multi-chip serving: a (4,2) data×model mesh answers identically."""
    from dfol_vqa_tpu.parallel.mesh import make_mesh

    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = mixed_stream(world, n_per_family=1, lengths=(1,), seed=21)

    single = ServingEngine(cfg, ontology, params, features=world,
                           max_batch=8, max_delay_ms=5.0)
    try:
        want = [r.answers for r in single.answer_many(qs)]
    finally:
        single.stop()

    mesh = make_mesh((4, 2), ("data", "model"))
    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=8, max_delay_ms=5.0, mesh=mesh)
    try:
        got = [r.answers for r in eng.answer_many(qs)]
    finally:
        eng.stop()
    assert got == want


def test_engine_serves_trainable_interpreter(ontology, world):
    """The F>1 trainable-interpreter mode serves identically to its
    offline path (the engine is oracle-config agnostic)."""
    cfg = small_cfg(oracle_output_dim=4, operator_layers_config=[8])
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = (world.generate_family("exist", 2, length=1, seed=31)
          + world.generate_family("query_attr", 2, length=1, seed=32))
    want = direct_answers(cfg, ontology, world, params, qs)

    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=4, max_delay_ms=5.0)
    try:
        got = [r.answers for r in eng.answer_many(qs)]
    finally:
        eng.stop()
    assert got == want


def test_trace_diagnostic(ontology, world):
    """engine.trace returns the hop-by-hop attention schema and the same
    answer as the batched serving path."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = world.generate_family("exist", 2, length=2, seed=23)

    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=4, max_delay_ms=5.0)
    try:
        served = [r.answers for r in eng.answer_many(qs)]
        for q, want in zip(qs, served):
            entry = eng.trace(q)
            assert entry["answers"] == want
            assert entry["question_id"] == q["question_id"]
            ops = [h["op"] for h in entry["hops"]]
            assert ops[0] == "select" and "filter" in ops
            assert all(len(h["attention"]) == O for h in entry["hops"])
        assert eng.stats["trace_steps"] >= 1
    finally:
        eng.stop()


def test_burst_pipelines_through_completion_pool(ontology, world):
    """A burst of many same-spec groups exercises the dispatch/readback
    overlap (dispatcher enqueues while the completion pool reads back);
    every request must still resolve with the right answer and consistent
    accounting."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = world.generate_family("exist", 48, length=1, seed=17)
    want = direct_answers(cfg, ontology, world, params, qs)

    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=4, max_delay_ms=5.0)
    try:
        results = eng.answer_many(qs)
        got = [r.answers for r in results]
        assert got == want
        assert eng.stats["batches"] >= len(qs) // 4
        assert len(eng.stats["latencies_ms"]) == len(qs)
    finally:
        eng.stop()


def test_max_batch_beyond_ladder_rejected(ontology, world):
    """max_batch past the top rung would mint an executable per group size
    (beyond the ladder _pad_ladder returns the raw size) — refuse it."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="batch-ladder"):
        ServingEngine(cfg, ontology, params, features=world,
                      max_batch=16, batch_ladder=(1, 2, 4, 8), start=False)


def test_supervision_terminals_rejected(ontology, world):
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(cfg, ontology, params, features=world, start=False)
    with pytest.raises(ValueError):
        eng.submit({"program": {"branches": [], "last_op": {"operator": "scene", "arguments": []}},
                    "imageId": world.image_ids[0]})


@pytest.mark.slow
def test_parallel_warmup_matches_serial(ontology, world):
    """warmup(workers=8) compiles the SAME closed executable set as the
    serial pass (per-key jitted-fn creation is serialized behind
    _compile_lock; distinct (spec, batch-rung) items compile distinct
    executables concurrently) and traffic answers are identical."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = mixed_stream(world, n_per_family=2, lengths=(0, 1), seed=77)
    # warmup must cover the traffic's canonical specs for the set to close
    sample = mixed_stream(world, n_per_family=1, lengths=(0, 1), seed=3) + qs

    def run(workers):
        eng = ServingEngine(cfg, ontology, params, features=world,
                            max_batch=4, max_delay_ms=2.0,
                            batch_ladder=(1, 2, 4))
        try:
            info = eng.warmup(sample, workers=workers, traces=True)
            warm = eng.stats["compiled_steps"]
            got = [r.answers for r in eng.answer_many(qs)]
            tr = eng.trace(sample[0])
            assert eng.stats["compiled_steps"] == warm  # set stays closed
            return info, got, tr["answers"]
        finally:
            eng.stop()

    info_s, got_s, tr_s = run(workers=1)
    info_p, got_p, tr_p = run(workers=8)
    assert info_p["workers"] == 8 and info_s["workers"] == 1
    assert info_p["compiled"] == info_s["compiled"] == info_s["specs"] * 3
    assert got_p == got_s
    assert tr_p == tr_s


def test_plan_cache_hits_and_exactness(ontology, world):
    """Repeated submissions of the same question serve their compiled plan
    from the plan cache (r5: per-request compile/canonicalize was the
    closed-loop host bottleneck) with answers identical to a cold engine."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = world.generate_family("exist", 3, length=1, seed=9)

    def run(**kw):
        eng = ServingEngine(cfg, ontology, params, features=world,
                            max_batch=4, max_delay_ms=2.0, **kw)
        try:
            got = [r.answers for r in eng.answer_many(qs * 4)]
            return got, eng.stats["plan_hits"]
        finally:
            eng.stop()

    got_cached, hits = run()
    # 3 distinct questions submitted 4x each -> 9 hits minimum
    assert hits == 3 * 3
    got_cold, hits_cold = run(plan_cache_size=0)
    assert hits_cold == 0
    assert got_cached == got_cold


def test_plan_cache_lru_bound(ontology, world):
    """The cache never exceeds plan_cache_size (LRU eviction)."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    eng = ServingEngine(cfg, ontology, params, features=world,
                        plan_cache_size=2, start=False)
    qs = world.generate_family("exist", 5, length=0, seed=4)
    for q in qs:
        eng._prepare(q)
    assert len(eng._plan_cache) == 2
    # most-recent entry is a hit, evicted entries re-compile (still correct)
    before = eng.stats["plan_hits"]
    eng._prepare(qs[-1])
    assert eng.stats["plan_hits"] == before + 1


def test_admission_control_overload(ontology, world):
    """submit fast-fails with EngineOverloaded at max_pending queued rows;
    after the queue drains the engine admits again; rejected is counted."""
    from dfol_vqa_tpu.serve import EngineOverloaded

    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    # start=False: nothing drains the queue, so the bound must trip exactly
    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=4, max_delay_ms=1e6,
                        max_pending=3, start=False)
    qs = world.generate_family("exist", 6, length=0, seed=8)
    futs = [eng.submit(q) for q in qs[:3]]
    with pytest.raises(EngineOverloaded):
        eng.submit(qs[3])
    assert eng.stats["rejected"] == 1
    # drain manually (the dispatcher would do this): admitted rows complete
    import time as _time

    with eng._cond:
        eng._flush = True
        groups = eng._ready_groups(_time.perf_counter())
    for key, group in groups:
        eng._process(key, group)
    for f in futs:
        assert f.result(timeout=300).answers
    # queue empty again -> admission resumes
    eng.submit(qs[4])
    assert eng.stats["rejected"] == 1
