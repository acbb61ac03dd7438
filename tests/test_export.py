"""AOT serving-artifact tests (export.py).

Pins the deployment contract: the exported executable set answers
identically to the live engine, and a loading host serves WITHOUT tracing
the model (interpreter.forward is never called)."""

import jax
import numpy as np
import pytest

from dfol_vqa_tpu.export import (
    export_serving_set,
    load_serving_set,
    meta_from_json,
    meta_to_json,
    spec_from_json,
    spec_to_json,
)
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.serve import ServingEngine
from tests.test_serving import FAMILIES, O, mixed_stream, small_cfg


@pytest.fixture(scope="module")
def world(ontology):
    from dfol_vqa_tpu.data.planted import PlantedWorld

    return PlantedWorld(ontology, box_dim=32, n_nouns=4, n_attrs=3, n_images=32,
                        min_objects=3, max_objects=O, noise=0.1, seed=0)


def test_spec_meta_json_roundtrip(ontology, world):
    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
    from dfol_vqa_tpu.data.loader import LoadedBatch

    compiler = ProgramCompiler(ontology, object_num=O, rel_slots=4)
    qs = world.generate_family("exist", 2, length=1, seed=0)
    spec, cb = compiler.compile(qs)
    objs, mask = world.batch([q["imageId"] for q in qs], O)
    lb = LoadedBatch(spec, cb, objs, mask)
    import json

    spec2 = spec_from_json(json.loads(json.dumps(spec_to_json(spec))))
    meta2 = meta_from_json(json.loads(json.dumps(meta_to_json(lb.meta))))
    assert spec2 == spec and hash(spec2) == hash(spec)
    assert meta2 == lb.meta


@pytest.mark.slow
def test_exported_set_serves_without_tracing(ontology, world, tmp_path, monkeypatch):
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    # a small but structurally diverse sample (two families, two lengths)
    qs = []
    for fam in ("exist", "query_attr", "choose_rel"):
        for ln in (0, 2):
            qs.extend(world.generate_family(fam, 2, length=ln,
                                            seed=11, id_prefix=f"x{fam}{ln}"))

    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=4, max_delay_ms=5.0, batch_ladder=(1, 2, 4),
                        start=False)
    manifest = export_serving_set(eng, qs, str(tmp_path / "art"),
                                  include_traces=True)
    assert manifest["n_specs"] > 0
    # 3 eval rungs + 1 trace module per spec
    assert len(manifest["executables"]) == manifest["n_specs"] * 4

    # ground truth from a live (tracing) engine
    live = ServingEngine(cfg, ontology, params, features=world,
                         max_batch=4, max_delay_ms=5.0, batch_ladder=(1, 2, 4))
    try:
        want = [r.answers for r in live.answer_many(qs)]
    finally:
        live.stop()

    # deployment host: load artifact, FORBID tracing the model
    loaded = load_serving_set(str(tmp_path / "art"))
    # the artifact covers every (spec, rung) live traffic produced (live
    # traffic only exercises the rungs its batching happened to hit)
    assert set(live._step_cache) <= set(loaded)
    eng2 = ServingEngine(cfg, ontology, params, features=world,
                         max_batch=4, max_delay_ms=5.0, batch_ladder=(1, 2, 4),
                         executables=loaded)
    monkeypatch.setattr(
        Interpreter, "forward",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("traced on serve host")),
    )
    try:
        got = [r.answers for r in eng2.answer_many(qs)]
        # the trace diagnostics path also serves from the artifact
        tr = eng2.trace(qs[0])
        assert tr["answers"] == want[0] and tr["hops"]
    finally:
        eng2.stop()
    assert got == want
    assert eng2.stats["compiled_steps"] == 0
    assert eng2.stats.get("trace_steps", 0) == 0
    assert eng2.stats["aot_steps"] > 0


def test_artifact_engine_mismatch_rejected(ontology, world, tmp_path):
    """Loading with an incompatible engine must fail loudly, not silently
    fall back to tracing (object_num/dtype/ladders never match the keys)."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = world.generate_family("exist", 2, length=0, seed=5)
    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=2, batch_ladder=(1, 2), start=False)
    export_serving_set(eng, qs, str(tmp_path / "art"))

    # compatible engine loads fine
    assert load_serving_set(str(tmp_path / "art"), engine=eng)

    cfg2 = small_cfg()
    cfg2.tpu.max_object_num = O + 4  # engine would never hit the keys
    interp2 = Interpreter(cfg2, ontology)
    params2 = interp2.init_params(jax.random.PRNGKey(0))
    eng2 = ServingEngine(cfg2, ontology, params2, features=world,
                         max_batch=2, batch_ladder=(1, 2), start=False)
    with pytest.raises(ValueError, match="object_num"):
        load_serving_set(str(tmp_path / "art"), engine=eng2)

    # a policy that can reach rungs the artifact lacks is also an error
    eng3 = ServingEngine(cfg, ontology, params, features=world,
                         max_batch=4, batch_ladder=(1, 2, 4), start=False)
    with pytest.raises(ValueError, match="batch rungs"):
        load_serving_set(str(tmp_path / "art"), engine=eng3)


def test_dual_platform_export_from_cpu_host(ontology, world, tmp_path):
    """A CPU build host can lower for cpu AND tpu ahead-of-time; the
    dual-platform artifact still serves on the cpu leg with zero traces
    (the deployment story: build once, deserialize on the TPU fleet)."""
    cfg = small_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = world.generate_family("exist", 2, length=0, seed=1)
    eng = ServingEngine(cfg, ontology, params, features=world,
                        max_batch=2, batch_ladder=(1, 2), start=False)
    m = export_serving_set(eng, qs, str(tmp_path / "art"),
                           batch_sizes=[1, 2], platforms=("cpu", "tpu"))
    assert m["platforms"] == ["cpu", "tpu"]

    live = ServingEngine(cfg, ontology, params, features=world,
                         max_batch=2, batch_ladder=(1, 2))
    try:
        want = [r.answers for r in live.answer_many(qs)]
    finally:
        live.stop()

    loaded = load_serving_set(str(tmp_path / "art"), engine=eng)
    eng2 = ServingEngine(cfg, ontology, params, features=world,
                         max_batch=2, batch_ladder=(1, 2), executables=loaded)
    try:
        got = [r.answers for r in eng2.answer_many(qs)]
    finally:
        eng2.stop()
    assert got == want
    assert eng2.stats["compiled_steps"] == 0
    assert eng2.stats["aot_steps"] >= 1


def test_artifact_format_guard(tmp_path):
    import json
    import os

    os.makedirs(tmp_path / "bad", exist_ok=True)
    with open(tmp_path / "bad" / "manifest.json", "w") as f:
        json.dump({"format": "something_else"}, f)
    with pytest.raises(ValueError):
        load_serving_set(str(tmp_path / "bad"))
