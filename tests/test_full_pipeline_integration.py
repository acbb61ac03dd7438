"""Whole-system integration: raw GQA-style annotations -> preprocess CLI ->
segregated h5 program files -> dataset/loader -> jitted execution."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


RAW_QUESTIONS = {
    "q1": {
        "semantic": [
            {"operation": "select", "argument": "cars (42)", "dependencies": []},
            {"operation": "filter color", "argument": "red", "dependencies": [0]},
            {"operation": "exist", "argument": "?", "dependencies": [1]},
        ],
        "answer": "yes",
        "imageId": None,  # filled per test
        "question": "Is there a red car?",
    },
    "q2": {
        "semantic": [
            {"operation": "select", "argument": "person (7)", "dependencies": []},
            {"operation": "relate", "argument": "ball,holding,o (9)", "dependencies": [0]},
            {"operation": "exist", "argument": "?", "dependencies": [1]},
        ],
        "answer": "no",
        "imageId": None,
        "question": "Is the person holding a ball?",
    },
    "q3": {
        "semantic": [
            {"operation": "select", "argument": "dog (3)", "dependencies": []},
            {"operation": "query", "argument": "color", "dependencies": [0]},
        ],
        "answer": "brown",
        "imageId": None,
        "question": "What color is the dog?",
    },
}


def test_preprocess_cli_to_execution(tmp_path, ontology, monkeypatch):
    from dfol_vqa_tpu.compiler import preprocess_cli
    from dfol_vqa_tpu.compiler.verifier import GQAProgramVerifier
    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
    from dfol_vqa_tpu.data.dataset import GQADataManager
    from dfol_vqa_tpu.data.features import SyntheticFeatures
    from dfol_vqa_tpu.data.loader import BatchLoader
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from tests.test_pipeline_train import tiny_cfg

    raw = dict(RAW_QUESTIONS)
    for i, (k, v) in enumerate(raw.items()):
        v = dict(v)
        v["imageId"] = ontology._images[i]
        raw[k] = v
    in_file = tmp_path / "questions.json"
    in_file.write_text(json.dumps(raw))

    out_dir = tmp_path / "out"
    out_dir.mkdir()
    preprocess_cli.main([str(in_file), str(out_dir), "-b", "-g"])

    # segregated JSON-lines + h5 outputs exist
    h5_dir = out_dir / "h5_questions"
    files = sorted(os.listdir(h5_dir))
    assert any("exist" in f for f in files)
    assert any("query_attr" in f for f in files)

    # every produced program passes the verifier
    v = GQAProgramVerifier(ontology)
    json_dir = out_dir / "p_questions"
    for f in os.listdir(json_dir):
        for line in open(json_dir / f):
            assert v.verify(json.loads(line)["program"])

    # load the h5 files and execute end to end
    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    manager = GQADataManager(str(h5_dir), ontology)
    assert len(manager) == 3
    compiler = ProgramCompiler(ontology, object_num=cfg.tpu.max_object_num,
                               rel_slots=cfg.tpu.rel_table_size)
    feats = SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=3,
                              max_objects=cfg.tpu.max_object_num)
    loader = BatchLoader(manager.datasets, compiler, feats, 2,
                         cfg.tpu.max_object_num, shuffle=False, prefetch=0)
    n = 0
    for b in loader:
        out = interp.forward(params, jnp.asarray(b.objects), jnp.asarray(b.obj_mask),
                             {k: jnp.asarray(x) for k, x in b.arrays.items()},
                             b.spec, False, None)
        assert np.isfinite(np.asarray(out["log_probability"])).all()
        n += int(b.compiled.question_mask.sum())
    assert n == 3
    # relate argument orientation survived the whole pipeline
    found_relate = False
    for d in manager.datasets:
        for i in range(len(d)):
            for o in d[i]["program"]["branches"][0]:
                if o["operator"] == "relate":
                    assert o["arguments"] == ["holding", False, "ball"]
                    found_relate = True
    assert found_relate
