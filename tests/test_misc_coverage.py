"""Coverage for hard_mode, end terminal, h5 interchange, bf16 compute."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler, batch_arrays
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.models.interpreter import Interpreter

from tests.conftest import requires_reference
from tests.helpers import op, question, static_world
from tests.test_pipeline_train import make_loader, tiny_cfg


def test_hard_mode_exist(ontology):
    """hard_mode=True at eval uses min/max aggregation (trainer hard logic)."""
    cfg_soft = Config(normalize_oracle=False)
    cfg_hard = Config(normalize_oracle=False, hard_mode=True)
    cfg_soft.tpu.max_object_num = cfg_hard.tpu.max_object_num = 4
    compiler = ProgramCompiler(ontology, object_num=4)
    q = question([[op("select", "car")]], op("exist"), "yes")
    spec, cb = compiler.compile([q])
    p_car = np.array([0.6, 0.3, 0.0, 0.0], np.float32)
    world = static_world(ontology, [{"car": np.log(np.clip(p_car, 1e-20, 1))}], [{}],
                         counts=[2], O=4, rel_tokens=cb.rel_tokens)
    arrays = {k: jnp.asarray(v) for k, v in batch_arrays(cb).items()}

    out_soft = Interpreter(cfg_soft, ontology).execute(None, world, arrays, spec, False)
    out_hard = Interpreter(cfg_hard, ontology).execute(None, world, arrays, spec, False)
    # soft: 1 - (1-.6)(1-.3) = .72 ; hard (EXISTS=max): .6
    np.testing.assert_allclose(np.exp(out_soft["log_probability"]), [0.72], rtol=1e-4)
    np.testing.assert_allclose(np.exp(out_hard["log_probability"]), [0.6], rtol=1e-4)
    # hard mode only applies at eval; training still uses soft aggregation
    out_train = Interpreter(cfg_hard, ontology).execute(None, world, arrays, spec, True)
    np.testing.assert_allclose(np.exp(out_train["log_probability"]), [0.72], rtol=1e-4)


def test_end_terminal_statement(ontology):
    cfg = Config(normalize_oracle=False)
    cfg.tpu.max_object_num = 4
    compiler = ProgramCompiler(ontology, object_num=4)
    q = question([[op("select", "car"), op("filter", "red")]], op("end"))
    spec, cb = compiler.compile([q])
    p_car = np.array([0.9, 0.0, 0.0, 0.0], np.float32)
    p_red = np.array([0.5, 0.0, 0.0, 0.0], np.float32)
    world = static_world(
        ontology,
        [{"car": np.log(np.clip(p_car, 1e-20, 1)), "red": np.log(np.clip(p_red, 1e-20, 1))}],
        [{}], counts=[1], O=4, rel_tokens=cb.rel_tokens,
    )
    arrays = {k: jnp.asarray(v) for k, v in batch_arrays(cb).items()}
    out = Interpreter(cfg, ontology).execute(None, world, arrays, spec, False)
    np.testing.assert_allclose(np.exp(out["log_probability"]), [0.45], rtol=1e-4)
    # STATEMENT loss = -sum(lp)
    np.testing.assert_allclose(float(out["loss"]), -float(out["log_probability"][0]), rtol=1e-6)


@requires_reference
def test_h5_interchange_with_reference_encoder(ontology, tmp_path):
    """Files written by the REFERENCE GQAH5Encoder load through our decoder."""
    import sys

    sys.path.insert(0, "/root/reference/src")
    import types as pytypes

    # gqa_preprocess imports parse_utils which needs `pattern`; stub it
    from dfol_vqa_tpu.compiler.normalize import singularize_word

    for name, mod in [("pattern", pytypes.ModuleType("pattern")),
                      ("pattern.text", pytypes.ModuleType("pattern.text")),
                      ("pattern.text.en", pytypes.ModuleType("pattern.text.en"))]:
        sys.modules.setdefault(name, mod)
    sys.modules["pattern.text.en"].singularize = singularize_word

    from gqa_preprocess import GQAH5Encoder
    from nsvqa.nn.interpreter.batch_gqa_ops import GQAOntology as RefOntology

    meta = "/root/reference/src/nsvqa/data/metadata"
    ref_ont = RefOntology(meta + "/gqa_all_attribute.json", meta + "/gqa_all_class.json",
                          meta + "/gqa_vocab.json")

    qs = []
    for i in range(5):
        qs.append(
            {
                "imageId": ontology._images[i],
                "answer": "yes",
                "program": {
                    "branches": [[{"operator": "select", "arguments": ["car"]},
                                  {"operator": "relate", "arguments": ["holding", True, "person"]}]],
                    "last_op": {"operator": "verify_rel",
                                "arguments": ["on", False, "table"]},
                },
            }
        )
    import json

    src = tmp_path / "in"
    src.mkdir()
    with open(src / "x.json", "w") as f:
        for q in qs:
            f.write(json.dumps(q) + "\n")
    enc = GQAH5Encoder(ref_ont)
    enc.encode(str(src), str(tmp_path))

    from dfol_vqa_tpu.data.dataset import ProgramDataset

    ds = ProgramDataset(str(tmp_path / "x.h5"), ontology)
    assert len(ds) == 5
    got = ds[0]
    assert got["program"]["last_op"]["operator"] == "verify_rel"
    assert got["program"]["last_op"]["arguments"] == ["on", False, "table"]
    rel = got["program"]["branches"][0][1]
    assert rel["arguments"] == ["holding", True, "person"]


def test_bfloat16_compute_answers_stable(ontology):
    """bf16 matmul inputs: answers unchanged vs fp32 on a real oracle."""
    from dfol_vqa_tpu.data.synthetic import generate_questions

    cfg32 = tiny_cfg(dropout=0.0)
    cfg16 = tiny_cfg(dropout=0.0)
    cfg16.tpu.compute_dtype = "bfloat16"
    i32, i16 = Interpreter(cfg32, ontology), Interpreter(cfg16, ontology)
    params = i32.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 8, terminal="exist", length=2, seed=50)
    loader = make_loader(ontology, cfg32, qs, batch_size=8, shuffle=False)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    obj, mask = jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask)
    o32 = i32.forward(params, obj, mask, arrays, batch.spec, False, None)
    o16 = i16.forward(params, obj, mask, arrays, batch.spec, False, None)
    # log-probs may drift at bf16 matmul precision but answers should agree
    np.testing.assert_array_equal(
        np.asarray(o32["answer_flags"]), np.asarray(o16["answer_flags"])
    )


def test_query_accuracy_uses_substring_rule(ontology):
    """Reference accuracy credit is `answer in option` (substring), while the
    loss target stays exact equality (trainer.py:212 vs 285-293)."""
    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler

    compiler = ProgramCompiler(ontology, object_num=4)
    q = question([[op("select", "car")]], op("choose_attr", ["light blue", "dark"]),
                 answer="blue")
    spec, cb = compiler.compile([q])
    # 'blue' is a substring of option 'light blue' -> accuracy credit
    assert cb.answer_match[0, 0] == 1.0
    # but NOT an exact match -> no loss target
    assert cb.answer_opt[0, 0] == 0.0
    assert cb.answer_opt[0, 1] == 0.0


def test_nonterminal_last_op_auto_end(ontology):
    """Programs ending in filter get an auto-appended `end`
    (batch_gqa_interpreter.py:75-77)."""
    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
    from tests.helpers import static_world

    cfg = Config(normalize_oracle=False)
    cfg.tpu.max_object_num = 4
    compiler = ProgramCompiler(ontology, object_num=4)
    q = question([[op("select", "car")]], op("filter", "red"))
    spec, cb = compiler.compile([q])
    assert spec.terminal_op == "end"
    p_car = np.array([0.9, 0.0, 0.0, 0.0], np.float32)
    p_red = np.array([0.5, 0.0, 0.0, 0.0], np.float32)
    world = static_world(
        ontology,
        [{"car": np.log(np.clip(p_car, 1e-20, 1)), "red": np.log(np.clip(p_red, 1e-20, 1))}],
        [{}], counts=[1], O=4, rel_tokens=cb.rel_tokens,
    )
    arrays = {k: jnp.asarray(v) for k, v in batch_arrays(cb).items()}
    out = Interpreter(cfg, ontology).execute(None, world, arrays, spec, False)
    np.testing.assert_allclose(np.exp(out["log_probability"]), [0.45], rtol=1e-4)


def test_apply_modulation_everywhere_false(ontology):
    """Only the terminal op's modulations are applied; branch-slot mods off
    (reference 'n'-suffix mechanism)."""
    from dfol_vqa_tpu.data.synthetic import generate_questions

    cfg_on = tiny_cfg(dropout=0.0, activate_attention_transfer=True)
    cfg_off = tiny_cfg(dropout=0.0, activate_attention_transfer=True,
                       apply_modulation_everywhere=False)
    i_on, i_off = Interpreter(cfg_on, ontology), Interpreter(cfg_off, ontology)
    params = i_on.init_params(jax.random.PRNGKey(0))
    import jax as _jax

    params["calibrator"]["out"]["w"] = (
        _jax.random.normal(_jax.random.PRNGKey(3),
                           params["calibrator"]["out"]["w"].shape) * 0.5
    )
    qs = generate_questions(ontology, 4, terminal="exist", length=2, seed=77)
    loader = make_loader(ontology, cfg_on, qs, batch_size=4, shuffle=False)
    b = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in b.arrays.items()}
    obj, mask = jnp.asarray(b.objects), jnp.asarray(b.obj_mask)
    o_on = i_on.forward(params, obj, mask, arrays, b.spec, False, None)
    o_off = i_off.forward(params, obj, mask, arrays, b.spec, False, None)
    o_none = i_on.forward(params, obj, mask, arrays, b.spec, False, None,
                          modulator_switch=False)
    # exist terminal has no terminal mods -> 'off' equals no-modulator,
    # and differs from full modulation
    np.testing.assert_array_equal(np.asarray(o_off["log_probability"]),
                                  np.asarray(o_none["log_probability"]))
    assert not np.allclose(np.asarray(o_on["log_probability"]),
                           np.asarray(o_off["log_probability"]))
