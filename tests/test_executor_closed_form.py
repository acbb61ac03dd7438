"""Closed-form tests for the compiled executor on static-oracle worlds.

Each test hand-computes the expected fuzzy-logic value from the product
t-norm definitions (SURVEY.md §2: util.py:29-47) and checks the executor
end-to-end: ProgramCompiler -> Interpreter.execute."""

import numpy as np
import jax.numpy as jnp
import pytest

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler, batch_arrays
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.models.interpreter import Interpreter
from tests.helpers import op, question, static_world


@pytest.fixture(scope="module")
def setup(ontology):
    cfg = Config(normalize_oracle=False, likelihood_threshold=0.0)
    cfg.tpu.max_object_num = 4
    interp = Interpreter(cfg, ontology)
    compiler = ProgramCompiler(ontology, object_num=4, rel_slots=2)
    return cfg, interp, compiler


def run(interp, compiler, ontology, questions, attr_tables, rel_tables, counts, train=False):
    spec, batch = compiler.compile(questions)
    world = static_world(
        ontology, attr_tables, rel_tables, counts, O=4, rel_tokens=batch.rel_tokens
    )
    arrays = {k: jnp.asarray(v) for k, v in batch_arrays(batch).items()}
    out = interp.execute(None, world, arrays, spec, is_training=train)
    return spec, batch, out


def test_select_filter_exist(setup, ontology):
    """exist(filter(red, select(car))): p = 1 - prod_o (1 - p_car*p_red)."""
    cfg, interp, compiler = setup
    q = question([[op("select", "car"), op("filter", "red")]], op("exist"), answer="yes")
    p_car = np.array([0.9, 0.2, 0.7, 0.0], np.float32)
    p_red = np.array([0.8, 0.9, 0.1, 0.0], np.float32)
    attr = [{"car": np.log(np.clip(p_car, 1e-20, 1)), "red": np.log(np.clip(p_red, 1e-20, 1))}]
    _, _, out = run(interp, compiler, ontology, [q], attr, [{}], counts=[3])
    expected = 1 - np.prod(1 - (p_car * p_red)[:3])
    np.testing.assert_allclose(np.exp(out["log_probability"]), [expected], rtol=1e-4)
    assert float(out["match"][0]) == (1.0 if expected > 0.5 else 0.0)


def test_exist_ignores_padding_objects(setup, ontology):
    cfg, interp, compiler = setup
    q = question([[op("select", "car")]], op("exist"), answer="no")
    p_car = np.array([0.1, 0.99, 0.99, 0.99], np.float32)  # objects 1-3 are padding
    attr = [{"car": np.log(p_car)}]
    _, _, out = run(interp, compiler, ontology, [q], attr, [{}], counts=[1])
    np.testing.assert_allclose(np.exp(out["log_probability"]), [0.1], rtol=1e-4)


def test_negated_filter(setup, ontology):
    cfg, interp, compiler = setup
    q = question([[op("select", "car"), op("filter", "not(red)")]], op("exist"), answer="yes")
    p_car = np.array([1.0, 1.0, 0.0, 0.0], np.float32)
    p_red = np.array([0.3, 0.6, 0.0, 0.0], np.float32)
    attr = [{"car": np.log(np.clip(p_car, 1e-20, 1)), "red": np.log(np.clip(p_red, 1e-20, 1))}]
    _, _, out = run(interp, compiler, ontology, [q], attr, [{}], counts=[2])
    expected = 1 - (1 - 1.0 * 0.7) * (1 - 1.0 * 0.4)
    np.testing.assert_allclose(np.exp(out["log_probability"]), [expected], rtol=1e-4)


def test_relate_exist(setup, ontology):
    """exist(relate(holding, s=False, person, select(ball))).

    Chain set = ball (object side since is_subject says the NEW entity
    'person' is the subject). attention'_j(ball) = p_ball_j * (1 - prod_i
    (1 - p_holding(i,j) p_person_i)), i != j."""
    cfg, interp, compiler = setup
    q = question(
        [[op("select", "ball"), op("relate", "holding", True, "person")]],
        op("exist"),
        answer="yes",
    )
    n = 3
    p_ball = np.array([0.9, 0.1, 0.5, 0.0], np.float32)
    p_person = np.array([0.2, 0.8, 0.3, 0.0], np.float32)
    p_hold = np.random.default_rng(1).uniform(0.1, 0.9, (4, 4)).astype(np.float32)
    attr = [
        {
            "ball": np.log(np.clip(p_ball, 1e-20, 1)),
            "person": np.log(np.clip(p_person, 1e-20, 1)),
        }
    ]
    rel = [{"holding": np.log(p_hold)}]
    spec, batch, out = run(interp, compiler, ontology, [q], attr, rel, counts=[n])

    # after relate (is_subject=True): chain continues with SUBJECT side =
    # new select(person); subject att_i = p_person_i * (1 - prod_{j!=i}
    # (1 - p_hold[i,j] * p_ball_j))
    att = np.zeros(n)
    for i in range(n):
        prod = 1.0
        for j in range(n):
            if j != i:
                prod *= 1 - p_hold[i, j] * p_ball[j]
        att[i] = p_person[i] * (1 - prod)
    expected = 1 - np.prod(1 - att)
    np.testing.assert_allclose(np.exp(out["log_probability"]), [expected], rtol=1e-3)


def test_and_or_two_branches(setup, ontology):
    cfg, interp, compiler = setup
    branches = [[op("select", "car"), op("filter", "red")], [op("select", "dog")]]
    p_car = np.array([0.9, 0.0, 0.0, 0.0], np.float32)
    p_red = np.array([0.5, 0.0, 0.0, 0.0], np.float32)
    p_dog = np.array([0.4, 0.0, 0.0, 0.0], np.float32)
    attr = [
        {
            "car": np.log(np.clip(p_car, 1e-20, 1)),
            "red": np.log(np.clip(p_red, 1e-20, 1)),
            "dog": np.log(np.clip(p_dog, 1e-20, 1)),
        }
    ]
    p1, p2 = 0.9 * 0.5, 0.4
    for term, expected in [("and", p1 * p2), ("or", 1 - (1 - p1) * (1 - p2))]:
        q = question(branches, op(term), answer="yes")
        _, _, out = run(interp, compiler, ontology, [q], attr, [{}], counts=[1])
        np.testing.assert_allclose(np.exp(out["log_probability"]), [expected], rtol=1e-4)


def test_query_attr_answer_and_loss(setup, ontology):
    """query_attr(color) after select(car): best color wins."""
    cfg, interp, compiler = setup
    q = question([[op("select", "car")]], op("query_attr", "color"), answer="red")
    colors = ontology.query("color")
    p_car = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    table = {"car": np.log(np.clip(p_car, 1e-20, 1))}
    for c in colors:
        p = 0.9 if c == "red" else 0.05
        table[c] = np.log(np.full(4, p, np.float32))
    spec, batch, out = run(interp, compiler, ontology, [q], [table], [{}], counts=[1])
    flags = np.asarray(out["answer_flags"][0])
    picked = [batch.option_strings[0][k] for k in range(len(batch.option_strings[0])) if flags[k]]
    assert picked == ["red"]
    assert float(out["match"][0]) == 1.0
    assert float(out["loss"]) > 0


def test_verify_attrs_two_attributes(setup, ontology):
    """verify_attrs([red, large]) == AND of both filters (prior double-counted
    exactly as upstream, batch_gqa_ops.py:452-463)."""
    cfg, interp, compiler = setup
    q = question(
        [[op("select", "car")]], op("verify_attrs", ["red", "large"]), answer="yes"
    )
    p_car = np.array([0.9, 0.0, 0.0, 0.0], np.float32)
    p_red = np.array([0.8, 0.0, 0.0, 0.0], np.float32)
    p_large = np.array([0.7, 0.0, 0.0, 0.0], np.float32)
    attr = [
        {
            "car": np.log(np.clip(p_car, 1e-20, 1)),
            "red": np.log(np.clip(p_red, 1e-20, 1)),
            "large": np.log(np.clip(p_large, 1e-20, 1)),
        }
    ]
    _, _, out = run(interp, compiler, ontology, [q], attr, [{}], counts=[1])
    # combined att = (p_car*p_red) * (p_car*p_large)  [prior counted twice]
    expected = (0.9 * 0.8) * (0.9 * 0.7)
    np.testing.assert_allclose(np.exp(out["log_probability"]), [expected], rtol=1e-4)


def test_compare(setup, ontology):
    cfg, interp, compiler = setup
    branches = [[op("select", "car")], [op("select", "dog")]]
    q = question(branches, op("compare", "large", False), answer="car")
    p_car = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    p_dog = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
    p_large = np.array([0.9, 0.0, 0.0, 0.0], np.float32)
    attr = [
        {
            "car": np.log(np.clip(p_car, 1e-20, 1)),
            "dog": np.log(np.clip(p_dog, 1e-20, 1)),
            "large": np.log(np.clip(p_large, 1e-20, 1)),
        }
    ]
    # both priors are certainty-1 singletons, same p_large -> tie -> softmax
    # 50/50; argmax picks option 0 = branch-0 name ('car')
    spec, batch, out = run(interp, compiler, ontology, [q], attr, [{}], counts=[1])
    assert batch.option_strings[0] == ["car", "dog"]
    assert float(out["match"][0]) == 1.0


def test_mixed_batch_with_masks(setup, ontology):
    """Different-length programs in one batch exercise slot masks."""
    cfg, interp, compiler = setup
    q1 = question([[op("select", "car"), op("filter", "red")]], op("exist"), answer="yes")
    q2 = question([[op("select", "dog")]], op("exist"), answer="no")
    p = {
        "car": np.array([0.9, 0.6, 0.0, 0.0], np.float32),
        "red": np.array([0.5, 0.5, 0.0, 0.0], np.float32),
        "dog": np.array([0.3, 0.2, 0.0, 0.0], np.float32),
    }
    attr = [dict((k, np.log(np.clip(v, 1e-20, 1))) for k, v in p.items())] * 2
    _, _, out = run(interp, compiler, ontology, [q1, q2], attr, [{}, {}], counts=[2, 2])
    e1 = 1 - (1 - 0.9 * 0.5) * (1 - 0.6 * 0.5)
    e2 = 1 - (1 - 0.3) * (1 - 0.2)
    np.testing.assert_allclose(np.exp(out["log_probability"]), [e1, e2], rtol=1e-4)
