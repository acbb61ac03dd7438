"""Direct scene-graph supervision ops: object_attr, object_rel, scene."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler, batch_arrays
from dfol_vqa_tpu.data.dataset import ProgramDataset
from dfol_vqa_tpu.data.features import SyntheticFeatures
from dfol_vqa_tpu.data.loader import BatchLoader
from dfol_vqa_tpu.data.synthetic import generate_supervision_questions
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.types import QuestionType

from tests.test_pipeline_train import tiny_cfg


def build(ontology, cfg, terminal, n=6, batch_size=6):
    qs = generate_supervision_questions(
        ontology, n, terminal, n_objects=cfg.tpu.max_object_num, seed=3
    )
    ds = ProgramDataset(qs, ontology)
    compiler = ProgramCompiler(ontology, object_num=cfg.tpu.max_object_num)
    feats = SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=cfg.tpu.max_object_num,
                              max_objects=cfg.tpu.max_object_num)
    loader = BatchLoader([ds], compiler, feats, batch_size, cfg.tpu.max_object_num,
                         shuffle=False, prefetch=0)
    return next(iter(loader))


@pytest.mark.parametrize("terminal", ["object_attr", "object_rel", "scene"])
@pytest.mark.slow
def test_supervision_forward_and_grads(ontology, terminal):
    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    batch = build(ontology, cfg, terminal)
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}

    out = interp.forward(params, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
                         arrays, batch.spec, False, None)
    assert np.isfinite(float(out["loss"]))
    assert np.all(np.asarray(out["match"]) >= 0) and np.all(np.asarray(out["match"]) <= 1)

    def loss_fn(p):
        return interp.forward(p, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
                              arrays, batch.spec, True, None)["loss"]

    grads = jax.grad(loss_fn)(params)
    g = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(g) and g > 0


def test_object_attr_closed_form(ontology):
    """lp of statement (obj j, attr a) == the oracle's ll at (j, a)."""
    from tests.helpers import static_world

    cfg = tiny_cfg(dropout=0.0, normalize_oracle=False)
    cfg.tpu.max_object_num = 4
    interp = Interpreter(cfg, ontology)
    compiler = ProgramCompiler(ontology, object_num=4)
    q = {
        "program": {"branches": [],
                    "last_op": {"operator": "object_attr",
                                "arguments": [[["red"], ["blue", "large"]]]}},
        "answer": [["yes"], ["no", "yes"]],
        "weights": [1.0, 1.0, 1.0],
        "imageId": "i0",
        "question_id": "s0",
    }
    spec, cb = compiler.compile([q])
    p_red = np.array([0.9, 0.1, 0.5, 0.5], np.float32)
    p_blue = np.array([0.2, 0.8, 0.5, 0.5], np.float32)
    p_large = np.array([0.3, 0.6, 0.5, 0.5], np.float32)
    world = static_world(
        ontology,
        [{"red": np.log(p_red), "blue": np.log(p_blue), "large": np.log(p_large)}],
        [{}], counts=[3], O=4, rel_tokens=cb.rel_tokens,
    )
    arrays = {k: jnp.asarray(v) for k, v in batch_arrays(cb).items()}
    out = interp.execute(None, world, arrays, spec, is_training=False)
    lp = np.exp(np.asarray(out["log_probability"][0, :3]))
    np.testing.assert_allclose(lp, [0.9, 0.8, 0.6], rtol=1e-4)
    # match: preds yes/yes/yes vs targets yes/no/yes -> 2/3
    np.testing.assert_allclose(float(out["match"][0]), 2.0 / 3.0, rtol=1e-5)


@pytest.mark.slow
def test_trainer_loop_with_supervision(ontology):
    from dfol_vqa_tpu.train.trainer import VQATrainer
    from dfol_vqa_tpu.train.optim import build_optimizer

    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    trainer = VQATrainer(cfg, interp)
    trainer._tx = build_optimizer(cfg, params)
    opt_state = trainer._tx.init(params)
    batch = build(ontology, cfg, "scene")
    fn = trainer._train_step(batch.spec)
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    params, opt_state, loss, match, _rng = fn(
        params, opt_state, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
        arrays, jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss))
