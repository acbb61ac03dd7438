"""Calibrator (attention-transfer) tests.

Key invariant: with the reference's zero-weight output-head init
(gqa_interpreter_experiments.py:124-132), modulations are exactly the
identity transform, so enabling the modulator must NOT change any output.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.data.loader import BatchLoader
from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.models.interpreter import Interpreter

from tests.test_pipeline_train import make_loader, tiny_cfg


TERMS = ["exist", "verify_rel", "query_attr", "choose_rel", "two_same", "compare", "and"]


@pytest.mark.parametrize("term", TERMS)
def test_zero_init_modulator_is_identity(ontology, term):
    cfg_off = tiny_cfg(dropout=0.0)
    cfg_on = tiny_cfg(dropout=0.0, activate_attention_transfer=True)
    interp_off = Interpreter(cfg_off, ontology)
    interp_on = Interpreter(cfg_on, ontology)
    params = interp_on.init_params(jax.random.PRNGKey(0))

    qs = generate_questions(ontology, 6, terminal=term, length=2, seed=11)
    loader = make_loader(ontology, cfg_on, qs, batch_size=6, shuffle=False)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    obj = jnp.asarray(batch.objects)
    mask = jnp.asarray(batch.obj_mask)

    out_on = interp_on.forward(params, obj, mask, arrays, batch.spec, True, None)
    out_off = interp_off.forward(
        {k: v for k, v in params.items() if k != "calibrator"},
        obj, mask, arrays, batch.spec, True, None,
    )
    np.testing.assert_allclose(
        np.asarray(out_on["log_probability"]),
        np.asarray(out_off["log_probability"]),
        rtol=1e-4, atol=1e-5,
    )


def test_modulator_disabled_for_open_questions_at_eval(ontology):
    """trainer.py:97: modulator off for QUERY questions at test time."""
    cfg = tiny_cfg(dropout=0.0, activate_attention_transfer=True)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    # make the modulator non-identity
    params["calibrator"]["out"]["w"] = (
        jax.random.normal(jax.random.PRNGKey(3), params["calibrator"]["out"]["w"].shape) * 0.5
    )
    qs = generate_questions(ontology, 4, terminal="query_attr", length=1, seed=12)
    loader = make_loader(ontology, cfg, qs, batch_size=4, shuffle=False)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    obj, mask = jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask)

    out_eval = interp.forward(params, obj, mask, arrays, batch.spec, False, None)
    out_eval_nomod = interp.forward(
        params, obj, mask, arrays, batch.spec, False, None, modulator_switch=False
    )
    np.testing.assert_array_equal(
        np.asarray(out_eval["log_probability"]), np.asarray(out_eval_nomod["log_probability"])
    )
    # but during training the modulator IS active (different outputs)
    out_train = interp.forward(params, obj, mask, arrays, batch.spec, True, None)
    assert not np.allclose(
        np.asarray(out_train["log_probability"]), np.asarray(out_eval["log_probability"])
    )


@pytest.mark.slow  # trains; quick tier keeps zero-init identity + eval-gating calibrator tests
def test_calibrator_receives_gradients(ontology):
    cfg = tiny_cfg(dropout=0.0, activate_attention_transfer=True)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 4, terminal="exist", length=2, seed=13)
    loader = make_loader(ontology, cfg, qs, batch_size=4, shuffle=False)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    obj, mask = jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask)

    def loss_fn(p):
        return interp.forward(p, obj, mask, arrays, batch.spec, True, None)["loss"]

    grads = jax.grad(loss_fn)(params)
    g = grads["calibrator"]
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total)
    # output head weight is zero-init but must still receive gradient
    assert float(jnp.sum(jnp.abs(g["out"]["w"]))) > 0
