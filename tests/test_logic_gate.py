"""NeuralLogicGate (trainable_gate) tests."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.ops.cells import neural_logic_gate

from tests.conftest import requires_reference
from tests.test_pipeline_train import make_loader, tiny_cfg


@requires_reference
def test_gate_matches_reference_module(rng):
    import sys, torch

    sys.path.insert(0, "/root/reference/src")
    from nsvqa.nn.interpreter.batch_base_ops import NeuralLogicGate

    ref = NeuralLogicGate()
    w = np.asarray(rng.standard_normal((2, 6)), np.float32)
    b = np.asarray(rng.standard_normal(6), np.float32)
    ref._linear.weight.data = torch.tensor(w.T)
    ref._linear.bias.data = torch.tensor(b)

    lp = np.log(rng.uniform(0.05, 0.95, (4, 7)).astype(np.float32))
    lq = np.log(rng.uniform(0.05, 0.95, (4, 7)).astype(np.float32))
    with torch.no_grad():
        out_ref = ref(torch.tensor(lp), torch.tensor(lq)).numpy()
    out = neural_logic_gate({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                            jnp.asarray(lp), jnp.asarray(lq))
    np.testing.assert_allclose(np.asarray(out), out_ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow  # trains; quick tier keeps the gate's parametric-not unit tests
def test_trainable_gate_end_to_end(ontology):
    from dfol_vqa_tpu.data.synthetic import generate_questions
    from dfol_vqa_tpu.models.interpreter import Interpreter

    cfg = tiny_cfg(trainable_gate=True, dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    assert "logic_gates" in params

    qs = generate_questions(ontology, 4, terminal="verify_rel", length=2, seed=20)
    loader = make_loader(ontology, cfg, qs, batch_size=4, shuffle=False)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}

    def loss_fn(p):
        return interp.forward(p, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
                              arrays, batch.spec, True, None)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    g = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(grads["logic_gates"]))
    assert g > 0
