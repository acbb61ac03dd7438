"""Shared-pair-code relation path == per-question path (image dedup)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.models.interpreter import Interpreter
from tests.test_pipeline_train import make_loader, tiny_cfg


@pytest.mark.slow
def test_shared_relation_cache_matches_per_question(ontology):
    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    # heavy image sharing -> U*2 <= B triggers the shared path
    qs = generate_questions(ontology, 12, terminal="verify_rel", length=2,
                            seed=60, image_pool=3)
    loader = make_loader(ontology, cfg, qs, batch_size=12, shuffle=False)
    b = next(iter(loader))
    assert b.objects.shape[0] * 2 <= 12  # dedup happened
    arrays = {k: jnp.asarray(v) for k, v in b.arrays.items()}
    out_shared = interp.forward(
        params, jnp.asarray(b.objects), jnp.asarray(b.obj_mask), arrays, b.spec, False, None
    )
    idx = np.asarray(b.arrays["img_index"])
    obj_q = jnp.asarray(b.objects)[idx]
    mask_q = jnp.asarray(b.obj_mask)[idx]
    arrays_q = {k: v for k, v in arrays.items() if k != "img_index"}
    out_pq = interp.forward(params, obj_q, mask_q, arrays_q, b.spec, False, None)
    np.testing.assert_allclose(
        np.asarray(out_shared["log_probability"]),
        np.asarray(out_pq["log_probability"]),
        rtol=1e-5, atol=1e-6,
    )
    # gradients flow through the shared path too
    def loss(p):
        return interp.forward(p, jnp.asarray(b.objects), jnp.asarray(b.obj_mask),
                              arrays, b.spec, True, None)["loss"]

    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0
