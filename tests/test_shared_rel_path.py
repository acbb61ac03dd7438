"""Shared-pair-code relation path == per-question path (image dedup)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.models.interpreter import Interpreter
from tests.test_pipeline_train import make_loader, tiny_cfg


def test_contract_then_gather_matches_per_question_form(ontology):
    """rel_cache_shared's contract-then-gather tail == the gather-then-
    contract form: same E-contraction, so agreement to float tolerance."""
    from dfol_vqa_tpu.config import Config
    from dfol_vqa_tpu.models import oracle as om

    cfg = Config()
    cfg.dropout = 0.0
    cfg.tpu.use_pallas = False
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(7)
    U, B, O, R = 3, 12, 6, 4
    attr_in_u = jnp.asarray(rng.standard_normal((U, O, cfg.attr_input_dim)), jnp.float32)
    pos_u = jnp.asarray(rng.uniform(0.1, 0.9, (U, O, 4)), jnp.float32)
    img_index = jnp.asarray(rng.integers(0, U, (B,)), jnp.int32)
    rel_cols = np.asarray(ontology._relation_index, np.int32)
    toks = rng.choice(rel_cols, (B, R)) + 1  # 1-based relation codes
    toks[0, 0] = 0  # a pad slot -> default_ll in both forms
    rel_tokens = jnp.asarray(toks, jnp.int32)

    ll_ctg = om.rel_cache_shared(
        params, attr_in_u, pos_u, img_index, rel_tokens, cfg,
        rel_gather=interp._rel_gather_map,
    )
    cfg.tpu.rel_contract_then_gather = False
    ll_pq = om.rel_cache_shared(
        params, attr_in_u, pos_u, img_index, rel_tokens, cfg,
        rel_gather=interp._rel_gather_map,
    )
    cfg.tpu.rel_contract_then_gather = True
    assert ll_ctg.shape == (B, R, O, O)
    np.testing.assert_allclose(np.asarray(ll_ctg), np.asarray(ll_pq),
                               rtol=1e-5, atol=1e-6)
    # gradients flow through the gather formulation
    def s(p):
        return jnp.sum(om.rel_cache_shared(
            p, attr_in_u, pos_u, img_index, rel_tokens, cfg,
            rel_gather=interp._rel_gather_map,
        ))

    g = jax.grad(s)(params)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


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


def test_debug_checks_poisons_out_of_vocab_rel_tokens(ontology):
    """With tpu.debug_checks, a hand-built batch whose rel slot carries a
    non-relation token fails loudly (NaN) in the contract-then-gather path
    instead of silently scoring logsigmoid(bias)."""
    from dfol_vqa_tpu.config import Config
    from dfol_vqa_tpu.models import oracle as om

    cfg = Config()
    cfg.dropout = 0.0
    cfg.tpu.use_pallas = False
    cfg.tpu.debug_checks = True
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(11)
    U, B, O, R = 2, 6, 5, 3
    attr_in_u = jnp.asarray(rng.standard_normal((U, O, cfg.attr_input_dim)), jnp.float32)
    pos_u = jnp.asarray(rng.uniform(0.1, 0.9, (U, O, 4)), jnp.float32)
    img_index = jnp.asarray(rng.integers(0, U, (B,)), jnp.int32)
    rel_cols = set(int(c) for c in np.asarray(ontology._relation_index))
    toks = rng.choice(np.asarray(sorted(rel_cols), np.int32), (B, R)) + 1
    # a NOUN token (not in the relation sub-vocabulary) in a rel slot
    noun_code = next(
        c for c in range(1, 2336) if (c - 1) not in rel_cols
    )
    toks[1, 2] = noun_code
    toks[0, 0] = 0  # pad slots stay default_ll, never poisoned
    rel_tokens = jnp.asarray(toks, jnp.int32)

    ll = om.rel_cache_shared(
        params, attr_in_u, pos_u, img_index, rel_tokens, cfg,
        rel_gather=interp._rel_gather_map,
    )
    out = np.array(ll)  # writable copy
    assert np.isnan(out[1, 2]).all()  # the bad slot is poisoned
    out[1, 2] = 0.0
    assert np.isfinite(out).all()  # everything else untouched
    # pad slot carries default_ll, not NaN
    assert np.allclose(out[0, 0], om.DEFAULT_LOG_LIKELIHOOD)
