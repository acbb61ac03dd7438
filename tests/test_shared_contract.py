"""Fused gather+contract kernel (shared-image relation path) vs XLA.

On CPU the kernel runs in interpret mode; on TPU it compiles via Mosaic
(scripts/tpu_smoke.py exercises the compiled path).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.models import oracle as om
from dfol_vqa_tpu.ops.pallas.shared_contract import shared_contract_pallas


def _make_inputs(rng, U, B, O, E, R, sorted_imgs):
    h2 = jax.nn.sigmoid(jnp.asarray(rng.standard_normal((U, O, O, E)), jnp.float32))
    if sorted_imgs:
        img_index = np.sort(rng.integers(0, U, B)).astype(np.int32)
    else:
        img_index = rng.integers(0, U, B).astype(np.int32)
    e_sel = jnp.asarray(rng.standard_normal((B, R, E)), jnp.float32)
    b_sel = jnp.asarray(rng.standard_normal((B, R)), jnp.float32)
    rel_tokens = rng.integers(1, 300, (B, R)).astype(np.int32)
    rel_tokens[0, -1] = 0  # pad slot
    rel_tokens[-1, 0] = 0
    return h2, jnp.asarray(img_index), e_sel, b_sel, jnp.asarray(rel_tokens)


def _xla_tail(h2, img_index, e_sel, b_sel, rel_tokens, default_ll):
    h2_q = jnp.take(h2, img_index, axis=0)
    logits = (
        jnp.einsum("bije,bre->brij", h2_q, e_sel, preferred_element_type=jnp.float32)
        + b_sel[:, :, None, None]
    )
    ll = jax.nn.log_sigmoid(logits)
    return jnp.where((rel_tokens == 0)[:, :, None, None], default_ll, ll)


@pytest.mark.parametrize("O,sorted_imgs", [(7, True), (16, False), (20, True)])
def test_shared_contract_matches_xla(rng, O, sorted_imgs):
    U, B, E, R = 3, 6, 24, 4
    h2, img_index, e_sel, b_sel, rel_tokens = _make_inputs(
        rng, U, B, O, E, R, sorted_imgs
    )
    ref = _xla_tail(h2, img_index, e_sel, b_sel, rel_tokens, om.DEFAULT_LOG_LIKELIHOOD)
    out = shared_contract_pallas(
        h2, img_index, e_sel, b_sel, rel_tokens, om.DEFAULT_LOG_LIKELIHOOD,
        tile=8, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert np.allclose(np.asarray(out[0, -1]), om.DEFAULT_LOG_LIKELIHOOD)


def test_shared_contract_grads_match_xla(rng):
    U, B, O, E, R = 2, 5, 9, 16, 3
    h2, img_index, e_sel, b_sel, rel_tokens = _make_inputs(rng, U, B, O, E, R, False)

    def loss_pallas(h2, e_sel, b_sel):
        out = shared_contract_pallas(
            h2, img_index, e_sel, b_sel, rel_tokens, om.DEFAULT_LOG_LIKELIHOOD,
            tile=8, interpret=True,
        )
        return jnp.sum(jnp.sin(out))  # non-uniform cotangent

    def loss_xla(h2, e_sel, b_sel):
        out = _xla_tail(h2, img_index, e_sel, b_sel, rel_tokens, om.DEFAULT_LOG_LIKELIHOOD)
        return jnp.sum(jnp.sin(out))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(h2, e_sel, b_sel)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(h2, e_sel, b_sel)
    for a, b, name in zip(gp, gx, ["dh2", "de_sel", "db_sel"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_rel_cache_shared_uses_kernel_only_on_tpu(ontology, rng, monkeypatch):
    """On CPU rel_cache_shared must take the XLA tail even with use_pallas on
    (interpret-mode kernels would silently slow every eval); the kernel path
    is selected when the backend is TPU."""
    from dfol_vqa_tpu.config import Config

    cfg = Config(
        box_features_dim=16, oracle_input_dim=8, word_embedding_dim=8,
        featurizer_layers_config=[], attribute_network_layers_config=[8],
        relation_network_layers_config=[8], dropout=0.0,
    )
    cfg.tpu.use_pallas = True
    params = om.init_oracle_params(jax.random.PRNGKey(0), cfg, ontology)
    U, B, O = 2, 4, 5
    attr_in_u = jnp.asarray(rng.standard_normal((U, O, cfg.attr_input_dim)), jnp.float32)
    pos_u = jnp.asarray(rng.uniform(0, 1, (U, O, 4)), jnp.float32)
    img_index = jnp.asarray([0, 0, 1, 1], jnp.int32)
    rel_tokens = jnp.asarray(rng.integers(1, 100, (B, 3)), jnp.int32)

    called = []
    import dfol_vqa_tpu.ops.pallas.shared_contract as sc

    orig = sc.shared_contract_pallas
    monkeypatch.setattr(
        sc, "shared_contract_pallas",
        lambda *a, **k: (called.append(1), orig(*a, **k, interpret=True))[1]
        if "interpret" not in k else orig(*a, **k),
    )
    out = om.rel_cache_shared(params, attr_in_u, pos_u, img_index, rel_tokens, cfg)
    assert out.shape == (B, 3, O, O)
    assert not called  # CPU backend -> XLA tail
