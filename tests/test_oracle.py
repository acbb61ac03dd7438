"""Oracle tests: shapes/vocab behavior + parity against the reference MLPs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.models import oracle as om
from dfol_vqa_tpu.models.featurizer import featurize_objects, pair_geometry

from tests.conftest import requires_reference


def tiny_cfg():
    cfg = Config(
        box_features_dim=32,
        oracle_input_dim=16,
        word_embedding_dim=12,
        featurizer_layers_config=[],
        attribute_network_layers_config=[8],
        relation_network_layers_config=[8],
        dropout=0.0,
    )
    cfg.tpu.max_object_num = 6
    return cfg


def make_objects(rng, B, O, box_dim):
    obj = np.zeros((B, O, box_dim + 6), np.float32)
    obj[..., :box_dim] = rng.standard_normal((B, O, box_dim)).astype(np.float32)
    obj[..., box_dim] = 640  # image w
    obj[..., box_dim + 1] = 480  # image h
    obj[..., box_dim + 2] = rng.uniform(0, 600, (B, O))  # x
    obj[..., box_dim + 3] = rng.uniform(0, 440, (B, O))  # y
    obj[..., box_dim + 4] = rng.uniform(5, 40, (B, O))  # w
    obj[..., box_dim + 5] = rng.uniform(5, 40, (B, O))  # h
    return obj


def test_shapes(ontology, rng):
    cfg = tiny_cfg()
    params = om.init_oracle_params(jax.random.PRNGKey(0), cfg, ontology)
    B, O = 2, 6
    obj = make_objects(rng, B, O, cfg.box_features_dim)
    attr_in, pos = featurize_objects(params["featurizer"], jnp.asarray(obj), cfg)
    assert attr_in.shape == (B, O, cfg.oracle_input_dim + 4)
    cache = om.attr_cache(params, attr_in, cfg)
    pad = cfg.tpu.vocab_pad_multiple
    v_pad = -(-ontology.num_tokens // pad) * pad
    assert cache.shape == (B, v_pad + 1, O)  # vocab-major (types.py)
    assert np.allclose(np.asarray(cache[:, 0, :]), om.DEFAULT_LOG_LIKELIHOOD)

    rel_tokens = jnp.asarray(rng.integers(1, 300, size=(B, 3)), jnp.int32)
    rel_tokens = rel_tokens.at[0, 2].set(0)  # pad slot
    rc = om.rel_cache(params, attr_in, pos, rel_tokens, cfg)
    assert rc.shape == (B, 3, O, O)  # R-major layout (types.py)
    assert np.allclose(np.asarray(rc[0, 2]), om.DEFAULT_LOG_LIKELIHOOD)


def test_rel_block_chunking_matches_unchunked(ontology, rng):
    cfg = tiny_cfg()
    params = om.init_oracle_params(jax.random.PRNGKey(0), cfg, ontology)
    B, O = 2, 7
    obj = make_objects(rng, B, O, cfg.box_features_dim)
    attr_in, pos = featurize_objects(params["featurizer"], jnp.asarray(obj), cfg)
    rel_tokens = jnp.asarray(rng.integers(1, 300, size=(B, 2)), jnp.int32)
    full = om.rel_cache(params, attr_in, pos, rel_tokens, cfg)
    cfg.tpu.rel_block_size = 3
    blocked = om.rel_cache(params, attr_in, pos, rel_tokens, cfg)
    np.testing.assert_allclose(np.asarray(full), np.asarray(blocked), rtol=1e-5, atol=1e-6)


def _torch_mlp_from_params(torch, nn_t, p, final):
    """Build a torch Sequential equivalent to our mlp params (eval mode)."""
    layers = []
    for i, lp in enumerate(p["layers"]):
        lin = nn_t.Linear(lp["w"].shape[0], lp["w"].shape[1])
        lin.weight.data = torch.tensor(np.asarray(lp["w"]).T)
        lin.bias.data = torch.tensor(np.asarray(lp["b"]))
        layers.append(lin)
        if i < len(p["layers"]) - 1:
            layers.append(nn_t.ELU())
    layers.append(final)
    return nn_t.Sequential(*layers)


@requires_reference
def test_attr_cache_matches_reference_mlp(ontology, rng):
    """Our fused attribute cache == torch embedding(attr_net(feats)) columns."""
    import torch
    import torch.nn as nn_t

    cfg = tiny_cfg()
    params = om.init_oracle_params(jax.random.PRNGKey(1), cfg, ontology)
    B, O = 2, 5
    obj = make_objects(rng, B, O, cfg.box_features_dim)
    attr_in, pos = featurize_objects(params["featurizer"], jnp.asarray(obj), cfg)
    cache = np.asarray(om.attr_cache(params, attr_in, cfg))

    attr_net = _torch_mlp_from_params(torch, nn_t, params["attribute_network"], nn_t.Sigmoid())
    emb = nn_t.Linear(cfg.embedding_input_dim, ontology.num_tokens)
    emb.weight.data = torch.tensor(np.asarray(params["embedding"]["w"]).T)
    emb.bias.data = torch.tensor(np.asarray(params["embedding"]["b"]))
    with torch.no_grad():
        x = torch.tensor(np.asarray(attr_in).reshape(B * O, -1))
        ref = torch.nn.functional.logsigmoid(emb(attr_net(x))).numpy().reshape(B, O, -1)

    # vocab-major cache: compare rows 1.. transposed back to (B, O, V)
    np.testing.assert_allclose(
        np.moveaxis(cache[:, 1:, :], 1, 2), ref, rtol=1e-4, atol=1e-5
    )


@requires_reference
def test_rel_cache_matches_reference_pair_mlp(ontology, rng):
    """Decomposed first layer == torch MLP on explicitly concatenated pair rows.

    Pair features follow batch_gqa_boxfeatures_pipeline.py:251-279:
    [f_i ‖ f_j ‖ dist ‖ angle ‖ h_side ‖ v_side]."""
    import torch
    import torch.nn as nn_t

    cfg = tiny_cfg()
    params = om.init_oracle_params(jax.random.PRNGKey(2), cfg, ontology)
    B, O = 2, 5
    obj = make_objects(rng, B, O, cfg.box_features_dim)
    attr_in, pos = featurize_objects(params["featurizer"], jnp.asarray(obj), cfg)
    rel_tokens = np.asarray(rng.integers(1, 300, size=(B, 3)), np.int32)
    ours = np.asarray(om.rel_cache(params, attr_in, pos, jnp.asarray(rel_tokens), cfg))

    rel_net = _torch_mlp_from_params(torch, nn_t, params["relation_network"], nn_t.Sigmoid())
    emb = nn_t.Linear(cfg.embedding_input_dim, ontology.num_tokens)
    emb.weight.data = torch.tensor(np.asarray(params["embedding"]["w"]).T)
    emb.bias.data = torch.tensor(np.asarray(params["embedding"]["b"]))

    ai = np.asarray(attr_in)
    geom = np.asarray(pair_geometry(pos))
    with torch.no_grad():
        for b in range(B):
            for i in range(O):
                for j in range(O):
                    pair = np.concatenate([ai[b, i], ai[b, j], geom[b, i, j]])
                    h = rel_net(torch.tensor(pair[None]))
                    scores = torch.nn.functional.logsigmoid(emb(h)).numpy()[0]
                    for r, tok in enumerate(rel_tokens[b]):
                        np.testing.assert_allclose(
                            ours[b, r, i, j], scores[tok - 1], rtol=1e-4, atol=1e-5
                        )


def test_normalize_over_options(rng):
    from dfol_vqa_tpu.ops.cells import normalize_over_options

    ll = jnp.asarray(np.log(rng.uniform(0.05, 0.9, size=(2, 3, 4)).astype(np.float32)))
    mask = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    out = np.asarray(normalize_over_options(ll, mask))
    # group of size 2: normalized over valid options
    denom = np.log(np.exp(np.asarray(ll[0, :2])).sum(0))
    np.testing.assert_allclose(out[0, :2], np.asarray(ll[0, :2]) - denom, rtol=1e-5)
    # batch has a multi-option group -> singleton groups are normalised too
    # (-> ~0 via the exp/log roundtrip), matching _build_map semantics
    np.testing.assert_allclose(out[1, 0], 0.0, atol=1e-6)
    # all-singleton batch -> untouched
    mask1 = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    out1 = np.asarray(normalize_over_options(ll, mask1))
    np.testing.assert_allclose(out1[0, 0], np.asarray(ll[0, 0]), rtol=1e-6)
