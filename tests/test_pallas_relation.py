"""Pallas relation-oracle kernel vs the XLA reference path.

On CPU the kernel runs in interpret mode; on TPU it compiles via Mosaic.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.models import oracle as om
from dfol_vqa_tpu.models.featurizer import featurize_objects
from dfol_vqa_tpu.ontology import GQAOntology
from dfol_vqa_tpu.ops.pallas.relation_oracle import rel_cache_pallas


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
    return cfg


@pytest.mark.parametrize("B,O", [(2, 7), (3, 16)])
def test_pallas_matches_xla(ontology, rng, B, O):
    cfg = tiny_cfg()
    params = om.init_oracle_params(jax.random.PRNGKey(0), cfg, ontology)
    obj = np.zeros((B, O, cfg.box_features_dim + 6), np.float32)
    obj[..., : cfg.box_features_dim] = rng.standard_normal((B, O, cfg.box_features_dim))
    obj[..., cfg.box_features_dim] = 640
    obj[..., cfg.box_features_dim + 1] = 480
    obj[..., cfg.box_features_dim + 2] = rng.uniform(0, 600, (B, O))
    obj[..., cfg.box_features_dim + 3] = rng.uniform(0, 440, (B, O))
    obj[..., cfg.box_features_dim + 4] = rng.uniform(5, 40, (B, O))
    obj[..., cfg.box_features_dim + 5] = rng.uniform(5, 40, (B, O))
    attr_in, pos = featurize_objects(params["featurizer"], jnp.asarray(obj), cfg)
    rel_tokens = jnp.asarray(rng.integers(1, 2300, (B, 4)), jnp.int32)
    rel_tokens = rel_tokens.at[0, 3].set(0)  # pad slot

    ref = om.rel_cache(params, attr_in, pos, rel_tokens, cfg)
    out = rel_cache_pallas(params, attr_in, pos, rel_tokens, cfg, tile=8)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
    # pad slot carries the default log-likelihood (R-major layout, types.py)
    assert np.allclose(np.asarray(out[0, 3]), om.DEFAULT_LOG_LIKELIHOOD)


def test_interpreter_use_pallas_flag(ontology, rng):
    """End-to-end executor equality with cfg.tpu.use_pallas on."""
    from dfol_vqa_tpu.data.synthetic import generate_questions
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from tests.test_pipeline_train import make_loader, tiny_cfg as pipeline_cfg

    cfg1 = pipeline_cfg(dropout=0.0)
    cfg2 = pipeline_cfg(dropout=0.0)
    cfg2.tpu.use_pallas = True
    i1, i2 = Interpreter(cfg1, ontology), Interpreter(cfg2, ontology)
    params = i1.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 4, terminal="verify_rel", length=2, seed=40)
    loader = make_loader(ontology, cfg1, qs, batch_size=4, shuffle=False)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    obj, mask = jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask)
    o1 = i1.forward(params, obj, mask, arrays, batch.spec, False, None)
    o2 = i2.forward(params, obj, mask, arrays, batch.spec, False, None)
    np.testing.assert_allclose(
        np.asarray(o1["log_probability"]), np.asarray(o2["log_probability"]),
        rtol=2e-3, atol=2e-3,
    )
