"""Fused pair-MLP kernel == the XLA trunk (interpret mode, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu import nn
from dfol_vqa_tpu.models.oracle import _first_layer_split
from dfol_vqa_tpu.ops.pallas.pair_mlp import _pair_mlp_xla, pair_mlp_fused


def _setup(rng, U=2, OP=128, d_att=20, H=16, E=12, extra_hidden=None):
    widths = [H] + (extra_hidden or []) + [E]
    params = nn.mlp_init(jax.random.PRNGKey(3), 2 * d_att + 4, widths[:-1], widths[-1])
    layers = params["layers"]
    w_s, w_o, w_g, b0 = _first_layer_split(layers[0], d_att)
    x = jnp.asarray(rng.standard_normal((U, OP, d_att)), jnp.float32)
    pos = jnp.asarray(rng.uniform(0.05, 0.95, (U, OP, 4)), jnp.float32)
    h_s = jnp.dot(x, w_s, preferred_element_type=jnp.float32)
    h_o = jnp.dot(x, w_o, preferred_element_type=jnp.float32)
    return pos, h_s, h_o, w_g, b0, list(layers[1:])


def _xla_ref(pos, h_s, h_o, w_g, b0, layers):
    from dfol_vqa_tpu.models.featurizer import pair_geometry

    geom = pair_geometry(pos)
    return _pair_mlp_xla(geom[..., 0], geom[..., 1], geom[..., 2], geom[..., 3],
                         h_s, h_o, w_g, b0, layers)


def test_fused_pair_mlp_matches_xla(rng):
    args = _setup(rng)
    out = pair_mlp_fused(*args, out_dtype=jnp.float32, tile=8, interpret=True)
    ref = _xla_ref(*args)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_fused_pair_mlp_deep_chain_and_bf16(rng):
    args = _setup(rng, extra_hidden=[24])
    out = pair_mlp_fused(*args, out_dtype=jnp.bfloat16, tile=16, interpret=True)
    ref = _xla_ref(*args).astype(jnp.bfloat16)
    # bf16 rounding of the same fp32 values
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


def test_fused_pair_mlp_gradients_match_xla(rng):
    args = _setup(rng, U=1, OP=128, H=8, E=6)
    pos = args[0]

    def f_kernel(h_s, h_o, w_g, b0, layers):
        out = pair_mlp_fused(pos, h_s, h_o, w_g, b0, layers,
                             out_dtype=jnp.float32, tile=8, interpret=True)
        return jnp.sum(out * out)

    def f_ref(h_s, h_o, w_g, b0, layers):
        out = _xla_ref(pos, h_s, h_o, w_g, b0, layers)
        return jnp.sum(out * out)

    gk = jax.grad(f_kernel, argnums=(0, 1, 2, 3, 4))(*args[1:])
    gr = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(*args[1:])
    for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow  # quick tier keeps the kernel fwd/bwd/deep-chain parity tests
def test_rel_cache_shared_fused_flag_cpu_noop(ontology):
    """On CPU the Mosaic gate is off: fused_pair_mlp must not change the
    XLA tail (the flag only routes inside use_kernel)."""
    from dfol_vqa_tpu.models import oracle as om

    cfg = Config()
    cfg.dropout = 0.0
    rng = np.random.default_rng(5)
    U, B, O, R = 2, 8, 70, 3  # O >= 64 but backend is CPU
    attr_in_u = jnp.asarray(rng.standard_normal((U, O, cfg.attr_input_dim)), jnp.float32)
    pos_u = jnp.asarray(rng.uniform(0.1, 0.9, (U, O, 4)), jnp.float32)
    img_index = jnp.asarray(rng.integers(0, U, (B,)), jnp.int32)
    rel_cols = np.asarray(ontology._relation_index, np.int32)
    rel_tokens = jnp.asarray(rng.choice(rel_cols, (B, R)) + 1, jnp.int32)
    from dfol_vqa_tpu.models.interpreter import Interpreter

    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    cfg.tpu.fused_pair_mlp = True
    a = om.rel_cache_shared(params, attr_in_u, pos_u, img_index, rel_tokens, cfg)
    cfg.tpu.fused_pair_mlp = False
    b = om.rel_cache_shared(params, attr_in_u, pos_u, img_index, rel_tokens, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pair_mlp_xla_wrapper_matches_reference(rng):
    """pair_mlp_xla (the kernel route's XLA-lowered twin used when
    fused_pair_mlp is off on TPU) is the _pair_mlp_xla formulation exactly:
    on CPU both run true-f32 and must agree bitwise with the reference
    geometry-plane decomposition, and with the interpret-mode kernel to
    fp32 tolerance."""
    from dfol_vqa_tpu.ops.pallas.pair_mlp import pair_mlp_xla

    args = _setup(rng)
    out = pair_mlp_xla(*args, out_dtype=jnp.float32)
    ref = _xla_ref(*args)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    fused = pair_mlp_fused(*args, out_dtype=jnp.float32, tile=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fused),
                               rtol=1e-6, atol=1e-6)
