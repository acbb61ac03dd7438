"""Fused Pallas kernel for the O^2 relation-oracle pair pass.

The relation likelihood cache is the framework's widest computation
(SURVEY.md §5: the O^2 pair dimension is the memory scaler). The XLA path
(models/oracle.py rel_cache) materialises two (B, O, O, H) intermediates in
HBM — the post-ELU hidden and the sigmoid'd embedding-space pair code. This
kernel fuses the whole pair tail per (O_i, O_j) tile in VMEM:

    h1 = elu(h_subj[i] + h_obj[j] + geom[i,j] @ Wg + b0)      (TI*TJ, H)
    h2 = sigmoid(h1 @ W2 + b2)                                 (TI*TJ, E)
    out[i,j,r] = logsigmoid(h2 · e_sel[r] + b_sel[r])          (TI, TJ, R)

so only the (B, O, O, R) result (R = per-question relation-table slots,
typically 4-16) ever touches HBM. The two big matmuls run on the MXU with
(TI*TJ)-row operands.

A custom VJP pairs the forward with a fused backward kernel (same tiling,
recompute-in-VMEM) so the training path is fully Pallas too; weight
gradients accumulate across grid steps via output-block revisiting.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.models.featurizer import pair_geometry
from dfol_vqa_tpu.models.oracle import DEFAULT_LOG_LIKELIHOOD, _first_layer_split
from dfol_vqa_tpu import nn


def _kernel(hs_ref, ho_ref, geom_ref, wg_ref, b0_ref, w2_ref, b2_ref,
            esel_ref, bsel_ref, out_ref):
    TI = hs_ref.shape[1]
    TJ = ho_ref.shape[1]
    H = hs_ref.shape[2]
    E = w2_ref.shape[1]
    R = esel_ref.shape[1]

    hs = hs_ref[0]  # (TI, H)
    ho = ho_ref[0]  # (TJ, H)
    geom = geom_ref[0].reshape(TI * TJ, geom_ref.shape[3])  # (TI*TJ, 4)

    g = jnp.dot(geom, wg_ref[:], preferred_element_type=jnp.float32)  # (TI*TJ, H)
    h1 = (
        hs[:, None, :] + ho[None, :, :]
    ).reshape(TI * TJ, H) + g + b0_ref[:]
    # elu without expm1 (unsupported by the Mosaic lowering)
    h1 = jnp.where(h1 > 0, h1, jnp.exp(jnp.minimum(h1, 0.0)) - 1.0)
    h2 = jax.nn.sigmoid(
        jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    )  # (TI*TJ, E)
    logits = (
        jnp.dot(h2, esel_ref[0].T, preferred_element_type=jnp.float32)
        + bsel_ref[0, 0][None, :]
    )  # (TI*TJ, R)
    out_ref[0] = jax.nn.log_sigmoid(logits).reshape(TI, TJ, R)


def _bwd_kernel(hs_ref, ho_ref, geom_ref, wg_ref, b0_ref, w2_ref, b2_ref,
                esel_ref, bsel_ref, g_ref,
                dhs_ref, dho_ref, dgeom_ref, dwg_ref, db0_ref, dw2_ref,
                db2_ref, desel_ref, dbsel_ref):
    """Fused backward: recompute the tile's activations in VMEM, emit all
    gradients. Accumulating outputs are zero-initialised on their first
    visit and accumulated on revisits (weight grads / dh_s); dh_o uses a
    per-i-tile partial-sum layout (summed by XLA afterwards) because its
    (b, j) blocks would be revisited non-consecutively."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    TI = hs_ref.shape[1]
    TJ = ho_ref.shape[1]
    H = hs_ref.shape[2]
    R = esel_ref.shape[1]

    hs = hs_ref[0]
    ho = ho_ref[0]
    geom = geom_ref[0].reshape(TI * TJ, geom_ref.shape[3])

    z1 = (hs[:, None, :] + ho[None, :, :]).reshape(TI * TJ, H) + jnp.dot(
        geom, wg_ref[:], preferred_element_type=jnp.float32
    ) + b0_ref[:]
    h1 = jnp.where(z1 > 0, z1, jnp.exp(jnp.minimum(z1, 0.0)) - 1.0)
    z2 = jnp.dot(h1, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    h2 = jax.nn.sigmoid(z2)
    logits = jnp.dot(h2, esel_ref[0].T, preferred_element_type=jnp.float32) + bsel_ref[0, 0][None, :]

    g = g_ref[0].reshape(TI * TJ, R)
    dlogits = g * jax.nn.sigmoid(-logits)
    dh2 = jnp.dot(dlogits, esel_ref[0], preferred_element_type=jnp.float32)
    dz2 = dh2 * h2 * (1.0 - h2)
    dh1 = jnp.dot(dz2, w2_ref[:].T, preferred_element_type=jnp.float32)
    dz1 = dh1 * jnp.where(z1 > 0, 1.0, jnp.exp(jnp.minimum(z1, 0.0)))

    first = (b == 0) & (i == 0) & (j == 0)

    @pl.when(first)
    def _():
        dwg_ref[...] = jnp.zeros_like(dwg_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    @pl.when((i == 0) & (j == 0))
    def _():
        desel_ref[...] = jnp.zeros_like(desel_ref)
        dbsel_ref[...] = jnp.zeros_like(dbsel_ref)

    @pl.when(j == 0)
    def _():
        dhs_ref[...] = jnp.zeros_like(dhs_ref)

    dwg_ref[...] += jnp.dot(geom.T, dz1, preferred_element_type=jnp.float32)
    db0_ref[...] += jnp.sum(dz1, axis=0)[None, :]
    dw2_ref[...] += jnp.dot(h1.T, dz2, preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(dz2, axis=0)[None, :]
    desel_ref[0] += jnp.dot(dlogits.T, h2, preferred_element_type=jnp.float32)
    dbsel_ref[0, 0] += jnp.sum(dlogits, axis=0)

    dz1_t = dz1.reshape(TI, TJ, H)
    dhs_ref[0] += jnp.sum(dz1_t, axis=1)
    dho_ref[0, 0] = jnp.sum(dz1_t, axis=0)  # partial: this (b, i, j) only
    dgeom_ref[0] = jnp.dot(dz1, wg_ref[:].T, preferred_element_type=jnp.float32).reshape(
        TI, TJ, geom_ref.shape[3]
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pair_tail(static, h_s, h_o, geom, w_g, b0, w2, b2, e_sel, b_sel):
    """Padded pair-tail with fused fwd/bwd kernels. `static` = (tile, interpret)."""
    return _pair_tail_fwd(static, h_s, h_o, geom, w_g, b0, w2, b2, e_sel, b_sel)[0]


def _run_fwd(static, h_s, h_o, geom, w_g, b0, w2, b2, e_sel, b_sel):
    tile, interpret = static
    B, O_pad, H = h_s.shape
    E = w2.shape[1]
    R = e_sel.shape[1]
    nI = O_pad // tile
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, O_pad, O_pad, R), jnp.float32),
        grid=(B, nI, nI),
        in_specs=[
            pl.BlockSpec((1, tile, H), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, H), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, tile, 4), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, H), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda b, i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, E), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda b, i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, E), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, tile, R), lambda b, i, j: (b, i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(h_s, h_o, geom, w_g, b0, w2, b2, e_sel, b_sel[:, None, :])


def _pair_tail_fwd(static, h_s, h_o, geom, w_g, b0, w2, b2, e_sel, b_sel):
    out = _run_fwd(static, h_s, h_o, geom, w_g, b0, w2, b2, e_sel, b_sel)
    return out, (h_s, h_o, geom, w_g, b0, w2, b2, e_sel, b_sel)


def _pair_tail_bwd(static, res, g):
    tile, interpret = static
    h_s, h_o, geom, w_g, b0, w2, b2, e_sel, b_sel = res
    B, O_pad, H = h_s.shape
    E = w2.shape[1]
    R = e_sel.shape[1]
    nI = O_pad // tile

    outs = pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, O_pad, H), jnp.float32),        # dh_s
            jax.ShapeDtypeStruct((B, nI, O_pad, H), jnp.float32),    # dh_o partials
            jax.ShapeDtypeStruct((B, O_pad, O_pad, 4), jnp.float32),  # dgeom
            jax.ShapeDtypeStruct((4, H), jnp.float32),               # dWg
            jax.ShapeDtypeStruct((1, H), jnp.float32),               # db0
            jax.ShapeDtypeStruct((H, E), jnp.float32),               # dW2
            jax.ShapeDtypeStruct((1, E), jnp.float32),               # db2
            jax.ShapeDtypeStruct((B, R, E), jnp.float32),            # de_sel
            jax.ShapeDtypeStruct((B, 1, R), jnp.float32),            # db_sel
        ),
        grid=(B, nI, nI),
        in_specs=[
            pl.BlockSpec((1, tile, H), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, H), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, tile, 4), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, H), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda b, i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, E), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((E,), lambda b, i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, E), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, tile, R), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile, H), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, H), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, tile, 4), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, H), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, E), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, E), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, R), lambda b, i, j: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(h_s, h_o, geom, w_g, b0, w2, b2, e_sel, b_sel[:, None, :], g)

    dh_s, dho_part, dgeom, dwg, db0, dw2, db2, desel, dbsel = outs
    dh_o = jnp.sum(dho_part, axis=1)
    return (dh_s, dh_o, dgeom, dwg, db0[0], dw2, db2[0], desel, dbsel[:, 0, :])


_pair_tail.defvjp(_pair_tail_fwd, _pair_tail_bwd)


def rel_cache_pallas(
    params,
    attr_in: jnp.ndarray,
    pos: jnp.ndarray,
    rel_tokens: jnp.ndarray,
    cfg: Config,
    rng=None,
    deterministic: bool = True,
    default_ll: float = DEFAULT_LOG_LIKELIHOOD,
    tile: int = 32,
) -> jnp.ndarray:
    """Drop-in replacement for models.oracle.rel_cache (eval path).

    Falls back to the XLA path when the relation MLP has a shape the kernel
    doesn't cover (hidden depth != 1) or dropout is active."""
    rp = params["relation_network"]
    if rp is None or len(rp["layers"]) != 2 or (not deterministic and cfg.dropout > 0):
        from dfol_vqa_tpu.models import oracle as om

        return om.rel_cache(params, attr_in, pos, rel_tokens, cfg, rng, deterministic,
                            default_ll)

    emb_w = params["embedding"]["w"]  # (E, V)
    emb_b = params["embedding"]["b"]
    B, O, d_att = attr_in.shape
    R = rel_tokens.shape[1]
    H = rp["layers"][0]["w"].shape[1]
    E = rp["layers"][1]["w"].shape[1]

    w_s, w_o, w_g, b0 = _first_layer_split(rp["layers"][0], d_att)
    compute_dtype = jnp.dtype(cfg.tpu.compute_dtype)
    x = attr_in.astype(compute_dtype)
    h_s = jnp.dot(x, w_s.astype(compute_dtype), preferred_element_type=jnp.float32)
    h_o = jnp.dot(x, w_o.astype(compute_dtype), preferred_element_type=jnp.float32)
    geom = pair_geometry(pos)

    tok0 = jnp.clip(rel_tokens - 1, 0)
    e_sel = jnp.take(emb_w.T, tok0, axis=0)  # (B, R, E)
    b_sel = jnp.take(emb_b, tok0, axis=0)  # (B, R)

    tile = min(tile, -(-O // 8) * 8)  # don't over-tile tiny scenes
    O_pad = -(-O // tile) * tile
    pad_o = O_pad - O
    if pad_o:
        h_s = jnp.pad(h_s, ((0, 0), (0, pad_o), (0, 0)))
        h_o = jnp.pad(h_o, ((0, 0), (0, pad_o), (0, 0)))
        geom = jnp.pad(geom, ((0, 0), (0, pad_o), (0, pad_o), (0, 0)))

    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    out = _pair_tail(
        (tile, interpret),
        h_s, h_o, geom,
        rp["layers"][0]["w"][2 * d_att :],  # w_g
        b0,
        rp["layers"][1]["w"], rp["layers"][1]["b"],
        e_sel, b_sel,
    )

    # world.rel_ll convention is R-major (B, R, O, O) — see types.py
    out = jnp.moveaxis(out[:, :O, :O, :], 3, 1)
    pad_slot = (rel_tokens == 0)[:, :, None, None]
    return jnp.where(pad_slot, default_ll, out)
