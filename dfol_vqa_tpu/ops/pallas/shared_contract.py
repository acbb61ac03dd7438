"""Fused gather+contract kernel for the shared-image relation path.

``models/oracle.py rel_cache_shared`` computes the O^2 pair code ``h2`` once
per UNIQUE image (U rows) — the right FLOP shape for GQA's ~10
questions/image — but its per-question step

    h2_q   = h2[img_index]                        # (B, O, O, E) gather
    logits = einsum('bije,bre->brij', h2_q, e_sel)

materialises a (B, O, O, E) tensor in HBM. At production worst case
(B=32, O=100, E=300) that is ~380 MB of traffic per batch and is exactly
the regime where round-1 throughput collapsed (BENCH_r01
exist_3hop_O100_qps). This kernel fuses the gather with the contraction:
the grid is (i-tile, question) with the question axis innermost, a
scalar-prefetched ``img_index`` drives the h2 BlockSpec (consecutive
questions of the same image reuse the resident VMEM tile — Pallas skips
the DMA when the mapped block is unchanged), and each step contracts a
full (TI, O_pad) row band against the question's R-slot table. Only the
R-major (B, R, O, O) result ever touches HBM — R-major keeps the (O, O)
minor dims on full (8, 128) tiles; an R-last layout would pad R~8 lanes to
128 (16x the bytes):

    out[b,r,i,j] = logsigmoid( h2[img[b],i,j,:] . e_sel[b,r] + b_sel[b,r] )
    (pad slots r with rel_tokens==0 get default_ll, folded into the kernel)

The custom VJP computes gradients in XLA without ever materialising
(B, O, O, E): both dh2 and de_sel are accumulated with a lax.map over the
U unique images (mask-by-image, contract b and r jointly), trading ~U x
FLOP overcount (U is small on this path by construction) for O(B R O^2)
peak memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# keep the double-buffered h2 row band comfortably inside VMEM (~16 MB/core)
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _contract_kernel(idx_ref, h2_ref, esel_ref, bsel_ref, padm_ref, out_ref,
                     *, default_ll):
    del idx_ref  # consumed by the BlockSpec index maps
    TI, OP, E = h2_ref.shape[1], h2_ref.shape[2], h2_ref.shape[3]
    R = esel_ref.shape[1]
    h2 = h2_ref[0].reshape(TI * OP, E)
    # (R, E) x (TI*OP, E)^T on the contracting dim — no operand transpose
    logits = jax.lax.dot_general(
        esel_ref[0], h2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bsel_ref[0, 0][:, None]
    ll = jax.nn.log_sigmoid(logits)
    ll = jnp.where(padm_ref[0, 0][:, None] > 0, default_ll, ll)
    out_ref[0] = ll.reshape(R, TI, OP).astype(out_ref.dtype)


def _run_fwd(static, h2_u, img_index, e_sel, b_sel, pad_mask):
    tile, default_ll, interpret, out_dtype = static
    U, O_pad, _, E = h2_u.shape
    B, R, _ = e_sel.shape
    nI = O_pad // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nI, B),  # question innermost: same-image neighbours reuse
        # the resident h2 row band (DMA skipped on unchanged block)
        in_specs=[
            pl.BlockSpec((1, tile, O_pad, E), lambda i, b, idx: (idx[b], i, 0, 0)),
            pl.BlockSpec((1, R, E), lambda i, b, idx: (b, 0, 0)),
            pl.BlockSpec((1, 1, R), lambda i, b, idx: (b, 0, 0)),
            pl.BlockSpec((1, 1, R), lambda i, b, idx: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, R, tile, O_pad), lambda i, b, idx: (b, 0, i, 0)
        ),
    )
    return pl.pallas_call(
        functools.partial(_contract_kernel, default_ll=default_ll),
        out_shape=jax.ShapeDtypeStruct((B, R, O_pad, O_pad), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(img_index, h2_u, e_sel, b_sel[:, None, :], pad_mask[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _gather_contract(static, h2_u, img_index, e_sel, b_sel, pad_mask):
    return _run_fwd(static, h2_u, img_index, e_sel, b_sel, pad_mask)


def _gc_fwd(static, h2_u, img_index, e_sel, b_sel, pad_mask):
    out = _run_fwd(static, h2_u, img_index, e_sel, b_sel, pad_mask)
    # save `out` instead of recomputing logits: sigmoid(-logits) = 1 - e^out
    return out, (h2_u, img_index, e_sel, out, pad_mask)


def _gc_bwd(static, res, g):
    h2_u, img_index, e_sel, out, pad_mask = res
    U = h2_u.shape[0]
    live = (pad_mask == 0).astype(jnp.float32)[:, :, None, None]
    # out may be stored narrow (cache dtype); the algebra stays fp32
    dlogits = (
        g.astype(jnp.float32) * (1.0 - jnp.exp(out.astype(jnp.float32))) * live
    )  # (B, R, O, O)

    onehot = (img_index[None, :] == jnp.arange(U)[:, None]).astype(jnp.float32)

    def per_image(u):
        m = onehot[u][:, None, None, None]  # (B,1,1,1)
        dl_u = dlogits * m
        # contract b and r jointly: (ij, b*r) @ (b*r, e) — no (B,O,O,E)
        dh2_u = jnp.einsum("brij,bre->ije", dl_u, e_sel,
                           preferred_element_type=jnp.float32)
        desel_u = jnp.einsum("brij,ije->bre", dl_u, h2_u[u],
                             preferred_element_type=jnp.float32)
        return dh2_u, desel_u

    dh2, desel_parts = jax.lax.map(per_image, jnp.arange(U))
    d_esel = jnp.sum(desel_parts, axis=0)
    d_bsel = jnp.sum(dlogits, axis=(2, 3))
    # cotangent dtypes must match the (possibly bf16-streamed) primals
    return dh2.astype(h2_u.dtype), None, d_esel.astype(e_sel.dtype), d_bsel, None


_gather_contract.defvjp(_gc_fwd, _gc_bwd)


def shared_contract_pallas(
    h2_u: jnp.ndarray,
    img_index: jnp.ndarray,
    e_sel: jnp.ndarray,
    b_sel: jnp.ndarray,
    rel_tokens: jnp.ndarray,
    default_ll: float,
    tile: int = 0,
    interpret: bool = False,
    valid_o: int = 0,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """(U, O, O, E) pair code + (B,) image map -> (B, R, O, O) likelihoods.

    Drop-in for the gather+einsum+log_sigmoid+pad tail of rel_cache_shared.
    O is padded to a tile multiple internally; callers pass O-sized arrays —
    or, with ``valid_o=n``, PRE-padded arrays whose first n object rows are
    real (the pad then happens upstream, fused into the pair MLP; the
    result is sliced back to (B, R, n, n)).
    ``tile=0`` picks the largest row band that fits the VMEM budget.
    """
    U, O, _, E = h2_u.shape
    out_o = valid_o if valid_o > 0 else O
    if tile <= 0:
        # Compiled (Mosaic) mode: the kernel's (R, TI*O_pad) -> (R, TI,
        # O_pad) minor-dim reshape requires a 128-aligned lane split, so O
        # pads to a 128 multiple; the tile is the largest power-of-two
        # divisor whose double-buffered (tile, O_pad, E) band fits VMEM.
        O_pad = -(-O // 128) * 128
        tile = 8
        itemsize = jnp.dtype(h2_u.dtype).itemsize
        for cand in (16, 32, 64, 128):
            if cand > O_pad or 2 * cand * O_pad * E * itemsize > _VMEM_BUDGET_BYTES:
                break
            tile = cand
    else:
        # explicit tile (tests / interpret mode): no lane-alignment needs
        O_pad = -(-O // tile) * tile
    tile = min(tile, O_pad)
    if O_pad != O:
        h2_u = jnp.pad(h2_u, ((0, 0), (0, O_pad - O), (0, O_pad - O), (0, 0)))
    pad_mask = (rel_tokens == 0).astype(jnp.float32)
    out = _gather_contract(
        (tile, default_ll, interpret, jnp.dtype(out_dtype)),
        h2_u, img_index.astype(jnp.int32), e_sel, b_sel, pad_mask,
    )
    return out[:, :, :out_o, :out_o]
