"""Fused pair-MLP kernel: the O^2 relation trunk without HBM intermediates.

``models/oracle.py rel_cache_shared`` computes the shared pair code

    h   = h_s[:, :, None, :] + h_o[:, None, :, :] + geom @ w_g + b0
    h2  = sigmoid(W_L(elu(...W_1(elu(h)))))          # (U, O, O, E)

(reference relation MLP, classifier_oracle.py:97-137 applied per pair).
On XLA every layer's (U, O_pad, O_pad, H) activation round-trips HBM:
at B=256/O=100 production dims that is ~0.9 GB of pure intermediate
traffic on a bandwidth-bound step (O100_DECOMPOSE r4). This kernel tiles
the i (subject) axis and keeps the whole layer chain in VMEM — the only
HBM writes are the final h2 tile, already in the stream dtype:

    grid (U, nI): per step load h_s row band (TI, H), the resident
    h_o (O_pad, H) and weights (unchanged blocks -> DMA skipped), and
    four tiny (TI, O_pad) geometry planes; compute the full MLP chain on
    the (TI * O_pad, H) band; store sigmoid(h) as (TI, O_pad, E) bf16.

Geometry enters as four separate (U, O_pad, O_pad) planes — NOT the
stacked (..., 4) tensor, whose 4-wide minor dim would pad to 128 lanes
(32x the bytes) in a TPU layout; the planes are computed by XLA where
they fuse into elementwise producers.

Backward pass: custom VJP recomputes the chain with the plain-XLA
formulation and differentiates that (rematerialisation — the kernel's
win is eval-path bandwidth; training at these dims is dominated by the
contraction backward anyway). Forward/backward use the same function up
to dot-operand dtype: on TPU the XLA recompute's default-precision f32
dots round operands to bf16 on the MXU — exactly what the kernel does
explicitly — so fwd and bwd agree on-chip up to accumulation schedule;
in interpret mode both sides run true-f32 dots and agree exactly.

On-chip numerics vs the XLA route (measured, r5): with the SAME
formulation on both sides (``pair_mlp_xla`` — rank-1 f32 geometry,
shared _elu, default-precision dots), Mosaic and XLA agree bit-for-bit
at small layer widths, but at production widths (K=256, N=300) their
f32 accumulation schedules differ and a ~4e-7 fraction of pair codes
rounds to the adjacent bf16 value. The honest hardware invariant is
therefore 1-ULP-bounded caches + bitwise-identical ANSWERS, pinned by
scripts/verify_pair_mlp_tpu.py (TPU_HW artifact, pair_mlp leg); CPU
parity (true-f32, 1e-6) is pinned by tests/test_pair_mlp_kernel.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# double-buffered VMEM budget for the band activations (~16 MB/core total)
_VMEM_BUDGET_BYTES = 8 * 1024 * 1024


def _elu(x):
    # explicit ELU: Mosaic has no expm1 lowering (jax.nn.elu uses it); the
    # exp(x) - 1 form differs from expm1 by <~1e-8 abs for x in (-1e-4, 0),
    # inside the parity tolerances. min() keeps the untaken branch finite.
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _mlp_chain(h, layer_ws, layer_bs, *, bf16_dots: bool):
    """ELU -> Linear chain on a (N, H) band; fp32 accumulation.

    On the real Mosaic path dot OPERANDS are cast to bf16 explicitly:
    JAX's DEFAULT matmul precision on TPU rounds f32 operands to one bf16
    MXU pass anyway (the basis of the rel_stream_dtype bit-identity
    claim, config.py), but Mosaic's f32 dot_general does not — measured
    38 TF/s vs the bf16 single-pass rate. So on-chip the cast changes
    bytes, not bits, relative to the XLA tail. In interpret mode (CPU
    tests) there is no MXU and the XLA reference really does true-f32
    dots, so the cast is SKIPPED there — interpret==XLA holds to 1e-6 and
    the on-chip bf16-operand identity is pinned separately on real
    hardware (scripts/tpu_hw_evidence.py, TPU_HW artifact). fp32
    accumulation is unchanged on both paths."""
    dot_dtype = jnp.bfloat16 if bf16_dots else h.dtype
    for w, b in zip(layer_ws, layer_bs):
        h = _elu(h)
        h = jax.lax.dot_general(
            h.astype(dot_dtype), w.astype(dot_dtype),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b
    return h


def _kernel(*refs, n_layers: int, bf16_dots: bool):
    (dist_ref, ang_ref, hs_side_ref, vs_side_ref,
     hsub_ref, hobj_ref, wg_ref, b0_ref) = refs[:8]
    layer_refs = refs[8:8 + 2 * n_layers]
    out_ref = refs[8 + 2 * n_layers]

    TI, OP = dist_ref.shape[1], dist_ref.shape[2]
    H = hsub_ref.shape[2]
    E = out_ref.shape[3]

    wg = wg_ref[...]  # (4, H)
    # geometry projection: four rank-1 broadcasts instead of a K=4 dot
    h = (
        dist_ref[0][:, :, None] * wg[0][None, None, :]
        + ang_ref[0][:, :, None] * wg[1][None, None, :]
        + hs_side_ref[0][:, :, None] * wg[2][None, None, :]
        + vs_side_ref[0][:, :, None] * wg[3][None, None, :]
    )
    h = h + hsub_ref[0][:, None, :] + hobj_ref[0][None, :, :] + b0_ref[0][None, None, :]
    h = h.reshape(TI * OP, H)
    ws = [layer_refs[2 * i][...] for i in range(n_layers)]
    bs = [layer_refs[2 * i + 1][0][None, :] for i in range(n_layers)]
    h = _mlp_chain(h, ws, bs, bf16_dots=bf16_dots)
    out_ref[0] = jax.nn.sigmoid(h).reshape(TI, OP, E).astype(out_ref.dtype)


def _pair_mlp_xla(dist, ang, hside, vside, h_s, h_o, w_g, b0, layers):
    """Reference XLA formulation (the VJP recompute target)."""
    h = (
        dist[..., None] * w_g[0]
        + ang[..., None] * w_g[1]
        + hside[..., None] * w_g[2]
        + vside[..., None] * w_g[3]
    )
    h = h + h_s[:, :, None, :] + h_o[:, None, :, :] + b0
    for lp in layers:
        h = _elu(h)  # same formulation as the kernel (fwd/bwd consistency)
        h = jnp.dot(h, lp["w"], preferred_element_type=jnp.float32) + lp["b"]
    return jax.nn.sigmoid(h)


def _run_fwd(static, dist, ang, hside, vside, h_s, h_o, w_g, b0, layers):
    tile, out_dtype, interpret = static
    U, OP, H = h_s.shape
    E = layers[-1]["w"].shape[1] if layers else H
    n_layers = len(layers)
    nI = OP // tile

    geom_spec = pl.BlockSpec((1, tile, OP), lambda u, i: (u, i, 0))
    in_specs = [geom_spec, geom_spec, geom_spec, geom_spec,
                pl.BlockSpec((1, tile, H), lambda u, i: (u, i, 0)),
                pl.BlockSpec((1, OP, H), lambda u, i: (u, 0, 0)),
                pl.BlockSpec((4, H), lambda u, i: (0, 0)),
                pl.BlockSpec((1, H), lambda u, i: (0, 0))]
    operands = [dist, ang, hside, vside, h_s, h_o, w_g, b0[None, :]]
    for lp in layers:
        hin, hout = lp["w"].shape
        in_specs.append(pl.BlockSpec((hin, hout), lambda u, i: (0, 0)))
        in_specs.append(pl.BlockSpec((1, hout), lambda u, i: (0, 0)))
        operands.extend([lp["w"], lp["b"][None, :]])

    return pl.pallas_call(
        # bf16 dot operands only on the real Mosaic path (see _mlp_chain)
        functools.partial(_kernel, n_layers=n_layers, bf16_dots=not interpret),
        grid=(U, nI),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, OP, E), lambda u, i: (u, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((U, OP, OP, E), jnp.dtype(out_dtype)),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _pair_mlp(static, dist, ang, hside, vside, h_s, h_o, w_g, b0, layers):
    return _run_fwd(static, dist, ang, hside, vside, h_s, h_o, w_g, b0, layers)


def _pm_fwd(static, dist, ang, hside, vside, h_s, h_o, w_g, b0, layers):
    out = _run_fwd(static, dist, ang, hside, vside, h_s, h_o, w_g, b0, layers)
    return out, (dist, ang, hside, vside, h_s, h_o, w_g, b0, layers)


def _pm_bwd(static, res, g):
    # rematerialise through the XLA formulation; cotangent dtypes follow
    # the primals (the kernel's bf16 output rounds g, matching what a
    # bf16-stored XLA h2 would backprop)
    _, vjp = jax.vjp(_pair_mlp_xla, *res)
    return vjp(g.astype(jnp.float32))


_pair_mlp.defvjp(_pm_fwd, _pm_bwd)


def pair_mlp_xla(
    pos: jnp.ndarray,
    h_s: jnp.ndarray,
    h_o: jnp.ndarray,
    w_g: jnp.ndarray,
    b0: jnp.ndarray,
    layers: Sequence[Dict[str, Any]],
    out_dtype: Any = jnp.bfloat16,
) -> jnp.ndarray:
    """The kernel's EXACT formulation, lowered by XLA instead of Mosaic.

    Same geometry math (four rank-1 f32 broadcasts — NOT the K=4 einsum,
    whose operands XLA's default TPU matmul precision would round to bf16),
    same exp(x)-1 ELU, same dot shapes. On TPU, XLA's default precision
    rounds the layer-dot operands to one bf16 MXU pass — exactly what the
    kernel's explicit casts do — so this is the kernel route's bitwise
    reference on hardware (pinned by scripts/verify_pair_mlp_tpu.py) while
    staying true-f32 under interpret/CPU semantics. Callers off the kernel
    route keep the plain einsum formulation (true-f32 on CPU)."""
    from dfol_vqa_tpu.models.featurizer import pair_geometry

    geom = pair_geometry(pos)
    dist, ang = geom[..., 0], geom[..., 1]
    hside, vside = geom[..., 2], geom[..., 3]
    out = _pair_mlp_xla(dist, ang, hside, vside, h_s, h_o, w_g, b0,
                        list(layers))
    return out.astype(jnp.dtype(out_dtype))


def pair_mlp_fused(
    pos: jnp.ndarray,
    h_s: jnp.ndarray,
    h_o: jnp.ndarray,
    w_g: jnp.ndarray,
    b0: jnp.ndarray,
    layers: Sequence[Dict[str, Any]],
    out_dtype: Any = jnp.bfloat16,
    tile: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """(U, O_pad, H) projections + (U, O_pad, 4) boxes -> (U, O_pad, O_pad, E).

    Drop-in for the padded pair-MLP trunk of ``rel_cache_shared`` (first
    layer pre-split into ``h_s = x @ w_s``, ``h_o = x @ w_o``; see
    ``oracle._first_layer_split``). ``pos`` rows beyond the true O are
    pad boxes — their h2 values are garbage either way and are masked by
    the executor. O_pad must be a multiple of 128 (callers pad before
    the projections, as the contract kernel already requires).
    """
    from dfol_vqa_tpu.models.featurizer import pair_geometry

    U, OP, H = h_s.shape
    if OP % 128 != 0:
        raise ValueError(f"pair_mlp_fused needs O padded to 128, got {OP}")
    geom = pair_geometry(pos)  # (U, OP, OP, 4); XLA fuses the planes below
    dist, ang = geom[..., 0], geom[..., 1]
    hside, vside = geom[..., 2], geom[..., 3]

    layers = list(layers)
    if tile <= 0:
        # largest power-of-two row band whose double-buffered activations
        # fit the VMEM budget. The live band at any point in the chain is
        # one consecutive (in, out) layer pair of fp32 activations, so
        # size against the WORST pair across the whole chain (not just the
        # last two widths — a wide early hidden layer must bound the tile
        # too), plus the output tile in the stream dtype.
        widths = [H] + [lp["w"].shape[1] for lp in layers]
        worst_pair = max(
            (widths[i] + widths[i + 1] for i in range(len(widths) - 1)),
            default=widths[0],
        )
        bytes_per_row = OP * (4 * worst_pair + 2 * widths[-1])
        tile = 8
        while tile < 64 and 2 * (2 * tile) * bytes_per_row <= _VMEM_BUDGET_BYTES:
            tile *= 2
        tile = min(tile, OP)
    return _pair_mlp((tile, jnp.dtype(out_dtype), interpret),
                     dist, ang, hside, vside, h_s, h_o, w_g, b0, layers)
