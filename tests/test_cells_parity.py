"""Parity of the dense logic cells against the reference BatchBayesianLogicCell.

These tests construct the reference's ragged sparse-map layout and our dense
padded layout from the same random inputs and require near-bitwise agreement
(fp32). Skipped when the reference checkout is unavailable.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dfol_vqa_tpu import logic
from dfol_vqa_tpu.ops import cells
from dfol_vqa_tpu.types import VariableSet

from tests.conftest import requires_reference
from tests import reference_harness as rh

COUNTS = [2, 4, 3, 1]
O_PAD = 5


def make_dense(rng, counts, O):
    B = len(counts)
    att = np.log(rng.uniform(0.05, 0.95, size=(B, O)).astype(np.float32))
    mask = np.zeros((B, O), np.float32)
    for b, n in enumerate(counts):
        mask[b, :n] = 1.0
    return att, mask


@requires_reference
def test_filter_update_matches_reference(rng):
    import torch

    types, ops = rh.import_reference()
    counts, O = COUNTS, O_PAD
    B, total = len(counts), sum(counts)

    att, mask = make_dense(rng, counts, O)
    ll = np.log(rng.uniform(0.05, 0.95, size=(B, O)).astype(np.float32))

    # reference: arity-1 BLC
    blc = ops.BatchBayesianLogicCell(arity=1)
    bom = rh.block_diag_sparse_map(torch, counts, total)
    # log_prior is (Q x arity x O_total): every question sees the full ragged axis
    prior_full = np.zeros((B, 1, total), np.float32)
    ll_full = np.zeros((B, total, 1), np.float32)
    off = 0
    for b, n in enumerate(counts):
        prior_full[b, 0, off : off + n] = att[b, :n]
        ll_full[b, off : off + n, 0] = ll[b, :n]
        off += n
    quant = torch.ones(B, 1)
    out_ref = blc(
        torch.tensor(prior_full), torch.tensor(ll_full), quant, [0], bom
    ).detach().numpy()  # (B, 1, O_total)

    out_dense = np.asarray(cells.filter_update(jnp.asarray(att), jnp.asarray(ll)))
    off = 0
    for b, n in enumerate(counts):
        np.testing.assert_allclose(
            out_dense[b, :n], out_ref[b, 0, off : off + n], rtol=1e-5, atol=1e-5
        )
        off += n


@requires_reference
@pytest.mark.parametrize("q_subj,q_obj", [(1.0, 1.0), (0.0, 0.0), (1.0, 0.0)])
def test_relate_update_matches_reference(rng, q_subj, q_obj):
    import torch

    types, ops = rh.import_reference()
    counts, O = COUNTS, O_PAD
    B, total = len(counts), sum(counts)

    subj, mask = make_dense(rng, counts, O)
    obj, _ = make_dense(rng, counts, O)
    ll = np.log(rng.uniform(0.05, 0.95, size=(B, O, O)).astype(np.float32))

    # reference layout
    prior_full = np.full((B, 2, total), 0.0, np.float32)
    off = 0
    for b, n in enumerate(counts):
        prior_full[b, 0, off : off + n] = subj[b, :n]
        prior_full[b, 1, off : off + n] = obj[b, :n]
        off += n
    ll_full = rh.ragged_pair_tensor(ll, counts, O, fill=-30.0)[None]
    ll_full = np.repeat(ll_full, B, axis=0)[..., None]  # (B, O_t, O_t, 1)

    blc = ops.BatchBayesianLogicCell(arity=2)
    bom = rh.block_diag_sparse_map(torch, counts, total)
    quant = torch.tensor(np.tile([[q_subj, q_obj]], (B, 1)).astype(np.float32))
    out_ref = blc(
        torch.tensor(prior_full), torch.tensor(ll_full), quant, [0, 1], bom
    ).detach().numpy()  # (B, 2, O_total)

    subj_new, obj_new = cells.relate_update(
        jnp.asarray(subj),
        jnp.asarray(obj),
        jnp.asarray(ll),
        jnp.full((B,), q_subj),
        jnp.full((B,), q_obj),
        jnp.asarray(mask),
    )
    subj_new, obj_new = np.asarray(subj_new), np.asarray(obj_new)
    off = 0
    for b, n in enumerate(counts):
        np.testing.assert_allclose(
            subj_new[b, :n], out_ref[b, 0, off : off + n], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            obj_new[b, :n], out_ref[b, 1, off : off + n], rtol=1e-4, atol=1e-5
        )
        off += n


@requires_reference
@pytest.mark.parametrize("hard", [False, True])
@pytest.mark.parametrize("quant", [1.0, 0.0])
def test_log_probability_matches_reference(rng, hard, quant):
    import torch

    types, ops = rh.import_reference()
    counts, O = COUNTS, O_PAD
    B, total = len(counts), sum(counts)
    att, mask = make_dense(rng, counts, O)

    bom = rh.block_diag_sparse_map(torch, counts, total)
    att_full = np.zeros((B, total), np.float32)
    off = 0
    for b, n in enumerate(counts):
        att_full[b, off : off + n] = att[b, :n]
        off += n
    vs_ref = types.BatchVariableSet(
        ["x"] * B,
        torch.device("cpu"),
        total,
        B,
        quantifiers=quant,
        log_attention=torch.tensor(att_full),
        batch_object_map=bom,
    )
    lp_ref = vs_ref.log_probability(hard_mode=hard).detach().numpy()

    vs = VariableSet(jnp.asarray(att), jnp.full((B,), quant), jnp.asarray(mask))
    lp = np.asarray(vs.log_probability(hard_mode=hard))
    np.testing.assert_allclose(lp, lp_ref, rtol=1e-5, atol=1e-5)
