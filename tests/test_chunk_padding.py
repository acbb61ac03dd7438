"""Chunk-tail padding (tpu.pad_chunks) and same-spec grouping (tpu.group_specs).

Every distinct chunk-tail length k used to be a fresh XLA compile
signature; with padding, partial chunks duplicate the tail batch up to the
full chunk length and run through ONE n_valid-gated executable per bucket
spec (trainer._train_step_chunk_padded), with padded steps as update-gated
no-ops. These tests pin:
  * padded == the exact sequential single-step trajectory (params, losses,
    rng stream);
  * the production train loop compiles exactly one chunked signature per
    spec and no tail-length variants;
  * _group_by_spec preserves the epoch's batch multiset while producing
    chunk-length same-spec runs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.data.loader import _group_by_spec
from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.train.optim import build_optimizer
from dfol_vqa_tpu.train.trainer import VQATrainer

from tests.test_pipeline_train import make_loader, tiny_cfg


def _inputs(ontology, cfg, n_batches, batch_size=8, terminal="verify_rel"):
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, batch_size * n_batches, terminal=terminal,
                            length=2, seed=50)
    loader = make_loader(ontology, cfg, qs, batch_size=batch_size, shuffle=False)
    batches = list(loader)
    assert len(batches) == n_batches
    b0 = batches[0]
    assert all(b.spec == b0.spec and b.meta == b0.meta for b in batches)
    objs = np.stack([b.objects for b in batches])
    masks = np.stack([b.obj_mask for b in batches])
    packs = np.stack([b.packed for b in batches])
    return interp, params, b0, objs, masks, packs


def test_padded_chunk_matches_sequential(ontology):
    """A 3-batch group padded to k=8 with n_valid=3 must reproduce the
    3-step sequential trajectory exactly — params, losses, and the rng
    carry (padded steps must not consume randomness)."""
    g, k = 3, 8
    cfg = tiny_cfg(dropout=0.0)
    interp, params, b0, objs, masks, packs = _inputs(ontology, cfg, g)
    host_params = jax.tree_util.tree_map(np.asarray, params)

    # sequential reference
    t1 = VQATrainer(cfg, interp)
    t1._tx = build_optimizer(cfg, host_params)
    p = jax.device_put(host_params)
    opt = t1._tx.init(p)
    rng = jax.random.PRNGKey(7)
    seq_losses = []
    for i in range(g):
        fn = t1._train_step(b0.spec, b0.meta)
        p, opt, loss, _, rng = fn(p, opt, objs[i], masks[i], packs[i], rng)
        seq_losses.append(float(loss))
    rng_seq = np.asarray(rng)

    # padded chunk
    t2 = VQATrainer(cfg, interp)
    t2._tx = build_optimizer(cfg, host_params)
    p2 = jax.device_put(host_params)
    opt2 = t2._tx.init(p2)
    fn2 = t2._train_step_chunk_padded(b0.spec, b0.meta, k)
    p2, opt2, losses2, _, rng2 = fn2(
        p2, opt2,
        t2._pad_chunk(jnp.asarray(objs), k),
        t2._pad_chunk(jnp.asarray(masks), k),
        t2._pad_chunk(jnp.asarray(packs), k),
        jax.random.PRNGKey(7), np.int32(g),
    )
    losses2 = np.asarray(losses2)

    np.testing.assert_allclose(losses2[:g], seq_losses, rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(rng2), rng_seq)
    for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_padded_full_chunk_matches_unpadded(ontology):
    """With n_valid == k the gated executable must equal the plain chunk."""
    k = 4
    cfg = tiny_cfg(dropout=0.0)
    interp, params, b0, objs, masks, packs = _inputs(ontology, cfg, k)
    host_params = jax.tree_util.tree_map(np.asarray, params)

    outs = []
    for padded in (False, True):
        t = VQATrainer(cfg, interp)
        t._tx = build_optimizer(cfg, host_params)
        p = jax.device_put(host_params)
        opt = t._tx.init(p)
        if padded:
            fn = t._train_step_chunk_padded(b0.spec, b0.meta, k)
            p, opt, losses, _, _ = fn(p, opt, jnp.asarray(objs),
                                      jnp.asarray(masks), jnp.asarray(packs),
                                      jax.random.PRNGKey(3), np.int32(k))
        else:
            fn = t._train_step_chunk(b0.spec, b0.meta, k)
            p, opt, losses, _, _ = fn(p, opt, jnp.asarray(objs),
                                      jnp.asarray(masks), jnp.asarray(packs),
                                      jax.random.PRNGKey(3))
        outs.append((np.asarray(losses),
                     [np.asarray(x) for x in jax.tree_util.tree_leaves(p)]))
    np.testing.assert_allclose(outs[1][0], outs[0][0], rtol=1e-6, atol=1e-7)
    for a, b in zip(outs[0][1], outs[1][1]):
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_padded_chunk_under_mesh_matches_single_device(ontology):
    """The n_valid-gated padded chunk step must produce the same losses and
    params under a virtual 8-device data mesh (shard_train_chunk padded=True)
    as on a single device — the composition the production trainer takes when
    pad_chunks (default) meets mesh_shape != (1,)."""
    from dfol_vqa_tpu.parallel.mesh import make_mesh, shard_params

    g, k = 3, 4
    cfg = tiny_cfg(dropout=0.0)
    interp, params, b0, objs, masks, packs = _inputs(ontology, cfg, g)
    host_params = jax.tree_util.tree_map(np.asarray, params)

    def run(mesh):
        t = VQATrainer(cfg, interp, mesh=mesh)
        t._tx = build_optimizer(cfg, host_params)
        if mesh is not None:
            p = shard_params(mesh, host_params)
        else:
            p = jax.device_put(host_params)
        opt = t._tx.init(p)
        fn = t._train_step_chunk_padded(b0.spec, b0.meta, k)
        p, opt, losses, _, _ = fn(
            p, opt,
            t._pad_chunk(jnp.asarray(objs), k),
            t._pad_chunk(jnp.asarray(masks), k),
            t._pad_chunk(jnp.asarray(packs), k),
            jax.random.PRNGKey(7), np.int32(g),
        )
        return (np.asarray(losses),
                [np.asarray(x) for x in jax.tree_util.tree_leaves(p)])

    losses1, leaves1 = run(None)
    mesh = make_mesh((8,), ("data",))
    with mesh:
        losses2, leaves2 = run(mesh)
    np.testing.assert_allclose(losses2[:g], losses1[:g], rtol=1e-5, atol=1e-6)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-5)


def test_train_loop_single_chunk_signature(ontology):
    """train() with pad_chunks (default) over an epoch whose groups have a
    ragged tail must compile exactly ONE chunked signature (the padded
    full-chunk one) and zero tail-length variants."""
    cfg = tiny_cfg(dropout=0.0)
    cfg.tpu.train_chunk = 4
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    # 6 same-spec batches -> groups of 4 and 2 (tail pads to 4)
    qs = generate_questions(ontology, 48, terminal="exist", length=1, seed=51)
    loader = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
    trainer = VQATrainer(cfg, interp)
    trainer.train(loader, None, params)
    padded_keys = [k for k in trainer._train_cache if k[-1] == "chunk_padded"]
    plain_keys = [k for k in trainer._train_cache if k[-1] == "chunk"]
    assert len(padded_keys) == 1 and padded_keys[0][2] == 4
    assert not plain_keys, "tail-length chunk variants were compiled"


def test_group_by_spec_multiset_and_runs():
    batches = [(di, (di, j)) for di in range(3) for j in range([7, 4, 9][di])]
    rng = np.random.default_rng(0)
    out = _group_by_spec(list(batches), 4, rng)
    assert sorted(out) == sorted(batches)  # multiset preserved
    # runs of the same di must have length 4 except each di's final run
    runs = []
    for di, _ in out:
        if runs and runs[-1][0] == di:
            runs[-1][1] += 1
        else:
            runs.append([di, 1])
    last_seen = {}
    for i, (di, n) in enumerate(runs):
        last_seen[di] = i
    for i, (di, n) in enumerate(runs):
        assert n == 4 or i == last_seen[di], runs


def test_grouped_loader_same_multiset(ontology):
    """group_chunk reorders but never changes the epoch's batch contents."""
    cfg = tiny_cfg(dropout=0.0)
    qs = []
    for t, n in (("exist", 24), ("verify_rel", 16)):
        qs.append(generate_questions(ontology, n, terminal=t, length=1,
                                     seed=52))
    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
    from dfol_vqa_tpu.data.dataset import ProgramDataset
    from dfol_vqa_tpu.data.loader import BatchLoader
    from dfol_vqa_tpu.data.features import SyntheticFeatures

    def build(group_chunk):
        ds = [ProgramDataset(q, ontology) for q in qs]
        compiler = ProgramCompiler(ontology, object_num=cfg.tpu.max_object_num,
                                   rel_slots=cfg.tpu.rel_table_size)
        feats = SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=2,
                                  max_objects=cfg.tpu.max_object_num)
        return BatchLoader(ds, compiler, feats, 8, cfg.tpu.max_object_num,
                           shuffle=True, prefetch=0, group_chunk=group_chunk)

    def signature(loader):
        return sorted(
            (b.spec.terminal_op, float(np.asarray(b.packed).sum()))
            for b in loader
        )

    plain = signature(build(0))
    grouped_loader = build(4)
    grouped_batches = list(grouped_loader)
    grouped = sorted(
        (b.spec.terminal_op, float(np.asarray(b.packed).sum()))
        for b in grouped_batches
    )
    assert grouped == plain
    # grouping engaged: the exist file has 3 batches -> at least one run >= 3
    terms = [b.spec.terminal_op for b in grouped_batches]
    best = cur = 1
    for a, b in zip(terms, terms[1:]):
        cur = cur + 1 if a == b else 1
        best = max(best, cur)
    assert best >= 3, terms
