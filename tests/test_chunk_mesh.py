"""Round-3 composability: chunked dispatch × device mesh, chunked eval.

VERDICT r2 items 2 and 4: `tpu.train_chunk > 1` must compose with a device
mesh (previously forced to per-step dispatch under a mesh), and
`test_epoch`/`predict` must use the fused scan dispatch
(interpreter.step_packed_many) behind `tpu.eval_chunk`.
"""

import io
import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.parallel.mesh import make_mesh, shard_params
from dfol_vqa_tpu.train.optim import build_optimizer
from dfol_vqa_tpu.train.trainer import VQATrainer

from tests.test_pipeline_train import make_loader, tiny_cfg


def _chunk_inputs(ontology, cfg, n_batches=4, batch_size=8, terminal="verify_rel"):
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, batch_size * n_batches, terminal=terminal,
                            length=2, seed=40)
    loader = make_loader(ontology, cfg, qs, batch_size=batch_size, shuffle=False)
    batches = list(loader)
    assert len(batches) == n_batches
    b0 = batches[0]
    assert all(b.spec == b0.spec and b.meta == b0.meta for b in batches)
    objs = np.stack([b.objects for b in batches])
    masks = np.stack([b.obj_mask for b in batches])
    packs = np.stack([b.packed for b in batches])
    return interp, params, b0, objs, masks, packs


@pytest.mark.parametrize("shape,axes", [
    # quick tier keeps the 2-D (data x model) case — it subsumes the 1-D
    # data-mesh collectives and is the production dryrun shape
    pytest.param((8,), ("data",), marks=pytest.mark.slow),
    ((4, 2), ("data", "model")),
])
def test_chunked_sharded_matches_unsharded_sequence(ontology, shape, axes):
    """The fused k-step chunk under a mesh must produce the same losses and
    final params as the same chunk on a single device."""
    cfg = tiny_cfg(dropout=0.0)
    interp, params, b0, objs, masks, packs = _chunk_inputs(ontology, cfg)
    # the chunk step donates params/opt_state; keep a host copy per leg
    host_params = jax.tree_util.tree_map(np.asarray, params)

    # single-device fused chunk (reference trajectory)
    t1 = VQATrainer(cfg, interp)
    t1._tx = build_optimizer(cfg, host_params)
    p0 = jax.device_put(host_params)
    opt1 = t1._tx.init(p0)
    fn1 = t1._train_step_chunk(b0.spec, b0.meta, objs.shape[0])
    p1, _, losses1, _, _ = fn1(
        p0, opt1, jnp.asarray(objs), jnp.asarray(masks),
        jnp.asarray(packs), jax.random.PRNGKey(0),
    )
    losses1 = np.asarray(losses1)

    mesh = make_mesh(shape, axes)
    with mesh:
        t2 = VQATrainer(cfg, interp, mesh=mesh)
        t2._tx = build_optimizer(cfg, host_params)
        params_s = shard_params(mesh, host_params, fsdp=mesh.shape["data"] > 1)
        opt2 = t2._tx.init(params_s)
        fn2 = t2._train_step_chunk(b0.spec, b0.meta, objs.shape[0])
        p2, _, losses2, _, _ = fn2(
            params_s, opt2, objs, masks, packs, jax.random.PRNGKey(0)
        )
        losses2 = np.asarray(losses2)

    np.testing.assert_allclose(losses2, losses1, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_trainer_uses_chunk_under_mesh(ontology, tmp_path):
    """End-to-end: trainer.train with a mesh and train_chunk>1 must take the
    fused-chunk dispatch path (cached under the 'chunk' key), not silently
    drop to per-step dispatch (the r2 behavior)."""
    cfg = tiny_cfg(dropout=0.0)
    cfg.tpu.train_chunk = 4
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 32, terminal="exist", length=1, seed=41)
    loader = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
    mesh = make_mesh((8,), ("data",))
    with mesh:
        trainer = VQATrainer(cfg, interp, mesh=mesh)
        params_s = shard_params(mesh, params)
        trainer.train(loader, None, params_s)
    chunk_keys = [k for k in trainer._train_cache
                  if k[-1] in ("chunk", "chunk_padded")]
    assert chunk_keys, "mesh training never used the fused chunk path"


def test_eval_chunk_matches_per_batch(ontology):
    """test_epoch with eval_chunk=8 must equal eval_chunk=1 exactly, and
    must actually go through step_packed_many (the 'many' cache key)."""
    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(1))
    qs = generate_questions(ontology, 40, terminal="exist", length=2, seed=42)

    cfg.tpu.eval_chunk = 1
    t1 = VQATrainer(cfg, interp)
    err1 = t1.test_epoch(
        make_loader(ontology, cfg, qs, batch_size=8, shuffle=False), params
    )

    cfg.tpu.eval_chunk = 8
    t2 = VQATrainer(cfg, interp)
    err2 = t2.test_epoch(
        make_loader(ontology, cfg, qs, batch_size=8, shuffle=False), params
    )
    np.testing.assert_allclose(err2, err1, rtol=0, atol=0)
    assert any(k[-1] == "many" for k in interp._step_cache), (
        "eval_chunk=8 never dispatched through step_packed_many"
    )


def test_predict_chunked_matches_per_batch(ontology):
    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(1))
    qs = generate_questions(ontology, 24, terminal="query_attr", length=1, seed=43)

    outs = []
    for chunk in (1, 4):
        cfg.tpu.eval_chunk = chunk
        t = VQATrainer(cfg, interp)
        buf = io.StringIO()
        t.predict(
            make_loader(ontology, cfg, qs, batch_size=8, shuffle=False),
            params, buf,
        )
        outs.append(json.loads(buf.getvalue()))
    assert outs[0] == outs[1]
    assert len(outs[0]) == 24
