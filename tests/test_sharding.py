"""Multi-device tests on the 8-device virtual CPU mesh.

True multi-device pjit semantics without TPU hardware (SURVEY.md §4):
sharded execution must match single-device execution bitwise-or-close, and
the full sharded training step must run on both 1-D (data) and 2-D
(data, model) meshes.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_params,
    shard_train_step,
)
from dfol_vqa_tpu.train.optim import build_optimizer

from tests.test_pipeline_train import make_loader, tiny_cfg


def test_eight_devices_available():
    assert jax.device_count() >= 8


def _setup(ontology, batch_size=8):
    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, batch_size, terminal="verify_rel", length=2, seed=30)
    loader = make_loader(ontology, cfg, qs, batch_size=batch_size, shuffle=False)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    return cfg, interp, params, batch, arrays


def test_data_sharded_forward_matches_single_device(ontology):
    cfg, interp, params, batch, arrays = _setup(ontology)
    obj, mask = jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask)

    ref = interp.forward(params, obj, mask, arrays, batch.spec, False, None)

    mesh = make_mesh((8,), ("data",))
    with mesh:
        params_s = shard_params(mesh, params)
        obj_s, mask_s, arrays_s = shard_batch(mesh, obj, mask, arrays)

        fn = jax.jit(
            lambda p, o, m, a: interp.forward(p, o, m, a, batch.spec, False, None)[
                "log_probability"
            ]
        )
        out = fn(params_s, obj_s, mask_s, arrays_s)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref["log_probability"]), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize("shape,axes", [((8,), ("data",)), ((4, 2), ("data", "model"))])
@pytest.mark.slow
def test_sharded_train_step_runs_and_matches(ontology, shape, axes):
    cfg, interp, params, batch, arrays = _setup(ontology)
    tx = build_optimizer(cfg, params)

    def step(params, opt_state, objects, obj_mask, arrays, rng):
        def loss_fn(p):
            out = interp.forward(p, objects, obj_mask, arrays, batch.spec, True, rng)
            return out["loss"] / jnp.maximum(jnp.sum(arrays["question_mask"]), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, updates), opt_state, loss

    obj, mask = jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask)

    # single device result
    opt_state = tx.init(params)
    p1, _, loss1 = jax.jit(step)(params, opt_state, obj, mask, arrays, jax.random.PRNGKey(0))

    mesh = make_mesh(shape, axes)
    with mesh:
        params_s = shard_params(mesh, params)
        opt_state_s = tx.init(params_s)
        fn = shard_train_step(step, mesh)
        p2, _, loss2 = fn(params_s, opt_state_s, obj, mask, arrays, jax.random.PRNGKey(0))

    assert np.isfinite(float(loss2))
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_host_sharded_loader_partitions_data(ontology):
    from dfol_vqa_tpu.data.dataset import ProgramDataset, iter_batches

    qs = generate_questions(ontology, 40, terminal="exist", seed=31)
    ds = ProgramDataset(qs, ontology)
    seen = set()
    for shard in range(4):
        for batch, n_pad in iter_batches([ds], 4, shuffle=False, num_shards=4, shard_index=shard):
            for q in batch[: 4 - n_pad]:
                seen.add(q["question_id"])
    assert len(seen) == 40  # full cover, no overlap


@pytest.mark.slow
def test_two_d_mesh_inserts_collectives(ontology):
    """The (data, model) sharded step must actually communicate: its
    optimized HLO contains cross-device collectives (gradient psum over the
    data axis / vocab-shard exchanges on the model axis)."""
    import optax

    cfg, interp, params, batch, arrays = _setup(ontology)
    tx = build_optimizer(cfg, params)
    mesh = make_mesh((4, 2), ("data", "model"))

    def step(params, opt_state, objects, obj_mask, arrays, rng):
        def loss_fn(p):
            out = interp.forward(p, objects, obj_mask, arrays, batch.spec, True, rng)
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    with mesh:
        params_s = shard_params(mesh, params)
        opt_state_s = tx.init(params_s)
        obj, mask, arrays_s = shard_batch(
            mesh, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask), arrays
        )
        lowered = jax.jit(step).lower(
            params_s, opt_state_s, obj, mask, arrays_s, jax.random.PRNGKey(0)
        )
        hlo = lowered.compile().as_text()
    assert ("all-reduce" in hlo) or ("all-gather" in hlo) or ("reduce-scatter" in hlo), (
        "no collectives in the sharded step HLO"
    )


def test_compiler_rejects_mixed_terminal_batch(ontology):
    from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
    from dfol_vqa_tpu.data.synthetic import generate_questions

    comp = ProgramCompiler(ontology, object_num=6)
    qs = generate_questions(ontology, 2, terminal="exist", seed=0) + generate_questions(
        ontology, 2, terminal="query_attr", seed=1
    )
    with pytest.raises(AssertionError):
        comp.compile(qs)


@pytest.mark.slow
def test_fsdp_sharded_train_step_matches_replicated(ontology):
    """fsdp=True (params sharded over data, ZeRO-3 analog) must produce the
    same loss and updated params as fully replicated execution."""
    import optax

    from dfol_vqa_tpu.parallel.mesh import param_sharding

    cfg, interp, params, batch, arrays = _setup(ontology)
    obj, mask = jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask)
    tx = build_optimizer(cfg, params)

    def step(p, opt_state, o, m, a):
        def loss_fn(pp):
            out = interp.forward(pp, o, m, a, batch.spec, True, None)
            return out["loss"]

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    ref_p, _, ref_loss = jax.jit(step)(params, tx.init(params), obj, mask, arrays)

    mesh = make_mesh((4, 2), ("data", "model"))
    with mesh:
        sh = param_sharding(params, mesh, fsdp=True)
        # at least one leaf actually sharded over data
        assert any(
            "data" in str(s.spec) for s in jax.tree_util.tree_leaves(sh)
        )
        params_s = jax.tree_util.tree_map(jax.device_put, params, sh)
        obj_s, mask_s, arrays_s = shard_batch(mesh, obj, mask, arrays)
        out_p, _, loss = jax.jit(step, donate_argnums=(0, 1))(
            params_s, tx.init(params_s), obj_s, mask_s, arrays_s
        )
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(ref_p), jax.tree_util.tree_leaves(out_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)
