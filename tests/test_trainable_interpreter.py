"""Trainable-interpreter path (oracle_output_dim > 1).

The reference defines this mode — the oracle emits an F-vector per
(object, concept) cell and each BatchBayesianLogicCell owns a
LoglikelihoodMLP reducing it to the scalar the Bayesian update consumes
(batch_base_ops.py:57-58,190-192; CONFIG_YAML.md:63,77) — but its build path
is dead upstream: gqa_interpreter_experiments.py:209 reads
``neural_dict['embedding_network']``, which the ``oracle_output_dim != 1``
branch (:184-198) never creates, so it crashes before the first forward.
These tests cover our working, cache-fused resurrection
(models/oracle.py trainable-interpreter note): per-arity operator modules
applied once over the full feature caches.

No reference parity is possible (the mode cannot execute upstream); the
tests therefore pin behavior, gradient flow, and end-to-end learnability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dfol_vqa_tpu.compiler.program_compiler import OP_RELATE, ProgramCompiler
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.data.dataset import ProgramDataset
from dfol_vqa_tpu.data.loader import BatchLoader
from dfol_vqa_tpu.data.planted import PlantedWorld
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.train.optim import build_optimizer
from dfol_vqa_tpu.train.trainer import VQATrainer


def _tiny_cfg(F=4, operator_layers=None):
    cfg = Config(
        box_features_dim=32,
        oracle_input_dim=24,
        word_embedding_dim=16,
        attribute_network_layers_config=[16],
        relation_network_layers_config=[16],
        featurizer_layers_config=[],
        operator_layers_config=[8] if operator_layers is None else operator_layers,
        oracle_output_dim=F,
        learning_rate=3e-3,
        dropout=0.0,
        weight_decay=0.0,
        verbose=False,
    )
    cfg.tpu.max_object_num = 8
    return cfg


def _world(ontology, cfg, seed=0, noise=0.05):
    return PlantedWorld(ontology, box_dim=32, n_nouns=4, n_attrs=3, n_images=64,
                        min_objects=3, max_objects=8, noise=noise, seed=seed)


def _loader(qs, ontology, world, batch=32, shuffle=False):
    compiler = ProgramCompiler(ontology, object_num=8, rel_slots=2)
    return BatchLoader([ProgramDataset(qs, ontology)], compiler, world, batch, 8,
                       shuffle=shuffle, prefetch=0)


def test_init_params_have_operator_modules(ontology):
    cfg = _tiny_cfg(F=4)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    assert "op_modules" in params and "embedding_extra" in params
    # F-channel head: (E, V_pad, F-1); modules map F -> hidden -> 1
    E, Vp, Fm1 = params["embedding_extra"]["w"].shape
    assert Fm1 == 3 and E == cfg.embedding_input_dim
    a1 = params["op_modules"]["arity1"]["layers"]
    assert a1[0]["w"].shape == (4, 8) and a1[-1]["w"].shape == (8, 1)


def test_operator_layers_none_rejected(ontology):
    cfg = _tiny_cfg(F=2, operator_layers=0)
    cfg.operator_layers_config = None
    interp = Interpreter(cfg, ontology)
    with pytest.raises(ValueError, match="operator_layers_config"):
        interp.init_params(jax.random.PRNGKey(0))


def test_freeze_embedding_covers_extra_channels(ontology):
    """freeze_embedding_network freezes the extra concept channels too;
    op_modules (interpreter-level, no reference freeze flag) stay live."""
    from dfol_vqa_tpu.train.optim import trainable_labels

    cfg = _tiny_cfg(F=2)
    cfg.freeze_embedding_network = True
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    labels = trainable_labels(params, cfg)
    assert set(jax.tree_util.tree_leaves(labels["embedding_extra"])) == {"freeze"}
    assert set(jax.tree_util.tree_leaves(labels["op_modules"])) == {"train"}


def test_forward_runs_all_terminals(ontology):
    """Every planted terminal family executes under F=4 with finite outputs."""
    cfg = _tiny_cfg(F=4)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(1))
    world = _world(ontology, cfg)
    compiler = ProgramCompiler(ontology, object_num=8, rel_slots=2)
    datasets = [
        ProgramDataset(world.generate_family(fam, 8, length=1, seed=3, id_prefix=fam),
                       ontology)
        for fam in ("exist", "verify_rel", "query_attr", "choose_rel", "compare")
    ]
    seen = set()
    for b in BatchLoader(datasets, compiler, world, 8, 8, shuffle=False, prefetch=0):
        out = interp.step(b.spec, is_training=False)(
            params, jnp.asarray(b.objects), jnp.asarray(b.obj_mask),
            {k: jnp.asarray(v) for k, v in b.arrays.items()}, None,
        )
        lp = np.asarray(out["log_probability"], np.float64)
        assert np.isfinite(out["loss"]), b.spec.terminal_op
        assert np.all(lp <= 1e-5), b.spec.terminal_op  # log-probabilities
        seen.add(b.spec.terminal_op)
    assert {"exist", "verify_rel", "query_attr", "choose_rel", "compare"} <= seen


@pytest.mark.slow
def test_gradients_reach_operator_modules(ontology):
    cfg = _tiny_cfg(F=4)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(2))
    world = _world(ontology, cfg)
    qs = world.generate_family("verify_rel", 32, length=1, seed=5)
    batch = next(iter(_loader(qs, ontology, world)))
    assert any(OP_RELATE in g for g in batch.spec.grid) or \
        batch.spec.terminal_op == "verify_rel"

    def loss_fn(p):
        out = interp.forward(
            p, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
            {k: jnp.asarray(v) for k, v in batch.arrays.items()},
            batch.spec, is_training=True, rng=None,
        )
        return out["loss"]

    # At init the op modules' final layers are ZERO (identity-at-init, r4):
    # only they receive gradient on step 0; the extra embedding channels and
    # earlier module layers unlock once the final layer moves.
    grads = jax.grad(loss_fn)(params)
    for arity in ("arity1", "arity2"):
        g = jax.tree_util.tree_leaves(grads["op_modules"][arity]["layers"][-1])
        norm = float(sum(jnp.sum(jnp.abs(x)) for x in g))
        assert norm > 0.0, f"no gradient reached op_modules[{arity}] final layer"

    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)
    import optax

    updates, opt_state = tx.update(grads, opt_state, params)
    params1 = optax.apply_updates(params, updates)
    grads1 = jax.grad(loss_fn)(params1)
    for arity in ("arity1", "arity2"):
        g = jax.tree_util.tree_leaves(grads1["op_modules"][arity])
        norm = float(sum(jnp.sum(jnp.abs(x)) for x in g))
        assert norm > 0.0, f"no gradient reached op_modules[{arity}] after step 1"
    gx = jax.tree_util.tree_leaves(grads1["embedding_extra"])
    assert float(sum(jnp.sum(jnp.abs(x)) for x in gx)) > 0.0


@pytest.mark.slow
def test_identity_at_init(ontology):
    """F=4 at init reproduces the F=1 model EXACTLY (r4): the operator
    modules emit a zero residual delta at step 0, so the extra channels are
    strictly additive capacity rather than a scrambled re-init (the r3
    ablation's −0.24 accuracy gap came from losing the GloVe-seeded F=1
    starting point)."""
    key = jax.random.PRNGKey(42)
    cfg1, cfg4 = _tiny_cfg(F=1), _tiny_cfg(F=4)
    interp1, interp4 = Interpreter(cfg1, ontology), Interpreter(cfg4, ontology)
    params1 = interp1.init_params(key)
    params4 = interp4.init_params(key)
    # the shared base subtrees draw from the same keys
    np.testing.assert_array_equal(
        np.asarray(params1["embedding"]["w"]), np.asarray(params4["embedding"]["w"])
    )

    world = _world(ontology, cfg4)
    for family, length in (("exist", 1), ("verify_rel", 1), ("query_attr", 1)):
        qs = world.generate_family(family, 16, length=length, seed=13)
        batch = next(iter(_loader(qs, ontology, world, batch=16)))
        args = (
            jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
            {k: jnp.asarray(v) for k, v in batch.arrays.items()},
            batch.spec, False, None,
        )
        out1 = interp1.forward(params1, *args)
        out4 = interp4.forward(params4, *args)
        np.testing.assert_array_equal(
            np.asarray(out1["log_probability"]), np.asarray(out4["log_probability"]),
            err_msg=f"{family}: F=4 at init must equal F=1 exactly",
        )
        np.testing.assert_array_equal(
            np.asarray(out1["answer_flags"]), np.asarray(out4["answer_flags"])
        )


@pytest.mark.slow
def test_warm_start_from_f1_checkpoint(ontology, tmp_path):
    """A trained F=1 oracle checkpoint partial-restores into the F=4 model:
    shared subtrees (featurizer/attr/rel/embedding) transfer, the
    trainable-interpreter extras keep their init — the practical migration
    path for turning the mode on mid-curriculum (reference strict=False
    analog, batch_base_interpreter.py:42-43)."""
    from dfol_vqa_tpu.train import checkpoint

    cfg1 = _tiny_cfg(F=1)
    interp1 = Interpreter(cfg1, ontology)
    params1 = interp1.init_params(jax.random.PRNGKey(9))
    checkpoint.save(str(tmp_path), "oracle_f1", params1, global_step=7)
    checkpoint.wait_pending()

    cfg4 = _tiny_cfg(F=4)
    interp4 = Interpreter(cfg4, ontology)
    params4 = interp4.init_params(jax.random.PRNGKey(10))
    init_extra = jax.tree_util.tree_leaves(params4["embedding_extra"])
    restored, step = checkpoint.load(str(tmp_path), "oracle_f1", params4)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored["embedding"]["w"]), np.asarray(params1["embedding"]["w"])
    )
    for a, b in zip(jax.tree_util.tree_leaves(restored["embedding_extra"]), init_extra):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the restored hybrid executes
    world = _world(ontology, cfg4)
    qs = world.generate_family("exist", 8, length=1, seed=11)
    b = next(iter(_loader(qs, ontology, world, batch=8)))
    out = interp4.step(b.spec, is_training=False)(
        restored, jnp.asarray(b.objects), jnp.asarray(b.obj_mask),
        {k: jnp.asarray(v) for k, v in b.arrays.items()}, None,
    )
    assert np.isfinite(float(out["loss"]))


def test_f2_relation_paths_agree(ontology):
    """The three relation-cache formulations (per-question, O-blocked,
    shared-image XLA tail) produce identical F>1 log-likelihoods."""
    from dfol_vqa_tpu.models import oracle as om

    cfg = _tiny_cfg(F=2)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(3))
    B, O = 3, 8
    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    attr_in = jax.random.normal(k1, (B, O, cfg.attr_input_dim))
    pos = jax.random.uniform(k2, (B, O, 4))
    rel_tokens = jnp.asarray([[5, 9], [9, 0], [12, 5]], jnp.int32)

    base = om.rel_cache(params, attr_in, pos, rel_tokens, cfg)
    assert base.shape == (B, 2, O, O)

    cfg_blk = _tiny_cfg(F=2)
    cfg_blk.tpu.rel_block_size = 4
    blocked = om.rel_cache(params, attr_in, pos, rel_tokens, cfg_blk)
    np.testing.assert_allclose(np.asarray(base), np.asarray(blocked),
                               rtol=1e-6, atol=1e-6)

    shared = om.rel_cache_shared(
        params, attr_in, pos, jnp.arange(B, dtype=jnp.int32), rel_tokens, cfg
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(shared),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_trainable_interpreter_learns(ontology):
    """Answer-only supervision still learns with the F=4 feature oracle +
    operator modules in the loop (the whole point of the mode)."""
    cfg = _tiny_cfg(F=4)
    world = _world(ontology, cfg)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    train_qs = world.generate(256, hops=1, seed=1)
    test_qs = world.generate(64, hops=1, seed=2)

    trainer = VQATrainer(cfg, interp)
    trainer._tx = build_optimizer(cfg, params)
    opt_state = trainer._tx.init(params)
    rng = jax.random.PRNGKey(0)
    step = 0
    while step < 240:
        for batch in _loader(train_qs, ontology, world, shuffle=True):
            if step >= 240:
                break
            fn = trainer._train_step(batch.spec)
            params, opt_state, loss, _, rng = fn(
                params, opt_state, jnp.asarray(batch.objects),
                jnp.asarray(batch.obj_mask),
                {k: jnp.asarray(v) for k, v in batch.arrays.items()}, rng,
            )
            step += 1
    err = trainer.test_epoch(_loader(test_qs, ontology, world), params)
    acc = 1.0 - err[0]
    assert acc > 0.7, f"trainable interpreter failed to learn: acc={acc}"
