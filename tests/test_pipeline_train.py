"""Integration tests: h5 codec roundtrip, loader, trainer loop, checkpointing."""

import json
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.compiler.h5_codec import ProgramH5Codec
from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.data.dataset import ProgramDataset, iter_batches
from dfol_vqa_tpu.data.features import SyntheticFeatures
from dfol_vqa_tpu.data.loader import BatchLoader
from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.train import checkpoint as ckpt
from dfol_vqa_tpu.train.trainer import VQATrainer


def tiny_cfg(**kw):
    base = dict(
        box_features_dim=32,
        oracle_input_dim=16,
        word_embedding_dim=12,
        featurizer_layers_config=[],
        attribute_network_layers_config=[8],
        relation_network_layers_config=[8],
        dropout=0.1,
        epoch_num=1,
        checkpointing_frequency=1000,
        verbose=False,
    )
    base.update(kw)
    cfg = Config(**base)
    cfg.tpu.max_object_num = 6
    cfg.tpu.rel_table_size = 4
    return cfg


def test_h5_codec_roundtrip(ontology, tmp_path):
    qs = generate_questions(ontology, 20, terminal="verify_rel", length=2, seed=1)
    # image ids must be in vocab for the codec; remap to real GQA image ids
    for i, q in enumerate(qs):
        q["imageId"] = ontology._images[i]
    codec = ProgramH5Codec(ontology)
    path = str(tmp_path / "x.h5")
    codec.write_h5(qs, path)

    ds = ProgramDataset(path, ontology)
    assert len(ds) == 20
    for i in range(20):
        got = ds[i]
        assert got["imageId"] == qs[i]["imageId"]
        assert got["program"]["last_op"]["operator"] == "verify_rel"
        ops0 = [o["operator"] for o in got["program"]["branches"][0]]
        assert ops0 == [o["operator"] for o in qs[i]["program"]["branches"][0]]
        # answers decode to the same canonical token
        assert str(got["answer"]) == qs[i]["answer"]


@pytest.mark.parametrize("shuffle", [True, False])
def test_iter_batches_single_dataset_batches(ontology, shuffle):
    qs1 = generate_questions(ontology, 17, terminal="exist", seed=2)
    qs2 = generate_questions(ontology, 9, terminal="choose_attr", seed=3)
    d1, d2 = ProgramDataset(qs1, ontology), ProgramDataset(qs2, ontology)
    seen = 0
    for batch, n_pad in iter_batches([d1, d2], 8, shuffle=shuffle, seed=0):
        assert len(batch) == 8
        terms = {q["program"]["last_op"]["operator"] for q in batch}
        assert len(terms) == 1  # single-file invariant
        seen += 8 - n_pad
    assert seen == 26


def make_loader(ontology, cfg, qs, batch_size=8, shuffle=True):
    ds = ProgramDataset(qs, ontology)
    compiler = ProgramCompiler(ontology, object_num=cfg.tpu.max_object_num,
                               rel_slots=cfg.tpu.rel_table_size)
    feats = SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=2,
                              max_objects=cfg.tpu.max_object_num)
    return BatchLoader([ds], compiler, feats, batch_size, cfg.tpu.max_object_num,
                       shuffle=shuffle, prefetch=0)


def test_train_and_eval_loop(ontology, tmp_path):
    cfg = tiny_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 24, terminal="exist", length=2, seed=4)
    loader = make_loader(ontology, cfg, qs)
    val = make_loader(ontology, cfg, qs, shuffle=False)
    trainer = VQATrainer(cfg, interp)
    best = str(tmp_path / "best")
    last = str(tmp_path / "last")
    os.makedirs(best), os.makedirs(last)
    params2, errors, losses = trainer.train(
        loader, val, params, last_export_path_base=last, best_export_path_base=best
    )
    assert np.isfinite(losses).all()
    assert os.path.exists(os.path.join(last, cfg.model_name + ".npz"))
    assert os.path.exists(os.path.join(best, "errors.npy"))
    err = errors[:, 0, 0]
    assert 0.0 <= err[0] <= 1.0


def test_training_reduces_loss_on_learnable_task(ontology):
    """Overfit 8 fixed exist-questions: loss after 30 steps < loss at start."""
    cfg = tiny_cfg(learning_rate=0.01, dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 8, terminal="exist", length=1, seed=5)
    loader = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
    trainer = VQATrainer(cfg, interp)
    from dfol_vqa_tpu.train.optim import build_optimizer

    trainer._tx = build_optimizer(cfg, params)
    opt_state = trainer._tx.init(params)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    fn = trainer._train_step(batch.spec)
    losses = []
    for i in range(30):
        params, opt_state, loss, _, _rng = fn(
            params, opt_state, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
            arrays, jax.random.PRNGKey(i),
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


def test_freeze_flags_keep_params_fixed(ontology):
    cfg = tiny_cfg(freeze_attribute_network=True, dropout=0.0, learning_rate=0.05)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    before = np.asarray(params["attribute_network"]["layers"][0]["w"]).copy()
    emb_before = np.asarray(params["embedding"]["w"]).copy()
    qs = generate_questions(ontology, 8, terminal="exist", seed=6)
    loader = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
    trainer = VQATrainer(cfg, interp)
    from dfol_vqa_tpu.train.optim import build_optimizer

    trainer._tx = build_optimizer(cfg, params)
    opt_state = trainer._tx.init(params)
    batch = next(iter(loader))
    arrays = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    fn = trainer._train_step(batch.spec)
    for i in range(3):
        params, opt_state, loss, _, _rng = fn(
            params, opt_state, jnp.asarray(batch.objects), jnp.asarray(batch.obj_mask),
            arrays, jax.random.PRNGKey(i),
        )
    np.testing.assert_array_equal(np.asarray(params["attribute_network"]["layers"][0]["w"]), before)
    assert not np.array_equal(np.asarray(params["embedding"]["w"]), emb_before)


def test_checkpoint_partial_restore(ontology, tmp_path):
    """strict=False analog: restore overlapping paths, keep the rest."""
    cfg = tiny_cfg()
    interp = Interpreter(cfg, ontology)
    p1 = interp.init_params(jax.random.PRNGKey(0))
    ckpt.save(str(tmp_path), "m", p1, global_step=42)

    cfg2 = tiny_cfg(activate_attention_transfer=True)
    interp2 = Interpreter(cfg2, ontology)
    p2 = interp2.init_params(jax.random.PRNGKey(1))
    calib_before = jax.tree_util.tree_leaves(p2["calibrator"])[0].copy()
    restored, step = ckpt.load(str(tmp_path), "m", p2)
    assert step == 42
    np.testing.assert_array_equal(
        np.asarray(restored["embedding"]["w"]), np.asarray(p1["embedding"]["w"])
    )
    # calibrator absent from file -> keeps its fresh init
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored["calibrator"])[0]),
        np.asarray(calib_before),
    )


@pytest.mark.slow  # quick tier keeps the default-backend checkpoint round-trip + async-ckpt suite
def test_checkpoint_orbax_backend(ontology, tmp_path):
    """orbax backend round-trips params + step and keeps strict=False
    semantics; load() auto-detects the directory format."""
    cfg = tiny_cfg()
    interp = Interpreter(cfg, ontology)
    p1 = interp.init_params(jax.random.PRNGKey(0))
    ckpt.save(str(tmp_path), "m", p1, global_step=7, backend="orbax")
    assert (tmp_path / "m.orbax").is_dir()

    cfg2 = tiny_cfg(activate_attention_transfer=True)
    interp2 = Interpreter(cfg2, ontology)
    p2 = interp2.init_params(jax.random.PRNGKey(1))
    calib_before = jax.tree_util.tree_leaves(p2["calibrator"])[0].copy()
    restored, step = ckpt.load(str(tmp_path), "m", p2)
    assert step == 7
    np.testing.assert_array_equal(
        np.asarray(restored["embedding"]["w"]), np.asarray(p1["embedding"]["w"])
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(restored["calibrator"])[0]),
        np.asarray(calib_before),
    )


def test_predict_output_format(ontology, tmp_path):
    cfg = tiny_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 10, terminal="query_attr", seed=7)
    loader = make_loader(ontology, cfg, qs, batch_size=5, shuffle=False)
    trainer = VQATrainer(cfg, interp)
    out_path = tmp_path / "pred.json"
    with open(out_path, "w") as f:
        preds = trainer.predict(loader, params, f)
    data = json.loads(out_path.read_text())
    assert len(data) == 10
    assert {"questionId", "prediction", "type", "options"} <= set(data[0].keys())


def test_lazy_dataset_matches_in_memory(ontology, tmp_path):
    """in_memory=False lazy reads (json offsets / per-index h5 + LRU) return
    identical rows (reference data_pipeline.py:309-380)."""
    import json as _json

    qs = generate_questions(ontology, 15, terminal="exist", length=2, seed=9)
    for i, q in enumerate(qs):
        q["imageId"] = ontology._images[i]
    jpath = tmp_path / "q.json"
    with open(jpath, "w") as f:
        for q in qs:
            f.write(_json.dumps(q) + "\n")
    codec = ProgramH5Codec(ontology)
    hpath = tmp_path / "q.h5"
    codec.write_h5(qs, str(hpath))

    for path in (jpath, hpath):
        mem = ProgramDataset(str(path), ontology, in_memory=True)
        lazy = ProgramDataset(str(path), ontology, in_memory=False, max_cache_size=4)
        assert len(mem) == len(lazy) == 15
        for i in [0, 7, 14, 7, 3]:  # incl. cache hit + eviction traffic
            a, b = mem[i], lazy[i]
            assert a["program"] == b["program"]
            assert str(a["answer"]) == str(b["answer"])


def test_mid_epoch_checkpointing_and_best_selection(ontology, tmp_path):
    """ckeckpointing_frequency triggers mid-epoch validation + best/last saves
    (reference trainer.py:404-423)."""
    cfg = tiny_cfg(checkpointing_frequency=1, dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 16, terminal="exist", seed=8)
    loader = make_loader(ontology, cfg, qs, batch_size=8)
    val = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
    trainer = VQATrainer(cfg, interp)
    best, last = str(tmp_path / "b"), str(tmp_path / "l")
    trainer.train(loader, val, params, last_export_path_base=last,
                  best_export_path_base=best)
    assert os.path.exists(os.path.join(best, cfg.model_name + ".npz"))
    assert os.path.exists(os.path.join(last, cfg.model_name + ".npz"))
    assert np.isfinite(trainer._best_error)


def test_hardset_mining_writes_files(ontology, tmp_path):
    """-o hardset mining: per-op hard/easy JSONL + aggregate dumps
    (reference trainer.py:33-45,301-316,714-718)."""
    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 12, terminal="exist", seed=9)
    ds = ProgramDataset(qs, ontology)
    compiler = ProgramCompiler(ontology, object_num=cfg.tpu.max_object_num,
                               rel_slots=cfg.tpu.rel_table_size)
    feats = SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=2,
                              max_objects=cfg.tpu.max_object_num)
    loader = BatchLoader([ds], compiler, feats, 6, cfg.tpu.max_object_num,
                         shuffle=False, prefetch=0, keep_original=True)
    hp = str(tmp_path / "hardset")
    os.makedirs(hp)
    trainer = VQATrainer(cfg, interp, hardset_path=hp)
    trainer.test(loader, params)
    assert os.path.exists(os.path.join(hp, "hard.json"))
    assert os.path.exists(os.path.join(hp, "easy.json"))
    hard = json.loads(open(os.path.join(hp, "hard.json")).read())
    easy = json.loads(open(os.path.join(hp, "easy.json")).read())
    assert len(hard) + len(easy) == 12


def test_predict_submission_mode(ontology, tmp_path):
    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 6, terminal="choose_attr", seed=10)
    loader = make_loader(ontology, cfg, qs, batch_size=6, shuffle=False)
    trainer = VQATrainer(cfg, interp)
    out_path = tmp_path / "sub.json"
    with open(out_path, "w") as f:
        trainer.predict(loader, params, f, is_submission=True)
    data = json.loads(out_path.read_text())
    assert len(data) == 6
    assert set(data[0].keys()) == {"questionId", "prediction"}
    assert isinstance(data[0]["prediction"], str)


def test_chunked_training_matches_per_step(ontology):
    """cfg.tpu.train_chunk scans k same-bucket steps per dispatch with
    identical parameter trajectories."""

    def run(chunk):
        cfg = tiny_cfg(dropout=0.0, learning_rate=1e-3)
        cfg.tpu.train_chunk = chunk
        interp = Interpreter(cfg, ontology)
        params = interp.init_params(jax.random.PRNGKey(0))
        qs = generate_questions(ontology, 32, terminal="exist", length=2, seed=5)
        loader = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
        trainer = VQATrainer(cfg, interp)
        params, errors, losses = trainer.train(loader, None, params)
        return params, losses, trainer.global_step

    p1, l1, s1 = run(1)
    p2, l2, s2 = run(4)
    assert s1 == s2 == 4
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
