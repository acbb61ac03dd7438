"""Regressions for the round-1 advisor findings (ADVICE.md).

Covers: end-terminal evaluation through the trainer, best-checkpoint
selection without a validation loader, and loader-worker death detection.
"""

import os

import numpy as np
import jax
import pytest

from dfol_vqa_tpu.train.trainer import VQATrainer
from dfol_vqa_tpu.models.interpreter import Interpreter
from dfol_vqa_tpu.data.synthetic import generate_questions

from tests.test_pipeline_train import make_loader, tiny_cfg


def _end_terminal_questions(ontology, n, seed=0):
    """exist questions rewritten to a non-terminal last op: the compiler
    folds it into the branch and synthesizes terminal 'end'
    (program_compiler.py select/filter/relate-terminal rewrite)."""
    adjs = [t for t in ontology._adjectives if t in ontology._arg_to_idx]
    qs = generate_questions(ontology, n, terminal="exist", length=1, seed=seed)
    for i, q in enumerate(qs):
        q["program"] = {
            "branches": q["program"]["branches"],
            "last_op": {"operator": "filter", "arguments": [adjs[i % len(adjs)]]},
        }
    return qs


def test_trainer_test_epoch_handles_end_terminal(ontology):
    """ADVICE: OP_INDEX has no 'end' bucket; test_epoch must count such
    batches in over_all instead of raising KeyError."""
    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = _end_terminal_questions(ontology, 8)
    loader = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
    batch = next(iter(loader))
    assert batch.spec.terminal_op == "end"
    trainer = VQATrainer(cfg, interp)
    err = trainer.test_epoch(loader, params)
    assert np.isfinite(err).all()
    # over_all bucket accounted; no per-op bucket exists for 'end'
    assert 0.0 <= err[0] <= 1.0


def test_no_best_checkpoint_without_validation(ontology, tmp_path):
    """ADVICE: with validation_loader=None the all-zero errors array must
    not pin _best_error to 0.0 / write a bogus 'best' checkpoint."""
    cfg = tiny_cfg(dropout=0.0)
    cfg.epoch_num = 2
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 8, terminal="exist", length=1, seed=1)
    loader = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
    trainer = VQATrainer(cfg, interp)
    best_dir = str(tmp_path / "best")
    last_dir = str(tmp_path / "last")
    os.makedirs(best_dir), os.makedirs(last_dir)
    trainer.train(
        loader, None, params,
        best_export_path_base=best_dir, last_export_path_base=last_dir,
    )
    assert trainer._best_error == np.inf
    # no model file was written under best/ (losses/errors .npy dumps are fine)
    assert not [f for f in os.listdir(best_dir) if not f.endswith(".npy")]
    assert [f for f in os.listdir(last_dir)]  # 'last' still saved


@pytest.mark.slow  # multiprocess robustness; quick tier keeps the sequence-exactness loader tests
def test_multiprocess_loader_detects_dead_worker(ontology):
    """ADVICE: a fork worker killed without enqueueing its sentinel must
    raise, not block .get() forever."""
    import pytest

    cfg = tiny_cfg(dropout=0.0)
    qs = generate_questions(ontology, 24, terminal="exist", length=1, seed=2)
    loader = make_loader(ontology, cfg, qs, batch_size=8, shuffle=False)
    loader._num_workers = 1
    loader._prefetch = 1

    # simulate an OOM-kill: the worker dies before producing anything
    def killed_shard(k, n):
        os._exit(17)
        yield  # pragma: no cover

    loader._produce_shard = killed_shard
    with pytest.raises(RuntimeError, match="died"):
        list(loader)
