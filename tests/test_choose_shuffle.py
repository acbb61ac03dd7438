"""Gather-time choose-option shuffling (round 3).

The per-epoch choose-option shuffle used to force per-batch host
compilation for EVERY training loader (compiler._shuffle_choose disabled
precompilation globally); it is now a K-axis permutation applied to the
precompiled arrays at gather time. These tests pin the equivalence."""

import numpy as np
import jax
import pytest

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
from dfol_vqa_tpu.data.dataset import ProgramDataset
from dfol_vqa_tpu.data.features import SyntheticFeatures
from dfol_vqa_tpu.data.loader import BatchLoader
from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.models.interpreter import Interpreter

from tests.test_pipeline_train import tiny_cfg


def _loader(ontology, cfg, qs, shuffle_choose, shuffle=False, seed=0,
            num_workers=0):
    ds = ProgramDataset(qs, ontology)
    compiler = ProgramCompiler(ontology, object_num=cfg.tpu.max_object_num,
                               rel_slots=cfg.tpu.rel_table_size,
                               shuffle_choose=shuffle_choose)
    feats = SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=2,
                              max_objects=cfg.tpu.max_object_num)
    return BatchLoader([ds], compiler, feats, 8, cfg.tpu.max_object_num,
                       shuffle=shuffle, seed=seed, prefetch=0,
                       num_workers=num_workers)


@pytest.mark.parametrize("terminal", ["choose_attr", "choose_rel"])
def test_shuffled_options_are_permutations_with_aligned_targets(ontology, terminal):
    cfg = tiny_cfg(dropout=0.0)
    qs = generate_questions(ontology, 16, terminal=terminal, length=1, seed=8)
    plain = {b.compiled.question_ids[qi]: (b, qi)
             for b in _loader(ontology, cfg, qs, False) for qi in range(8)}
    shuf = _loader(ontology, cfg, qs, True)
    saw_permuted = False
    for b in shuf:
        assert b.spec.terminal_op == terminal
        for qi, qid in enumerate(b.compiled.question_ids):
            pb, pqi = plain[qid]
            k = int(b.compiled.opt_mask[qi].sum())
            assert k == int(pb.compiled.opt_mask[pqi].sum())
            # same option multiset, possibly different order
            assert sorted(b.compiled.options[qi, :k].tolist()) == \
                sorted(pb.compiled.options[pqi, :k].tolist())
            if b.compiled.options[qi, :k].tolist() != \
                    pb.compiled.options[pqi, :k].tolist():
                saw_permuted = True
            # answer target follows its token through the permutation
            for j in range(k):
                tok = b.compiled.options[qi, j]
                pj = pb.compiled.options[pqi, :k].tolist().index(tok)
                assert b.compiled.answer_opt[qi, j] == \
                    pb.compiled.answer_opt[pqi, pj]
                assert b.compiled.option_strings[qi][j] == \
                    pb.compiled.option_strings[pqi][pj]
                if terminal == "choose_rel":
                    assert b.compiled.opt_rel_idx[qi, j] == \
                        pb.compiled.opt_rel_idx[pqi, pj]
    assert saw_permuted, "shuffle never permuted anything"


def test_shuffle_varies_by_epoch_and_preserves_eval(ontology):
    cfg = tiny_cfg(dropout=0.0)
    qs = generate_questions(ontology, 16, terminal="choose_attr", length=1, seed=9)
    loader = _loader(ontology, cfg, qs, True, shuffle=True)
    e0 = [b.compiled.options.copy() for b in loader]
    loader._epoch += 1
    e1 = [b.compiled.options.copy() for b in loader]
    assert any(not np.array_equal(a, c) for a, c in zip(e0, e1))

    # answers are invariant under the permutation (executor equivariance)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    import jax.numpy as jnp

    def answers(shuffle_choose):
        out = {}
        for b in _loader(ontology, cfg, qs, shuffle_choose):
            r = interp.forward(params, jnp.asarray(b.objects),
                               jnp.asarray(b.obj_mask),
                               {k: jnp.asarray(v) for k, v in b.arrays.items()},
                               b.spec, False, None)
            from dfol_vqa_tpu.train.trainer import VQATrainer

            t = VQATrainer(cfg, interp)
            for qi, qid in enumerate(b.compiled.question_ids):
                out[qid] = sorted(t.decode_answers(r, b)[qi])
        return out

    assert answers(True) == answers(False)


def test_worker_sharded_shuffle_matches_single_process(ontology):
    cfg = tiny_cfg(dropout=0.0)
    qs = generate_questions(ontology, 24, terminal="choose_rel", length=1, seed=10)
    single = [b.compiled.options.copy()
              for b in _loader(ontology, cfg, qs, True, shuffle=True, seed=3)]
    workers = [b.compiled.options.copy()
               for b in _loader(ontology, cfg, qs, True, shuffle=True, seed=3,
                                num_workers=2)]
    assert len(single) == len(workers)
    for a, b in zip(single, workers):
        np.testing.assert_array_equal(a, b)


def test_train_loader_is_precompiled_now(ontology):
    """The point of the change: shuffle_choose no longer disables
    precompilation (per-epoch host recompes dominated curriculum time)."""
    cfg = tiny_cfg(dropout=0.0)
    qs = generate_questions(ontology, 16, terminal="choose_attr", length=1, seed=11)
    loader = _loader(ontology, cfg, qs, True, shuffle=True)
    assert loader._precompile
    list(loader)
    assert loader._precompiled is not None
