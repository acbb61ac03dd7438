"""PrecompiledDataset fast path == runtime compilation, incl. two-branch and
relation-fan-out terminals, and one spec per file."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler
from dfol_vqa_tpu.data.dataset import ProgramDataset
from dfol_vqa_tpu.data.features import SyntheticFeatures
from dfol_vqa_tpu.data.loader import BatchLoader
from dfol_vqa_tpu.data.synthetic import generate_questions
from dfol_vqa_tpu.models.interpreter import Interpreter

from tests.test_pipeline_train import tiny_cfg


@pytest.mark.parametrize("term", ["verify_rel", "compare", "two_same", "choose_rel"])
def test_precompiled_matches_runtime(ontology, term):
    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    qs = generate_questions(ontology, 14, terminal=term, length=2, seed=99)
    ds = ProgramDataset(qs, ontology)
    comp = ProgramCompiler(ontology, object_num=6, rel_slots=4)
    feats = SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=2, max_objects=6)

    def run(pre):
        loader = BatchLoader([ds], comp, feats, 4, 6, shuffle=False, prefetch=0,
                             precompile=pre)
        lps, specs = [], set()
        for b in loader:
            out = interp.forward(
                params, jnp.asarray(b.objects), jnp.asarray(b.obj_mask),
                {k: jnp.asarray(v) for k, v in b.arrays.items()}, b.spec, False, None,
            )
            qm = b.compiled.question_mask
            lps.extend(np.asarray(out["log_probability"])[qm > 0].reshape(-1).tolist())
            specs.add(b.spec)
        return np.array(lps), specs

    a, specs_pre = run(True)
    b, _ = run(False)
    assert len(specs_pre) == 1  # whole file shares one XLA program
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_precompile_stays_on_for_choose_shuffle(ontology):
    """r3: shuffle_choose no longer forces per-epoch host recompiles — the
    shuffle is a gather-time K-axis permutation on the precompiled arrays
    (loader.shuffle_choose_options; equivalence pinned in
    tests/test_choose_shuffle.py)."""
    comp = ProgramCompiler(ontology, object_num=6, shuffle_choose=True)
    qs = generate_questions(ontology, 4, terminal="choose_attr", seed=1)
    feats = SyntheticFeatures(box_dim=8, min_objects=2, max_objects=6)
    loader = BatchLoader([ProgramDataset(qs, ontology)], comp, feats, 4, 6,
                         shuffle=True, prefetch=0)
    assert loader._precompile is True
    assert loader._shuffle_choose is True


@pytest.mark.parametrize("precompile", [True, False])
def test_multiprocess_loader_matches_single(ontology, precompile):
    """num_workers>0 must reproduce the single-process batch sequence
    exactly (content and order), for both compile paths."""
    from dfol_vqa_tpu.data.synthetic import generate_questions as gen

    qs = gen(ontology, 22, terminal="exist", length=2, seed=5)
    ds = ProgramDataset(qs, ontology)
    comp = ProgramCompiler(ontology, object_num=6, rel_slots=4)
    feats = SyntheticFeatures(box_dim=16, min_objects=2, max_objects=6)

    def collect(workers):
        loader = BatchLoader([ds], comp, feats, 4, 6, shuffle=True, seed=11,
                             prefetch=2, precompile=precompile,
                             num_workers=workers)
        return [
            (b.spec, b.compiled.question_ids, np.asarray(b.objects).copy(),
             np.asarray(b.packed).copy()) for b in loader
        ]

    ref = collect(0)
    got = collect(3)
    assert len(ref) == len(got) == 6
    for (s1, q1, o1, p1), (s2, q2, o2, p2) in zip(ref, got):
        assert s1 == s2 and q1 == q2
        np.testing.assert_array_equal(o1, o2)
        np.testing.assert_array_equal(p1, p2)


def test_multiprocess_loader_propagates_worker_error(ontology):
    qs = generate_questions(ontology, 8, terminal="exist", seed=2)
    ds = ProgramDataset(qs, ontology)
    comp = ProgramCompiler(ontology, object_num=6)

    class Boom(SyntheticFeatures):
        def image(self, image_id):
            raise ValueError("boom")

    feats = Boom(box_dim=8, min_objects=2, max_objects=6)
    loader = BatchLoader([ds], comp, feats, 4, 6, shuffle=False, prefetch=1,
                         num_workers=2)
    with pytest.raises(RuntimeError, match="loader worker"):
        list(loader)


def test_multiprocess_loader_after_jax_init(ontology):
    """Realistic order: JAX backend already initialized in the parent, then
    fork workers and run device compute on their batches."""
    from tests.test_pipeline_train import tiny_cfg

    cfg = tiny_cfg(dropout=0.0)
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(0))
    _ = float(jnp.sum(jnp.ones(4)))  # force backend/client init before fork
    qs = generate_questions(ontology, 12, terminal="exist", length=1, seed=8)
    ds = ProgramDataset(qs, ontology)
    comp = ProgramCompiler(ontology, object_num=6, rel_slots=4)
    feats = SyntheticFeatures(box_dim=cfg.box_features_dim, min_objects=2, max_objects=6)
    loader = BatchLoader([ds], comp, feats, 4, 6, shuffle=False, prefetch=2,
                         num_workers=2)
    seen = 0
    for b in loader:
        out = interp.forward(
            params, jnp.asarray(b.objects), jnp.asarray(b.obj_mask),
            {k: jnp.asarray(v) for k, v in b.arrays.items()}, b.spec, False, None,
        )
        assert np.isfinite(np.asarray(out["log_probability"])).all()
        seen += 1
    assert seen == 3
