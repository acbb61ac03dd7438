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


def test_precompile_disabled_for_choose_shuffle(ontology):
    comp = ProgramCompiler(ontology, object_num=6, shuffle_choose=True)
    qs = generate_questions(ontology, 4, terminal="choose_attr", seed=1)
    feats = SyntheticFeatures(box_dim=8, min_objects=2, max_objects=6)
    loader = BatchLoader([ProgramDataset(qs, ontology)], comp, feats, 4, 6,
                         shuffle=True, prefetch=0)
    assert loader._precompile is False
