"""Randomized program fuzz parity vs the reference (compact in-suite version
of scripts/answer_parity.py): random lengths, relates, categories."""

import numpy as np
import pytest

from tests.conftest import requires_reference


@requires_reference
@pytest.mark.parametrize("term,seed", [
    ("exist", 101), ("query_attr", 202), ("verify_rel", 303), ("two_same", 404),
])
def test_fuzz_parity(ontology, term, seed):
    import jax
    import test_full_model_parity as fmp
    from dfol_vqa_tpu.data.synthetic import generate_questions
    from dfol_vqa_tpu.models.interpreter import Interpreter, question_type_of
    from dfol_vqa_tpu.types import QuestionType

    rng = np.random.default_rng(seed)
    cfg = fmp.tiny_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(seed))

    for trial in range(2):
        qs = generate_questions(
            ontology, 5, terminal=term, length=int(rng.integers(1, 4)),
            seed=int(rng.integers(0, 1 << 30)),
        )
        counts = [int(rng.integers(2, fmp.O_PAD + 1)) for _ in qs]
        objs, mask = fmp.make_scene(rng, counts)
        ref = fmp.run_reference(params, qs, objs, mask, counts)
        spec, cb, ours = fmp.run_ours(ontology, params, qs, objs, mask)
        ref_lp = ref["log_probability"].detach().numpy().flatten()
        lp = np.asarray(ours["log_probability"])
        if question_type_of(spec.terminal_op) == QuestionType.QUERY:
            flat = []
            for qi in range(len(qs)):
                flat.extend(lp[qi, : len(cb.option_strings[qi])])
            np.testing.assert_allclose(np.array(flat), ref_lp, rtol=2e-3, atol=2e-4)
        else:
            np.testing.assert_allclose(lp, ref_lp, rtol=2e-3, atol=2e-4)
