"""Planted-world ground-truth validation with a perfect static oracle.

For every terminal family, run the compiled executor with an oracle that
returns the planted scene's exact boolean concepts (p=0.99/0.01) and assert
the predicted answers match the generator's ground truth. This pins the
generator's conventions (relate subject/object orientation, compare is_less
flip per batch_gqa_ops.py:736-739, choose/query category semantics) against
the interpreter's reference-parity-tested semantics, so curriculum accuracy
on PlantedWorld measures genuine learning rather than convention luck.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler, batch_arrays
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.data.planted import PlantedWorld, ALL_FAMILIES
from dfol_vqa_tpu.models.interpreter import Interpreter
from tests.helpers import static_world

O = 8
P_TRUE, P_FALSE = 0.99, 0.01


@pytest.fixture(scope="module")
def setup(ontology):
    cfg = Config(normalize_oracle=False, likelihood_threshold=0.0)
    cfg.tpu.max_object_num = O
    interp = Interpreter(cfg, ontology)
    compiler = ProgramCompiler(ontology, object_num=O, rel_slots=4)
    world = PlantedWorld(ontology, box_dim=16, n_nouns=6, n_attrs=6, n_images=96,
                         min_objects=3, max_objects=O, noise=0.0, seed=7)
    return cfg, interp, compiler, world


def _truth_tables(world, ontology, questions):
    """Per-question token->log-likelihood tables from planted ground truth."""
    tokens = set(world.nouns)
    for cat, _ in world.categories:
        tokens.update(o for o in ontology.query(cat) if o in ontology._arg_to_idx)
    attr_tables, rel_tables, counts = [], [], []
    for q in questions:
        s = world._scenes[q["imageId"]]
        n = s["n"]
        at = {}
        for tok in tokens:
            p = np.full(O, P_FALSE, np.float32)
            for o in range(n):
                if world._holds_attr(s, o, tok):
                    p[o] = P_TRUE
            at[tok] = np.log(p)
        rt = {}
        for rel in world.relations:
            p = np.full((O, O), P_FALSE, np.float32)
            for i in range(n):
                for j in range(n):
                    if i != j and world._holds_rel(s, i, j, rel):
                        p[i, j] = P_TRUE
            rt[rel] = np.log(p)
        attr_tables.append(at)
        rel_tables.append(rt)
        counts.append(n)
    return attr_tables, rel_tables, counts


@pytest.mark.parametrize("family", ALL_FAMILIES)
@pytest.mark.parametrize("length", [0, 1, 2])
def test_perfect_oracle_matches_ground_truth(setup, ontology, family, length):
    cfg, interp, compiler, world = setup
    qs = world.generate_family(family, 32, length=length, seed=11, balanced=True)
    spec, batch = compiler.compile(qs)
    attr_tables, rel_tables, counts = _truth_tables(world, ontology, qs)
    sw = static_world(ontology, attr_tables, rel_tables, counts, O=O,
                      rel_tokens=batch.rel_tokens)
    arrays = {k: jnp.asarray(v) for k, v in batch_arrays(batch).items()}
    out = interp.execute(None, sw, arrays, spec, is_training=False)
    match = np.asarray(out["match"])
    bad = [qs[i] for i in np.flatnonzero(match < 0.5)]
    assert match.mean() == 1.0, f"{family} L{length}: {len(bad)} mismatches, e.g. {bad[:2]}"
