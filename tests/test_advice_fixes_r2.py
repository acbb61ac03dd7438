"""Regressions for the round-2 advisor findings (ADVICE.md).

Covers: process-independent planted-world noise seeding, the pin-branch
answer-leak exclusion, and _strip_neg None safety.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from dfol_vqa_tpu.data.planted import PlantedWorld, _strip_neg


@pytest.fixture(scope="module")
def world(ontology):
    return PlantedWorld(ontology, box_dim=16, n_nouns=6, n_attrs=6, n_images=64,
                        min_objects=3, max_objects=8, noise=0.3, seed=7)


_FEATURE_SNIPPET = """
import os, sys, zlib
import numpy as np
sys.path.insert(0, {repo!r})
from dfol_vqa_tpu.ontology import GQAOntology
from dfol_vqa_tpu.data.planted import PlantedWorld
w = PlantedWorld(GQAOntology(), box_dim=16, n_nouns=4, n_attrs=4, n_images=4,
                 min_objects=3, max_objects=5, noise=0.3, seed=7)
feats, n = w.image(w.image_ids[0])
print(zlib.crc32(feats.tobytes()))
"""


@pytest.mark.slow  # cross-process determinism; quick tier keeps test_feature_determinism
def test_noise_process_independent():
    """ADVICE (medium): noise was seeded with builtin hash(), which is
    PYTHONHASHSEED-randomized — each curriculum stage subprocess saw a
    different noise realization of the same scenes. Features must now be
    identical across interpreters with different hash seeds."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outs = []
    for hash_seed in ("1", "31337"):
        env = dict(os.environ, PYTHONHASHSEED=hash_seed)
        r = subprocess.run(
            [sys.executable, "-c", _FEATURE_SNIPPET.format(repo=repo)],
            capture_output=True, text=True, env=env, check=True,
        )
        outs.append(r.stdout.strip().splitlines()[-1])
    assert outs[0] == outs[1]


def test_noise_distinct_across_world_seeds(ontology):
    """The world seed is folded into the noise stream: two worlds with the
    same scenes but different seeds draw different noise."""
    kw = dict(box_dim=16, n_nouns=4, n_attrs=4, n_images=4,
              min_objects=3, max_objects=5, noise=0.3)
    w1 = PlantedWorld(ontology, seed=7, **kw)
    w2 = PlantedWorld(ontology, seed=8, **kw)
    f1, _ = w1.image(w1.image_ids[0])
    f2, _ = w2.image(w2.image_ids[0])
    assert not np.array_equal(f1, f2)


def _filter_tokens(branches):
    return [op["arguments"][0] for b in branches for op in b
            if op["operator"] == "filter"]


@pytest.mark.parametrize("terminal", ["query_attr", "choose_attr"])
def test_pin_branch_answer_not_in_program(world, terminal):
    """ADVICE (low): the pinned branch could include a filter equal to the
    queried category's value, letting the model read the answer off the
    program tokens. Queried-category values must never appear as filters."""
    qs = world.generate_family(terminal, 40, length=2, seed=3, balanced=False)
    for q in qs:
        cat_arg = q["program"]["last_op"]["arguments"][0]
        cat_name = cat_arg if isinstance(cat_arg, str) else None
        toks = _filter_tokens(q["program"]["branches"])
        assert q["answer"] not in toks
        # stronger: no filter token from the queried category at all
        if cat_name is not None:
            ci = next(i for i, (c, _) in enumerate(world.categories) if c == cat_name)
            for t in toks:
                assert world._opt_cat.get(t) != ci


@pytest.mark.parametrize("terminal", ["two_same", "two_different", "compare"])
def test_compared_category_not_in_pins(world, terminal):
    qs = world.generate_family(terminal, 30, length=2, seed=4, balanced=False)
    for q in qs:
        last = q["program"]["last_op"]
        if terminal == "compare":
            attr = last["arguments"][0]
            ci = world._opt_cat[attr]
        else:
            cat_name = last["arguments"][0]
            ci = next(i for i, (c, _) in enumerate(world.categories) if c == cat_name)
        for t in _filter_tokens(q["program"]["branches"]):
            assert world._opt_cat.get(t) != ci


def test_strip_neg_none_safe(world):
    """ADVICE (low): relate aux=None reached tok.startswith and raised."""
    tok, neg = _strip_neg(None)
    assert tok is None and neg is False
    img = world.image_ids[0]
    branch = [
        {"operator": "select", "arguments": ["_"]},
        {"operator": "relate",
         "arguments": [world.relations[0], True, None]},
    ]
    out = world.eval_branch(img, branch)  # must not raise
    assert out.dtype == bool
