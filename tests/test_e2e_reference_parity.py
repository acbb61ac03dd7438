"""End-to-end parity: compiled executor vs the reference GQA interpreter.

For every terminal-op family we build identical random static-oracle scenes,
run (a) the reference pipeline — ProgramCollaterBase collation +
BatchGQAInterpreter execution on ragged sparse maps — and (b) our pipeline —
ProgramCompiler + jit-friendly dense executor — and require matching
log-probabilities and answers. This validates grid alignment, masks, option
fan-out, name tracking, negation, quantifiers and the relate semantics in
one shot. Skipped without the reference checkout.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler, batch_arrays
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.models.interpreter import Interpreter, question_type_of
from dfol_vqa_tpu.types import QuestionType

from tests.conftest import requires_reference
from tests.helpers import op, question, static_world

O_PAD = 5
TOKENS = ["car", "dog", "person", "ball", "red", "blue", "large", "small", "metal"]
RELS = ["holding", "to the left of", "on"]


def build_tables(ontology, rng, counts):
    """Random per-question static oracle tables over a fixed token set."""
    B = len(counts)
    attr_tables, rel_tables = [], []
    for b in range(B):
        at = {}
        for t in TOKENS + ontology.query("color") + ontology.query("material"):
            p = rng.uniform(0.05, 0.95, O_PAD).astype(np.float32)
            at[t] = np.log(p)
        rt = {}
        for r in RELS:
            p = rng.uniform(0.05, 0.95, (O_PAD, O_PAD)).astype(np.float32)
            rt[r] = np.log(p)
        attr_tables.append(at)
        rel_tables.append(rt)
    return attr_tables, rel_tables


def run_reference(ontology_paths, questions, attr_tables, rel_tables, counts):
    import sys, torch

    sys.path.insert(0, "/root/reference/src")
    from nsvqa.nn.vision.base_oracle import StaticOracle
    from nsvqa.nn.interpreter.batch_gqa_ops import GQAOntology as RefOntology
    from nsvqa.nn.interpreter.batch_gqa_interpreter import BatchGQAInterpreter
    from nsvqa.nn.interpreter.batch_base_types import BatchWorld
    from nsvqa.data.data_pipeline import ProgramCollaterBase

    class FixedStaticOracle(StaticOracle):
        # upstream StaticOracle signature predates normalized_probability
        def _compute_attribute_log_likelihood(self, device, attribute_list, object_features,
                                              meta_data, object_num, attribute_image_map,
                                              object_image_map, default_log_likelihood=-30,
                                              normalized_probability=True):
            return self._extract_entries(attribute_list, object_features)

        def _compute_relation_log_likelihood(self, device, relation_list, pair_object_features,
                                             meta_data, object_num, relation_image_map,
                                             object_image_map, default_log_likelihood=-30,
                                             normalized_probability=True):
            return self._extract_entries(relation_list, pair_object_features)

    meta = "/root/reference/src/nsvqa/data/metadata"
    ref_ont = RefOntology(
        meta + "/gqa_all_attribute.json",
        meta + "/gqa_all_class.json",
        meta + "/gqa_vocab.json",
        None,
        relation_json_path=meta + "/gqa_relation.json",
    )
    oracle = FixedStaticOracle(ref_ont)
    interp = BatchGQAInterpreter("m", oracle, ref_ont, featurizer=None, cached=False)

    # ragged static tables
    B, total = len(counts), sum(counts)
    offsets = np.cumsum([0] + counts[:-1])
    all_attr_tokens = sorted({t for tab in attr_tables for t in tab})
    attr_ll = np.full((len(all_attr_tokens), total), -30.0, np.float32)
    for ti, t in enumerate(all_attr_tokens):
        for b in range(B):
            if t in attr_tables[b]:
                attr_ll[ti, offsets[b] : offsets[b] + counts[b]] = attr_tables[b][t][: counts[b]]
    all_rel_tokens = sorted({t for tab in rel_tables for t in tab})
    rel_ll = np.full((len(all_rel_tokens), total, total), -30.0, np.float32)
    for ti, t in enumerate(all_rel_tokens):
        for b in range(B):
            if t in rel_tables[b]:
                o0 = offsets[b]
                rel_ll[ti, o0 : o0 + counts[b], o0 : o0 + counts[b]] = rel_tables[b][t][
                    : counts[b], : counts[b]
                ]

    attr_features = {
        "index": {t: i for i, t in enumerate(all_attr_tokens)},
        "log_likelihood": torch.tensor(attr_ll),
    }
    rel_features = {
        "index": {t: i for i, t in enumerate(all_rel_tokens)},
        "log_likelihood": torch.tensor(rel_ll),
    }
    batch_index = np.concatenate([[b] * n for b, n in enumerate(counts)]).tolist()

    def build_scene(device, object_features, bi, meta_data):
        return BatchWorld(torch.device("cpu"), total, attr_features, rel_features, batch_index)

    interp.build_scene = build_scene

    qs = [dict(q, original_dict=None) for q in questions]
    collater = ProgramCollaterBase("select", "relate", "filter", split_num=1)
    pbs = collater.collate(qs)
    for pb in pbs:
        pb.create_sparse_tensors()
        pb._device = torch.device("cpu")
    with torch.no_grad():
        result = interp(pbs, False)
    return result


def run_ours(ontology, questions, attr_tables, rel_tables, counts):
    cfg = Config(normalize_oracle=False, likelihood_threshold=0.0)
    cfg.tpu.max_object_num = O_PAD
    interp = Interpreter(cfg, ontology)
    compiler = ProgramCompiler(ontology, object_num=O_PAD, rel_slots=4)
    spec, batch = compiler.compile(questions)
    world = static_world(
        ontology, attr_tables, rel_tables, counts, O=O_PAD, rel_tokens=batch.rel_tokens
    )
    arrays = {k: jnp.asarray(v) for k, v in batch_arrays(batch).items()}
    out = interp.execute(None, world, arrays, spec, is_training=False)
    return spec, batch, out


CASES = {
    "exist": [
        question([[op("select", "car"), op("filter", "red")]], op("exist"), "yes"),
        question([[op("select", "dog")]], op("exist"), "no"),
        question(
            [[op("select", "ball"), op("relate", "holding", True, "person"), op("filter", "large")]],
            op("exist"),
            "yes",
        ),
    ],
    "exist_deep": [
        # 5-hop chain: two relates with interleaved filters
        question(
            [[op("select", "person"), op("filter", "small"),
              op("relate", "holding", True, "ball"), op("filter", "red"),
              op("relate", "on", False, "dog")]],
            op("exist"), "yes",
        ),
        # different alignment shape in the same batch: consecutive filters
        question(
            [[op("select", "car"), op("filter", "red"), op("filter", "large"),
              op("relate", "to the left of", True, "dog")]],
            op("exist"), "no",
        ),
        question([[op("select", "ball")]], op("exist"), "yes"),
    ],
    "exist_negation": [
        question([[op("select", "car"), op("filter", "not(red)")]], op("exist"), "yes"),
        question(
            [[op("select", "person"), op("relate", "not(holding)", True, "ball")]],
            op("exist"), "no",
        ),
        question([[op("select", "dog"), op("filter", "not(large)")]], op("exist"), "yes"),
    ],
    "verify_attrs": [
        question([[op("select", "car")]], op("verify_attrs", ["red", "large"]), "yes"),
        question([[op("select", "dog")]], op("verify_attrs", ["small"]), "no"),
    ],
    "verify_rel": [
        question([[op("select", "ball")]], op("verify_rel", "holding", True, "person"), "yes"),
        question([[op("select", "car")]], op("verify_rel", "on", False, "dog"), "no"),
    ],
    "query_attr": [
        question([[op("select", "car")]], op("query_attr", "color"), "red"),
        question([[op("select", "dog"), op("filter", "large")]], op("query_attr", "color"), "blue"),
    ],
    "query_attr_name": [
        question([[op("select", "car")]], op("query_attr", "material"), "metal"),
    ],
    "choose_attr": [
        question([[op("select", "car")]], op("choose_attr", ["red", "blue"]), "red"),
        question([[op("select", "ball")]], op("choose_attr", ["large", "small"]), "small"),
    ],
    "choose_rel": [
        question(
            [[op("select", "ball")]],
            op("choose_rel", ["to the left of", "on"], True, "person"),
            "on",
        ),
        question(
            [[op("select", "dog")]],
            op("choose_rel", ["holding", "on"], False, "_"),  # blank aux select
            "holding",
        ),
    ],
    "and": [
        question(
            [[op("select", "car"), op("filter", "red")], [op("select", "dog")]],
            op("and"),
            "yes",
        ),
    ],
    "or": [
        question(
            [[op("select", "car")], [op("select", "ball"), op("filter", "large")]],
            op("or"),
            "no",
        ),
    ],
    "all_same": [
        question([[op("select", "car")]], op("all_same", "color"), "yes"),
    ],
    "all_different": [
        question([[op("select", "dog")]], op("all_different", "color"), "no"),
    ],
    "two_same": [
        question(
            [[op("select", "car")], [op("select", "dog")]], op("two_same", "color"), "yes"
        ),
    ],
    "two_different": [
        question(
            [[op("select", "car")], [op("select", "ball")]],
            op("two_different", "color"),
            "no",
        ),
    ],
    "compare": [
        question(
            [[op("select", "car")], [op("select", "dog")]],
            op("compare", "large", False),
            "car",
        ),
        question(
            [[op("select", "person")], [op("select", "ball")]],
            op("compare", "small", True),
            "ball",
        ),
    ],
}


@requires_reference
@pytest.mark.parametrize("case", sorted(CASES.keys()))
def test_terminal_parity(ontology, case):
    rng = np.random.default_rng(hash(case) % 2**31)
    questions = CASES[case]
    counts = [int(rng.integers(2, O_PAD + 1)) for _ in questions]
    attr_tables, rel_tables = build_tables(ontology, rng, counts)

    ref = run_reference(None, questions, attr_tables, rel_tables, counts)
    spec, batch, ours = run_ours(ontology, questions, attr_tables, rel_tables, counts)

    ref_lp = ref["log_probability"].detach().numpy().flatten()
    qtype = question_type_of(spec.terminal_op)
    lp = np.asarray(ours["log_probability"])

    if qtype == QuestionType.QUERY:
        # reference flattens per-question option lists; ours is (B, K) padded
        flat = []
        for qi in range(len(questions)):
            k = len(batch.option_strings[qi])
            flat.extend(lp[qi, :k])
        np.testing.assert_allclose(np.array(flat), ref_lp, rtol=2e-3, atol=1e-4)
        # answers match (tie sets)
        flags = np.asarray(ours["answer_flags"])
        for qi in range(len(questions)):
            k = len(batch.option_strings[qi])
            mine = [batch.option_strings[qi][j] for j in range(k) if flags[qi, j]]
            theirs = [str(x) for x in ref["answer"][qi]]
            assert mine == theirs, (case, qi, mine, theirs)
    else:
        np.testing.assert_allclose(lp, ref_lp, rtol=2e-3, atol=1e-4)
        flags = np.asarray(ours["answer_flags"])[:, 0]
        for qi in range(len(questions)):
            mine = "yes" if flags[qi] else "no"
            assert mine == str(ref["answer"][qi][0]), (case, qi)
