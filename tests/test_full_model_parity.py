"""Full neural-pipeline parity: our oracle+executor vs the reference
featurizer + ClassifierOracle (cached mode) + interpreter, with IDENTICAL
weights. This is the end-to-end accuracy-parity check the north-star asks
for: same scenes, same programs, same parameters -> matching answer
log-probabilities and answer sets, including the oracle's per-option
cluster normalisation (normalize_oracle=True)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dfol_vqa_tpu.compiler.program_compiler import ProgramCompiler, batch_arrays
from dfol_vqa_tpu.config import Config
from dfol_vqa_tpu.models.interpreter import Interpreter, question_type_of
from dfol_vqa_tpu.types import QuestionType

from tests.conftest import requires_reference
from tests.helpers import op, question

BOX_DIM = 48
ORACLE_DIM = 24
EMB_DIM = 16
O_PAD = 6
COUNTS = [3, 5, 4]


def tiny_cfg():
    cfg = Config(
        box_features_dim=BOX_DIM,
        oracle_input_dim=ORACLE_DIM,
        word_embedding_dim=EMB_DIM,
        featurizer_layers_config=[],
        attribute_network_layers_config=[20],
        relation_network_layers_config=[20],
        dropout=0.0,
        normalize_oracle=True,
        likelihood_threshold=0.0,
    )
    cfg.tpu.max_object_num = O_PAD
    return cfg


def make_scene(rng, counts):
    B = len(counts)
    objs = np.zeros((B, O_PAD, BOX_DIM + 6), np.float32)
    mask = np.zeros((B, O_PAD), np.float32)
    for b, n in enumerate(counts):
        objs[b, :n, :BOX_DIM] = rng.standard_normal((n, BOX_DIM)).astype(np.float32)
        objs[b, :n, BOX_DIM] = 640
        objs[b, :n, BOX_DIM + 1] = 480
        objs[b, :n, BOX_DIM + 2] = rng.uniform(0, 600, n)
        objs[b, :n, BOX_DIM + 3] = rng.uniform(0, 440, n)
        objs[b, :n, BOX_DIM + 4] = rng.uniform(5, 40, n)
        objs[b, :n, BOX_DIM + 5] = rng.uniform(5, 40, n)
        mask[b, :n] = 1.0
    return objs, mask


def to_torch_mlp(torch, nn_t, p, final):
    layers = []
    for i, lp in enumerate(p["layers"]):
        lin = nn_t.Linear(lp["w"].shape[0], lp["w"].shape[1])
        lin.weight.data = torch.tensor(np.asarray(lp["w"]).T)
        lin.bias.data = torch.tensor(np.asarray(lp["b"]))
        layers.append(lin)
        if i < len(p["layers"]) - 1:
            layers.append(nn_t.ELU())
    layers.append(final)
    return nn_t.Sequential(*layers)


def run_reference(params, questions, objs, mask, counts, hard_mode=False):
    import sys, torch
    import torch.nn as nn_t

    sys.path.insert(0, "/root/reference/src")
    from nsvqa.nn.vision.classifier_oracle import ClassifierOracle
    from nsvqa.nn.interpreter.batch_gqa_ops import GQAOntology as RefOntology
    from nsvqa.nn.interpreter.batch_gqa_interpreter import BatchGQAInterpreter
    from nsvqa.data.batch_gqa_boxfeatures_pipeline import BatchGQABoxFeaturizer
    from nsvqa.data.data_pipeline import ProgramCollaterBase

    meta = "/root/reference/src/nsvqa/data/metadata"
    ont = RefOntology(
        meta + "/gqa_all_attribute.json", meta + "/gqa_all_class.json",
        meta + "/gqa_vocab.json", None, relation_json_path=meta + "/gqa_relation.json",
    )

    featurizer_net = to_torch_mlp(torch, nn_t, params["featurizer"], nn_t.Sigmoid())
    attr_net = to_torch_mlp(torch, nn_t, params["attribute_network"], nn_t.Sigmoid())
    rel_net = to_torch_mlp(torch, nn_t, params["relation_network"], nn_t.Sigmoid())
    emb_lin = nn_t.Linear(EMB_DIM, 2335)
    emb_lin.weight.data = torch.tensor(np.asarray(params["embedding"]["w"]).T)
    emb_lin.bias.data = torch.tensor(np.asarray(params["embedding"]["b"]))
    emb = nn_t.Sequential(emb_lin, nn_t.LogSigmoid())

    featurizer = BatchGQABoxFeaturizer(featurizer_network=featurizer_net)
    oracle = ClassifierOracle(ont, attr_net, rel_net, emb, normalize=True, cached=True)
    interp = BatchGQAInterpreter("m", oracle, ont, featurizer, cached=True,
                                 hard_mode=hard_mode)
    interp.eval()

    # ragged object features
    rows = []
    batch_index = []
    for b, n in enumerate(counts):
        rows.append(objs[b, :n])
        batch_index.extend([b] * n)
    obj_t = torch.tensor(np.concatenate(rows, 0))

    qs = [dict(q, original_dict=None) for q in questions]
    collater = ProgramCollaterBase("select", "relate", "filter", split_num=1)
    pbs = collater.collate(qs)
    for pb in pbs:
        pb.create_sparse_tensors()
        pb._object_features = obj_t
        pb._object_batch_index = torch.tensor(np.asarray(batch_index, np.int64))
        pb._device = torch.device("cpu")
        pb._meta_data = {}
    with torch.no_grad():
        return interp(pbs, False)


def run_ours(ontology, params, questions, objs, mask, hard_mode=False):
    cfg = tiny_cfg()
    cfg.hard_mode = hard_mode
    interp = Interpreter(cfg, ontology)
    compiler = ProgramCompiler(ontology, object_num=O_PAD, rel_slots=4)
    spec, cb = compiler.compile(questions)
    arrays = {k: jnp.asarray(v) for k, v in batch_arrays(cb).items()}
    out = interp.forward(
        params, jnp.asarray(objs), jnp.asarray(mask), arrays, spec, False, None
    )
    return spec, cb, out


CASES = {
    "exist_relate": [
        question([[op("select", "car"), op("filter", "red")]], op("exist"), "yes"),
        question(
            [[op("select", "person"), op("relate", "holding", False, "ball")]],
            op("exist"), "no",
        ),
        question([[op("select", "dog"), op("filter", "large"), op("filter", "black")]],
                 op("exist"), "yes"),
    ],
    "query_color": [
        question([[op("select", "car")]], op("query_attr", "color"), "red"),
        question([[op("select", "chair")]], op("query_attr", "material"), "wood"),
        question([[op("select", "horse")]], op("query_attr", "color"), "brown"),
    ],
    "verify_rel": [
        question([[op("select", "cat")]], op("verify_rel", "on", True, "table"), "yes"),
        question([[op("select", "man")]], op("verify_rel", "wearing", False, "hat"), "no"),
        question([[op("select", "cup")]], op("verify_rel", "on", False, "table"), "yes"),
    ],
    "choose_attr": [
        question([[op("select", "car")]], op("choose_attr", ["red", "blue"]), "red"),
        question([[op("select", "dog")]], op("choose_attr", ["small", "large"]), "small"),
        question([[op("select", "cat")]], op("choose_attr", ["white", "black"]), "white"),
    ],
    "choose_rel": [
        question([[op("select", "ball")]],
                 op("choose_rel", ["to the left of", "to the right of"], True, "person"),
                 "to the left of"),
        question([[op("select", "cup")]],
                 op("choose_rel", ["on", "under"], False, "table"), "on"),
        question([[op("select", "dog")]],
                 op("choose_rel", ["behind", "in front of"], True, "car"), "behind"),
    ],
}


@requires_reference
@pytest.mark.parametrize("case", sorted(CASES.keys()))
def test_full_model_parity(ontology, case):
    rng = np.random.default_rng(hash(case) % 2**31)
    cfg = tiny_cfg()
    interp = Interpreter(cfg, ontology)
    params = interp.init_params(jax.random.PRNGKey(17))
    questions = CASES[case]
    objs, mask = make_scene(rng, COUNTS)

    ref = run_reference(params, questions, objs, mask, COUNTS)
    spec, cb, ours = run_ours(ontology, params, questions, objs, mask)

    ref_lp = ref["log_probability"].detach().numpy().flatten()
    lp = np.asarray(ours["log_probability"])
    qtype = question_type_of(spec.terminal_op)

    if qtype == QuestionType.QUERY:
        flat = []
        for qi in range(len(questions)):
            flat.extend(lp[qi, : len(cb.option_strings[qi])])
        np.testing.assert_allclose(np.array(flat), ref_lp, rtol=1e-3, atol=1e-4)
        flags = np.asarray(ours["answer_flags"])
        for qi in range(len(questions)):
            k = len(cb.option_strings[qi])
            mine = [cb.option_strings[qi][j] for j in range(k) if flags[qi, j]]
            assert mine == [str(x) for x in ref["answer"][qi]], (case, qi)
    else:
        np.testing.assert_allclose(lp, ref_lp, rtol=1e-3, atol=1e-4)
        flags = np.asarray(ours["answer_flags"])[:, 0]
        for qi in range(len(questions)):
            assert ("yes" if flags[qi] else "no") == str(ref["answer"][qi][0]), (case, qi)
