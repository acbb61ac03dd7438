"""Calibrator parity vs the reference attention-transfer machinery.

The bi-LSTM modulator is the most intricate cross-pass subsystem (mutable
op_id-keyed dicts upstream vs static scans here); this test loads the SAME
LSTM/output-head weights into both implementations — with a non-trivial
output head so modulations actually move attentions — and requires matching
log-probabilities. Skipped without the reference checkout.
"""

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
from tests.test_full_model_parity import (
    BOX_DIM,
    EMB_DIM,
    O_PAD,
    make_scene,
    to_torch_mlp,
)

STATE_DIM = 10
COUNTS = [3, 5, 4]


def calib_cfg():
    cfg = Config(
        box_features_dim=BOX_DIM,
        oracle_input_dim=24,
        word_embedding_dim=EMB_DIM,
        featurizer_layers_config=[],
        attribute_network_layers_config=[20],
        relation_network_layers_config=[20],
        dropout=0.0,
        normalize_oracle=True,
        activate_attention_transfer=True,
        attention_transfer_state_dim=STATE_DIM,
    )
    cfg.tpu.max_object_num = O_PAD
    return cfg


def randomize_output_head(params, seed=5):
    k = jax.random.PRNGKey(seed)
    params["calibrator"]["out"]["w"] = (
        jax.random.normal(k, params["calibrator"]["out"]["w"].shape) * 0.4
    )
    return params


def run_reference(params, questions, objs, mask, counts, is_training):
    import sys, torch
    import torch.nn as nn_t

    sys.path.insert(0, "/root/reference/src")
    from nsvqa.nn.vision.classifier_oracle import ClassifierOracle
    from nsvqa.nn.interpreter.batch_gqa_ops import GQAOntology as RefOntology
    from nsvqa.nn.interpreter.batch_gqa_interpreter import BatchGQAInterpreter
    from nsvqa.data.batch_gqa_boxfeatures_pipeline import BatchGQABoxFeaturizer
    from nsvqa.data.data_pipeline import ProgramCollaterBase

    meta = "/root/reference/src/nsvqa/data/metadata"
    ref_ont = RefOntology(
        meta + "/gqa_all_attribute.json", meta + "/gqa_all_class.json",
        meta + "/gqa_vocab.json", None, relation_json_path=meta + "/gqa_relation.json",
    )

    featurizer_net = to_torch_mlp(torch, nn_t, params["featurizer"], nn_t.Sigmoid())
    attr_net = to_torch_mlp(torch, nn_t, params["attribute_network"], nn_t.Sigmoid())
    rel_net = to_torch_mlp(torch, nn_t, params["relation_network"], nn_t.Sigmoid())
    emb_lin = nn_t.Linear(EMB_DIM, params["embedding"]["b"].shape[0])
    emb_lin.weight.data = torch.tensor(np.asarray(params["embedding"]["w"]).T)
    emb_lin.bias.data = torch.tensor(np.asarray(params["embedding"]["b"]))
    emb = nn_t.Sequential(emb_lin, nn_t.LogSigmoid())

    c = params["calibrator"]
    in_dim = EMB_DIM + 1 + 17
    fwd = nn_t.LSTMCell(in_dim, STATE_DIM)
    bwd = nn_t.LSTMCell(in_dim, STATE_DIM)
    for cell, p in [(fwd, c["fwd"]), (bwd, c["bwd"])]:
        cell.weight_ih.data = torch.tensor(np.asarray(p["w_ih"]).T)
        cell.weight_hh.data = torch.tensor(np.asarray(p["w_hh"]).T)
        cell.bias_ih.data = torch.tensor(np.asarray(p["b_ih"]))
        cell.bias_hh.data = torch.tensor(np.asarray(p["b_hh"]))
    out_net = nn_t.Sequential(nn_t.Linear(2 * STATE_DIM, 4), nn_t.Sigmoid())
    out_net[0].weight.data = torch.tensor(np.asarray(c["out"]["w"]).T)
    out_net[0].bias.data = torch.tensor(np.asarray(c["out"]["b"]))

    featurizer = BatchGQABoxFeaturizer(featurizer_network=featurizer_net)
    oracle = ClassifierOracle(ref_ont, attr_net, rel_net, emb, normalize=True, cached=True)
    interp = BatchGQAInterpreter(
        "m", oracle, ref_ont, featurizer, cached=True,
        attention_transfer_state_dim=STATE_DIM,
        forward_attention_network=fwd,
        backward_attention_network=bwd,
        attention_output_network=out_net,
    )
    interp.eval()

    # the reference reads GloVe embeddings from meta_data; feed the SAME
    # pseudo-GloVe vectors our ontology generates
    from dfol_vqa_tpu.ontology import GQAOntology as OurOntology

    our_ont = OurOntology(embedding_dim=EMB_DIM)
    all_tokens = sorted(
        {t for q in questions for t in _collect_tokens(ref_ont, q)}
    )
    emb_mat = torch.tensor(our_ont.get_embeddings(all_tokens))
    meta_data = {"index": {t: i for i, t in enumerate(all_tokens)}, "embedding": emb_mat}

    rows, batch_index = [], []
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
        pb._meta_data = meta_data
    with torch.no_grad():
        # replicate the reference TRAINER's modulator rule (trainer.py:108 /
        # data_pipeline.py:171): at eval the modulator is disabled for
        # query/choose terminals — the rule our interpreter applies
        # internally (models/interpreter.py open_terminal)
        open_terminal = questions[0]["program"]["last_op"]["operator"] in (
            "query_attr", "choose_attr", "choose_rel",
        )
        switch = is_training or not open_terminal
        return interp(pbs, is_training, modulator_switch=switch)


def _collect_tokens(ref_ont, q):
    toks = []
    for b in q["program"]["branches"]:
        for o in b:
            for a in o["arguments"]:
                if isinstance(a, str) and a not in ("_", "scene"):
                    toks.append(a)
    for a in q["program"]["last_op"]["arguments"]:
        if isinstance(a, str):
            toks.append(a)
        elif isinstance(a, list):
            toks.extend(x for x in a if isinstance(x, str))
    # category expansions for fan-out ops
    last = q["program"]["last_op"]
    if last["operator"] in ("query_attr", "all_same", "all_different", "two_same", "two_different"):
        toks.extend(x for x in ref_ont.query(last["arguments"][0]) if isinstance(x, str))
    toks.append("entity")
    # the reference strips negations BEFORE its meta_data embedding lookup
    # (transform_attention detect_negations, batch_base_ops.py:440-444), so
    # the base token must be registered alongside the raw "not(x)" form
    toks.extend(t[4:-1] for t in list(toks)
                if t.startswith("not(") and t.endswith(")"))
    return toks


def run_ours(ontology, params, questions, objs, mask, is_training):
    cfg = calib_cfg()
    interp = Interpreter(cfg, ontology)
    compiler = ProgramCompiler(ontology, object_num=O_PAD, rel_slots=4)
    spec, cb = compiler.compile(questions)
    arrays = {k: jnp.asarray(v) for k, v in batch_arrays(cb).items()}
    out = interp.forward(
        params, jnp.asarray(objs), jnp.asarray(mask), arrays, spec, is_training, None
    )
    return spec, cb, out


CASES = {
    "exist_chain": (
        [
            question([[op("select", "car"), op("filter", "red")]], op("exist"), "yes"),
            question(
                [[op("select", "person"), op("relate", "holding", False, "ball"),
                  op("filter", "large")]],
                op("exist"), "no",
            ),
            question([[op("select", "dog")]], op("exist"), "yes"),
        ],
        False,
    ),
    "verify_rel": (
        [
            question([[op("select", "cat"), op("filter", "black")]],
                     op("verify_rel", "on", True, "table"), "yes"),
            question([[op("select", "man")]],
                     op("verify_rel", "wearing", False, "hat"), "no"),
            question([[op("select", "cup")]],
                     op("verify_rel", "on", False, "table"), "yes"),
        ],
        False,
    ),
    "query_attr_train": (
        [
            question([[op("select", "car")]], op("query_attr", "color"), "red"),
            question([[op("select", "chair")]], op("query_attr", "material"), "wood"),
            question([[op("select", "dog"), op("filter", "large")]],
                     op("query_attr", "color"), "brown"),
        ],
        True,  # modulator active for open questions only during training
    ),
    "two_same": (
        [
            question([[op("select", "car")], [op("select", "dog")]],
                     op("two_same", "color"), "yes"),
            question([[op("select", "cat")], [op("select", "chair")]],
                     op("two_same", "material"), "no"),
            question([[op("select", "man")], [op("select", "woman")]],
                     op("two_same", "color"), "yes"),
        ],
        False,
    ),
    "choose_rel_train": (
        [
            question([[op("select", "ball")]],
                     op("choose_rel", ["to the left of", "to the right of"], True, "person"),
                     "to the left of"),
            question([[op("select", "cup")]],
                     op("choose_rel", ["on", "under"], False, "table"), "on"),
            question([[op("select", "dog")]],
                     op("choose_rel", ["behind", "in front of"], True, "car"), "behind"),
        ],
        True,
    ),
}


@requires_reference
@pytest.mark.parametrize(
    "case",
    [
        # choose_rel_train is the heaviest case (relation fan-out + training
        # mode); the quick tier keeps query_attr_train as the modulator-on
        # representative and the cheap eval-mode cases
        pytest.param(c, marks=[pytest.mark.slow] if c == "choose_rel_train" else [])
        for c in sorted(CASES.keys())
    ],
)
def test_calibrator_parity(case):
    from dfol_vqa_tpu.ontology import GQAOntology

    ontology = GQAOntology(embedding_dim=EMB_DIM)
    rng = np.random.default_rng(hash(case) % 2**31)
    questions, is_training = CASES[case]
    cfg = calib_cfg()
    interp = Interpreter(cfg, ontology)
    params = randomize_output_head(interp.init_params(jax.random.PRNGKey(23)))
    objs, mask = make_scene(rng, COUNTS)

    ref = run_reference(params, questions, objs, mask, COUNTS, is_training)
    spec, cb, ours = run_ours(ontology, params, questions, objs, mask, is_training)

    ref_lp = ref["log_probability"].detach().numpy().flatten()
    lp = np.asarray(ours["log_probability"])
    qtype = question_type_of(spec.terminal_op)
    if qtype == QuestionType.QUERY:
        flat = []
        for qi in range(len(questions)):
            flat.extend(lp[qi, : len(cb.option_strings[qi])])
        np.testing.assert_allclose(np.array(flat), ref_lp, rtol=2e-3, atol=2e-4)
    else:
        np.testing.assert_allclose(lp, ref_lp, rtol=2e-3, atol=2e-4)
