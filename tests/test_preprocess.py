"""Preprocessor / normalizer / verifier tests, incl. structural parity with
the reference preprocessor (its `pattern` dependency monkeypatched with our
singularizer, so the comparison validates the structural transforms:
op_map renaming, verify fusion, de-branching, logical-tail rewrites)."""

import json
import sys
import types

import numpy as np
import pytest

from dfol_vqa_tpu.compiler.normalize import normalize, singularize_word
from dfol_vqa_tpu.compiler.preprocess import GQAPreprocessor
from dfol_vqa_tpu.compiler.verifier import GQAProgramVerifier, ParserError

from tests.conftest import requires_reference
from tests.helpers import op, question


def test_normalize_basic():
    assert normalize("Cars") == "car"
    assert normalize("glasses") == "glasses"  # plurale tantum
    assert normalize("shelves") == "shelf"  # irregular list
    assert normalize("dress") == "dress"  # -ss
    assert normalize("  Red  ") == "red"
    assert normalize("teddy bears") == "teddy bear"
    assert singularize_word("boxes") == "box"
    assert singularize_word("ponies") == "pony"
    assert singularize_word("knives") == "knife"
    assert singularize_word("children") == "child"


# GQA-style semantic annotations
SEMANTIC_CASES = {
    "exist_chain": {
        "semantic": [
            {"operation": "select", "argument": "car (123)", "dependencies": []},
            {"operation": "filter color", "argument": "red", "dependencies": [0]},
            {"operation": "exist", "argument": "?", "dependencies": [1]},
        ],
        "answer": "yes",
        "imageId": "img1",
    },
    "relate_verify": {
        "semantic": [
            {"operation": "select", "argument": "person (5)", "dependencies": []},
            {"operation": "relate", "argument": "ball,holding,o (7)", "dependencies": [0]},
            {"operation": "query", "argument": "color", "dependencies": [1]},
        ],
        "answer": "red",
        "imageId": "img2",
    },
    "verify_and_fusion": {
        "semantic": [
            {"operation": "select", "argument": "car (1)", "dependencies": []},
            {"operation": "verify color", "argument": "red", "dependencies": [0]},
            {"operation": "verify size", "argument": "large", "dependencies": [0]},
            {"operation": "and", "argument": "", "dependencies": [1, 2]},
        ],
        "answer": "no",
        "imageId": "img3",
    },
    "two_branch_and": {
        "semantic": [
            {"operation": "select", "argument": "dog (2)", "dependencies": []},
            {"operation": "exist", "argument": "?", "dependencies": [0]},
            {"operation": "select", "argument": "cat (3)", "dependencies": []},
            {"operation": "exist", "argument": "?", "dependencies": [2]},
            {"operation": "and", "argument": "", "dependencies": [1, 3]},
        ],
        "answer": "yes",
        "imageId": "img4",
    },
    "choose_rel": {
        "semantic": [
            {"operation": "select", "argument": "ball (9)", "dependencies": []},
            {"operation": "choose rel", "argument": "person,to the left of|to the right of,s (-)",
             "dependencies": [0]},
        ],
        "answer": "to the left of",
        "imageId": "img5",
    },
}


@pytest.fixture(scope="module")
def preprocessor(ontology):
    return GQAPreprocessor(ontology._op_map, True)


def test_exist_chain(preprocessor):
    q = preprocessor.parse_question(SEMANTIC_CASES["exist_chain"])
    prog = q["program"]
    assert prog["last_op"] == {"operator": "exist", "arguments": []}
    assert [o["operator"] for o in prog["branches"][0]] == ["select", "filter"]
    assert prog["branches"][0][0]["arguments"] == ["car"]
    assert prog["branches"][0][1]["arguments"] == ["red"]


def test_relate_query(preprocessor):
    q = preprocessor.parse_question(SEMANTIC_CASES["relate_verify"])
    prog = q["program"]
    assert prog["last_op"]["operator"] == "query_attr"
    rel = prog["branches"][0][1]
    assert rel["operator"] == "relate"
    assert rel["arguments"] == ["holding", False, "ball"]


def test_verify_and_fusion(preprocessor):
    q = preprocessor.parse_question(SEMANTIC_CASES["verify_and_fusion"])
    prog = q["program"]
    assert prog["last_op"]["operator"] == "verify_attrs"
    assert prog["last_op"]["arguments"] == [["red", "large"]]
    assert len(prog["branches"]) == 1


def test_two_branch_and_drops_exist_tails(preprocessor):
    q = preprocessor.parse_question(SEMANTIC_CASES["two_branch_and"])
    prog = q["program"]
    assert prog["last_op"]["operator"] == "and"
    assert len(prog["branches"]) == 2
    for b in prog["branches"]:
        assert [o["operator"] for o in b] == ["select"]


def test_discard_global(preprocessor):
    q = {
        "semantic": [{"operation": "select", "argument": "scene", "dependencies": []},
                     {"operation": "exist", "argument": "?", "dependencies": [0]}],
        "answer": "yes", "imageId": "i",
    }
    assert preprocessor.parse_question(q, discard_global=True) is None


def test_preprocess_files_segregate(preprocessor, tmp_path):
    data = {f"q{i}": dict(SEMANTIC_CASES["exist_chain"]) for i in range(3)}
    data["qq"] = dict(SEMANTIC_CASES["relate_verify"])
    in_file = tmp_path / "in.json"
    in_file.write_text(json.dumps(data))
    out = tmp_path / "out.json"
    preprocessor.preprocess(str(in_file), str(out), segregate=True)
    exist_file = tmp_path / "out_exist.json"
    query_file = tmp_path / "out_query_attr.json"
    assert exist_file.exists() and query_file.exists()
    lines = exist_file.read_text().strip().split("\n")
    assert len(lines) == 3
    assert json.loads(lines[0])["question_id"] == "q0"


@requires_reference
@pytest.mark.parametrize("case", sorted(SEMANTIC_CASES.keys()))
def test_structural_parity_with_reference_preprocessor(preprocessor, case):
    # stub the `pattern` dependency with our singularizer before importing
    # the reference preprocessor
    pattern_mod = types.ModuleType("pattern")
    text_mod = types.ModuleType("pattern.text")
    en_mod = types.ModuleType("pattern.text.en")
    en_mod.singularize = singularize_word
    pattern_mod.text = text_mod
    text_mod.en = en_mod
    sys.modules.setdefault("pattern", pattern_mod)
    sys.modules.setdefault("pattern.text", text_mod)
    sys.modules.setdefault("pattern.text.en", en_mod)
    sys.path.insert(0, "/root/reference/src")
    import importlib

    ref_pre_mod = importlib.import_module("gqa_preprocess")
    ref = ref_pre_mod.GQAPreprocessor(
        "/root/reference/src/nsvqa/data/metadata/op_map.json", True
    )

    q_ref = ref.parse_question(dict(SEMANTIC_CASES[case]), False)
    q_ours = preprocessor.parse_question(dict(SEMANTIC_CASES[case]))
    # json roundtrip normalises the reference's tuples to lists
    ref_prog = json.loads(json.dumps(q_ref["program"]))
    ours_prog = json.loads(json.dumps(q_ours["program"]))
    assert ours_prog == ref_prog, (ours_prog, ref_prog)
    assert q_ours["answer"] == q_ref["answer"]


def test_verifier_accepts_valid_and_rejects_invalid(ontology):
    v = GQAProgramVerifier(ontology)
    good = question([[op("select", "car"), op("filter", "red")]], op("exist"))
    assert v.verify(good["program"])

    bad_terminal = question([[op("select", "car")]], op("filter", "red"))
    with pytest.raises(ParserError):
        v.verify(bad_terminal["program"])

    bad_vocab = question([[op("select", "car"), op("filter", "xyzzy123")]], op("exist"))
    with pytest.raises(ParserError):
        v.verify(bad_vocab["program"])

    bad_branches = question([[op("select", "car")]], op("and"))
    with pytest.raises(ParserError):
        v.verify(bad_branches["program"])

    bad_first = question([[op("filter", "red")]], op("exist"))
    with pytest.raises(ParserError):
        v.verify(bad_first["program"])
