"""Ontology codec/taxonomy tests, incl. parity with the reference JSONs."""

import numpy as np
import pytest

from tests.conftest import requires_reference, REFERENCE_ROOT


def test_codecs_roundtrip(ontology):
    assert ontology.num_tokens == 2335
    assert ontology.num_ops == 16
    code = ontology.encode_token("red")
    assert code > 0
    assert ontology.decode_token(code) == "red"
    neg = ontology.encode_token("not(red)")
    assert neg == -code
    assert ontology.decode_token(neg) == "not(red)"
    assert ontology.decode_op(ontology.encode_op("exist")) == "exist"


def test_taxonomy(ontology):
    colors = ontology.query("color")
    assert "red" in colors and len(colors) >= 10
    assert ontology.query("red") == ["red"]
    assert ontology.query(None) == [None]
    assert len(ontology.query("entity")) == len(ontology._nouns)
    assert ontology.is_relation("holding") or len(ontology._relations) == 334


def test_index_partitions(ontology):
    # 334 unique relations, of which those present in the 2,335-token arg
    # vocabulary form the relation partition (the reference filters the same
    # way, batch_gqa_ops.py:59) — 333 in the shipped metadata.
    n_rel = len(ontology._relation_index)
    assert n_rel in (333, 334)
    assert len(ontology._attribute_index) == 2335 - n_rel
    assert set(ontology._relation_index).isdisjoint(ontology._attribute_index)


def test_embedding_matrix_deterministic(ontology):
    m1 = ontology.embedding_matrix()
    assert m1.shape == (2336, 300)
    assert np.allclose(m1[0], 0.0)  # padding row
    # multi-word token = sum of word embeddings
    idx_to = {a: i for i, a in enumerate(ontology._args)}
    if "to the left of" in idx_to:
        code = ontology.encode_token("to the left of")
        parts = sum(ontology.get_embeddings([w])[0] for w in "to the left of".split())
        np.testing.assert_allclose(m1[code], parts, rtol=1e-5)


@requires_reference
def test_metadata_matches_reference_jsons(ontology):
    import json, os

    meta_dir = os.path.join(REFERENCE_ROOT, "src/nsvqa/data/metadata")
    vocab = json.load(open(os.path.join(meta_dir, "gqa_vocab.json")))
    assert ontology._args == vocab["idx_to_arg"]
    assert ontology._ops == vocab["idx_to_op"]
    for tok, idx in list(vocab["arg_to_idx"].items())[:50]:
        assert ontology.encode_token(tok) == idx


@requires_reference
def test_query_matches_reference(ontology):
    import sys

    sys.path.insert(0, REFERENCE_ROOT + "/src")
    from nsvqa.nn.interpreter.batch_gqa_ops import GQAOntology as RefOntology
    import os

    meta = REFERENCE_ROOT + "/src/nsvqa/data/metadata"
    ref = RefOntology(
        meta + "/gqa_all_attribute.json",
        meta + "/gqa_all_class.json",
        meta + "/gqa_vocab.json",
        None,
        relation_json_path=meta + "/gqa_relation.json",
    )
    for name in ["color", "material", "animal", "furniture", "red", None, "entity"]:
        assert sorted(map(str, ontology.query(name))) == sorted(map(str, ref.query(name)))
    assert ontology._relation_index == ref._relation_index
    assert ontology._attribute_index == ref._attribute_index
    assert ontology._noun_subindex == ref._noun_subindex


def test_glove_file_parsing(ontology, tmp_path):
    """Real GloVe-format file: word lookup, multi-word token sums, and
    missing-word zeros (reference batch_gqa_ops.py:135-148 semantics)."""
    from dfol_vqa_tpu.ontology import GQAOntology

    glove = tmp_path / "glove.txt"
    glove.write_text(
        "the 1.0 2.0 3.0\n"
        "red 0.5 -1.0 0.25\n"
        "car 2.0 0.0 -0.5\n"
        "fire -1.0 1.0 1.0\n"
        "hydrant 0.0 3.0 0.0\n"
    )
    ont = GQAOntology(metadata_path=None, embedding_file=str(glove), embedding_dim=3)
    # single word
    np.testing.assert_allclose(ont.get_embeddings(["red"]), [[0.5, -1.0, 0.25]])
    # multi-word token = sum of word vectors
    np.testing.assert_allclose(ont.get_embeddings(["fire hydrant"]), [[-1.0, 4.0, 1.0]])
    # unknown words contribute zeros
    np.testing.assert_allclose(ont.get_embeddings(["zzz"]), [[0.0, 0.0, 0.0]])
    np.testing.assert_allclose(ont.get_embeddings(["red zzz"]), [[0.5, -1.0, 0.25]])
