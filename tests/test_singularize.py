"""Singularizer parity with `pattern.text.en.singularize` (round-1 gap #1).

`pattern` cannot be installed here (zero egress), so parity is pinned three
ways against EXTERNAL ground truth instead of circularly against ourselves:

1. **Vocabulary fingerprints.** The reference's own ``gqa_vocab.json``
   contains pattern-mangled canonical forms — ``tenni``, ``cactu``,
   ``octopu``, ``deliciou``, ``curiou``, ``adida`` — which can only be
   produced by pattern's terminal ``([^s])s$`` strip. A singularizer that
   "fixes" these assigns DIFFERENT token codes than the reference.
2. **Idempotence over the full 2,335-token vocabulary**, module the known
   pattern-faithful mangles (explicit whitelist below).
3. **A frozen golden table** (tests/golden_singularize.json: every vocab
   token + its regular plural -> expected output) so future edits to
   normalize.py cannot drift silently.

Reference: src/nsvqa/nn/parser/parse_utils.py:9-20 and CLiPS
pattern/text/en/inflect.py (transcribed in compiler/normalize.py).
"""

import json
import os

import pytest

from dfol_vqa_tpu.compiler.normalize import normalize, PLURALE_TANTUM

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_singularize.json")

# canonical vocab entries that pattern itself mangles when normalized again;
# the REFERENCE has identical behaviour (the forms below are what
# pattern.singularize returns), so these are parity, not bugs
PATTERN_FAITHFUL_MANGLES = {
    "delicious": "deliciou",
    "curious": "curiou",
    "adidas": "adida",
    "christmas": "christma",
    "pizza slice": "pizza slouse",  # pattern's ([m|l])ice$ rule
    "wius": "wiu",
    "playing wius": "playing wiu",
}


# vocab fingerprints of pattern's exact rule cascade: raw GQA surface form
# -> the canonical token the reference vocabulary actually contains
FINGERPRINTS = {
    "tennis": "tenni",
    "cactus": "cactu",
    "octopus": "octopu",
    "delicious": "deliciou",
    "curious": "curiou",
    "adidas": "adida",
    "shoes": "shoe",
    "potatoes": "potato",
    "knives": "knife",
    "wives": "wife",
    "lives": "life",
    "leaves": "leaf",
    "wolves": "wolf",
    "scarves": "scarf",
    "calves": "calf",
    "halves": "half",
    "caves": "cave",
    "stoves": "stove",
    "waves": "wave",
    "horses": "horse",
    "houses": "house",
    "vases": "vase",
    "cherries": "cherry",
    "daisies": "daisy",
    "men": "man",
    "women": "woman",
    "children": "child",
    "people": "person",
    "teeth": "tooth",
    "feet": "foot",
    "geese": "goose",
    "smoothies": "smoothie",
    "movies": "movie",
    "buses": "bus",
    "glasses": "glasses",  # plurale tantum
    "shelves": "shelf",  # parse_utils irregulars
    "bookshelves": "bookshelf",
    "cookies": "cookie",
    "brownies": "brownie",
    "olives": "olive",
    "skis": "ski",
    "taxis": "taxi",
    "benches": "bench",
    "boxes": "box",
    "sandwiches": "sandwich",
    "dresses": "dress",
    "graffiti": "graffiti",
    "news": "news",
    "pants": "pants",
    "scissors": "scissors",
    "asparagus": "asparagus",
    "red bus": "red bus",  # plurale tantum checks the LAST word
}


def test_vocab_fingerprints():
    for surface, canonical in FINGERPRINTS.items():
        assert normalize(surface) == canonical, (
            f"{surface!r}: got {normalize(surface)!r}, reference vocab pins "
            f"{canonical!r}"
        )


def test_idempotent_over_full_vocab(ontology):
    """Every canonical vocab token must re-normalize to itself, except the
    tokens pattern itself mangles (kept mangled for reference parity)."""
    toks = list(ontology._arg_to_idx.keys())
    assert len(toks) == 2335
    bad = {}
    for t in toks:
        n = normalize(t)
        if n != t and PATTERN_FAITHFUL_MANGLES.get(t) != n:
            bad[t] = n
    assert not bad, f"unexpected non-idempotent tokens: {bad}"


def test_golden_table():
    """Frozen behaviour over all vocab tokens + their regular plurals."""
    with open(GOLDEN) as f:
        golden = json.load(f)
    assert len(golden) > 3900
    diffs = {
        s: (normalize(s), want)
        for s, want in golden.items()
        if normalize(s) != want
    }
    assert not diffs, f"{len(diffs)} diffs vs golden table: {dict(list(diffs.items())[:10])}"


def test_inverse_pluralization_coverage(ontology):
    """normalize(regular_plural(token)) == token for vocab nouns, excluding
    (a) plurale-tantum protections and (b) documented pattern warts."""
    VOWELS = "aeiou"

    def pluralize(w):
        if w.endswith(("s", "x", "z", "ch", "sh")):
            return w + "es"
        if w.endswith("y") and len(w) > 1 and w[-2] not in VOWELS:
            return w[:-1] + "ies"
        if w.endswith("o") and len(w) > 1 and w[-2] not in VOWELS:
            return w + "es"
        return w + "s"

    # pattern-faithful warts on plural surfaces (the reference mangles these
    # identically; lookups miss there too) + non-noun tokens whose "+s" form
    # collides with exception lists
    WARTS = {
        "shorts", "news", "shes", "hes", "graffitis", "lows", "pliers",
        "tights", "bies", "canoes", "loaves", "mustaches", "outdoors",
    }
    toks = [
        t for t in ontology._arg_to_idx.keys()
        if " " not in t and not t.endswith("s") and t not in PLURALE_TANTUM
    ]
    fails = {}
    n = 0
    for t in toks:
        p = pluralize(t)
        if p in WARTS or p.split(" ")[-1] in PLURALE_TANTUM:
            continue
        n += 1
        got = normalize(p)
        if got != t:
            fails[p] = (got, t)
    assert n > 1600
    assert not fails, f"{len(fails)} plural->singular failures: {dict(list(fails.items())[:10])}"
