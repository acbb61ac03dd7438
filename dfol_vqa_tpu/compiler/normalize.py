"""English singularization for GQA token normalisation.

The reference delegates to the `pattern` NLP library with exception lists
(src/nsvqa/nn/parser/parse_utils.py:9-20). We implement a self-contained
rule-based singularizer covering the GQA vocabulary (all tokens are short
noun phrases), with the same plurale-tantum / irregular exception lists as
data plus standard English inflection rules.
"""

from __future__ import annotations

# parse_utils.py:10-12 (data lists, kept verbatim for behavioural parity)
PLURALE_TANTUM = {
    "this", "yes", "pants", "shorts", "glasses", "scissors", "panties", "trousers",
    "binoculars", "pliers", "tongs", "tweezers", "forceps", "goggles", "jeans",
    "tights", "leggings", "chaps", "boxers", "indoors", "outdoors", "bus", "octapus",
    "waitress", "pasta", "pita", "glass", "asparagus", "hummus", "dress", "cafeteria",
    "grass", "class",
}

# parse_utils.py:14
IRREGULARS = {
    "shelves": "shelf",
    "bookshelves": "bookshelf",
    "olives": "olive",
    "brownies": "brownie",
    "cookies": "cookie",
}

# standard irregular English plurals
_IRREGULAR_NOUNS = {
    "men": "man", "women": "woman", "children": "child", "people": "person",
    "feet": "foot", "teeth": "tooth", "geese": "goose", "mice": "mouse",
    "oxen": "ox", "knives": "knife", "wives": "wife", "lives": "life",
    "loaves": "loaf", "leaves": "leaf", "halves": "half", "calves": "calf",
    "scarves": "scarf", "wolves": "wolf", "elves": "elf", "hooves": "hoof",
}

_KEEP_IES = {"species", "series"}


def singularize_word(word: str) -> str:
    w = word
    if not w or len(w) < 3:
        return w
    if w in _IRREGULAR_NOUNS:
        return _IRREGULAR_NOUNS[w]
    if w in _KEEP_IES:
        return w
    if w.endswith("ies") and len(w) > 4 and w[-4] not in "aeiou":
        return w[:-3] + "y"
    if w.endswith(("ches", "shes", "xes", "zes", "sses")):
        return w[:-2]
    if w.endswith("oes") and len(w) > 4:
        return w[:-2]
    if w.endswith("ses") and len(w) > 4:
        return w[:-2]
    if w.endswith("s") and not w.endswith(("ss", "us", "is")):
        return w[:-1]
    return w


def normalize(string: str) -> str:
    """parse_utils.py:9-20: lowercase/strip, exception lists, singularize the
    phrase (last-word rules decide; `pattern.singularize` also only inflects
    the final token of a phrase)."""
    temp = string.strip().lower()
    if temp in IRREGULARS:
        return IRREGULARS[temp]
    last = temp.split(" ")[-1]
    if last in PLURALE_TANTUM or temp[-2:] == "ss":
        return temp
    words = temp.split(" ")
    words[-1] = singularize_word(words[-1])
    return " ".join(words)
