"""Planted-signal synthetic world: learnable scenes with ground-truth answers.

Validates the framework's core claim end-to-end — that the visual oracle
learns real concepts from ANSWER-ONLY supervision through the differentiable
logic — without the GQA download. Each scene's objects carry ground-truth
concepts (a noun, attribute flags); box features are a fixed random linear
encoding of those concepts plus noise, and spatial relations derive from
box geometry. Question answers are computed by exact boolean evaluation of
the program against the ground truth, so training accuracy measures genuine
concept learning.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from dfol_vqa_tpu.data.features import FeatureSource
from dfol_vqa_tpu.ontology import GQAOntology


class PlantedWorld(FeatureSource):
    def __init__(
        self,
        ontology: GQAOntology,
        box_dim: int = 2048,
        n_nouns: int = 8,
        n_attrs: int = 6,
        n_images: int = 256,
        min_objects: int = 4,
        max_objects: int = 12,
        noise: float = 0.1,
        seed: int = 0,
    ):
        self.box_dim = box_dim
        rng = np.random.default_rng(seed)
        self._rng = rng
        nouns = [t for t in ontology._nouns if t in ontology._arg_to_idx]
        adjs = [t for t in ontology._adjectives if t in ontology._arg_to_idx]
        self.nouns = list(rng.choice(nouns, n_nouns, replace=False))
        self.attrs = list(rng.choice(adjs, n_attrs, replace=False))
        # left/right spatial relations derived from geometry
        self.relations = ["to the left of", "to the right of"]
        self._codebook = rng.standard_normal((n_nouns + n_attrs, box_dim)).astype(np.float32)
        self._noise = noise

        self._scenes: Dict[str, dict] = {}
        for i in range(n_images):
            img = f"planted_{i}"
            n = int(rng.integers(min_objects, max_objects + 1))
            noun_ids = rng.integers(0, n_nouns, n)
            attr_flags = rng.uniform(size=(n, n_attrs)) < 0.35
            x = rng.uniform(0, 600, n)
            y = rng.uniform(0, 440, n)
            w = rng.uniform(5, 40, n)
            h = rng.uniform(5, 40, n)
            self._scenes[img] = dict(
                n=n, noun_ids=noun_ids, attr_flags=attr_flags, x=x, y=y, w=w, h=h
            )

    @property
    def image_ids(self) -> List[str]:
        return list(self._scenes.keys())

    # ------------------------------------------------------------- features

    def image(self, image_id: str) -> Tuple[np.ndarray, int]:
        s = self._scenes[image_id]
        n = s["n"]
        onehot = np.zeros((n, len(self.nouns) + len(self.attrs)), np.float32)
        onehot[np.arange(n), s["noun_ids"]] = 1.0
        onehot[:, len(self.nouns) :] = s["attr_flags"]
        h = abs(hash(("noise", image_id))) % (2**32)
        nrng = np.random.default_rng(h)
        feats = onehot @ self._codebook + self._noise * nrng.standard_normal(
            (n, self.box_dim)
        ).astype(np.float32)
        out = np.zeros((n, self.box_dim + 6), np.float32)
        out[:, : self.box_dim] = feats
        out[:, self.box_dim] = 640
        out[:, self.box_dim + 1] = 480
        out[:, self.box_dim + 2] = s["x"]
        out[:, self.box_dim + 3] = s["y"]
        out[:, self.box_dim + 4] = s["w"]
        out[:, self.box_dim + 5] = s["h"]
        return out, n

    # ---------------------------------------------------------- ground truth

    def _holds_attr(self, s, obj: int, token: str) -> bool:
        if token in self.nouns:
            return s["noun_ids"][obj] == self.nouns.index(token)
        if token in self.attrs:
            return bool(s["attr_flags"][obj, self.attrs.index(token)])
        return False

    def _holds_rel(self, s, i: int, j: int, rel: str) -> bool:
        cx_i = s["x"][i] + s["w"][i] / 2
        cx_j = s["x"][j] + s["w"][j] / 2
        if rel == "to the left of":
            return cx_i < cx_j
        if rel == "to the right of":
            return cx_i > cx_j
        return False

    def eval_branch(self, image_id: str, branch: List[dict]) -> np.ndarray:
        """Boolean object-set evaluation of a select/filter/relate chain."""
        s = self._scenes[image_id]
        n = s["n"]
        cur = np.ones(n, bool)
        for op in branch:
            if op["operator"] == "select":
                a = op["arguments"][0]
                if a not in ("_", "scene", None):
                    cur &= np.array([self._holds_attr(s, o, a) for o in range(n)])
            elif op["operator"] == "filter":
                a = op["arguments"][0]
                cur &= np.array([self._holds_attr(s, o, a) for o in range(n)])
            elif op["operator"] == "relate":
                rel, is_subject, aux = op["arguments"]
                new = np.array([self._holds_attr(s, o, aux) for o in range(n)]) if aux not in (
                    "_", None, "scene",
                ) else np.ones(n, bool)
                nxt = np.zeros(n, bool)
                for o in range(n):
                    if not new[o]:
                        continue
                    for p in range(n):
                        if p == o or not cur[p]:
                            continue
                        holds = (
                            self._holds_rel(s, o, p, rel)
                            if is_subject
                            else self._holds_rel(s, p, o, rel)
                        )
                        if holds:
                            nxt[o] = True
                            break
                cur = nxt
        return cur

    # ------------------------------------------------------------- questions

    def generate(self, n: int, hops: int = 1, seed: int = 0, balance: bool = True) -> List[dict]:
        """Exist questions with ground-truth answers (optionally balanced)."""
        rng = np.random.default_rng(seed)
        out = []
        want_yes = True
        guard = 0
        while len(out) < n and guard < n * 200:
            guard += 1
            img = f"planted_{int(rng.integers(0, len(self._scenes)))}"
            ops = [{"operator": "select", "arguments": [str(rng.choice(self.nouns))]}]
            for hop in range(hops - 1):
                if hop == 0 and hops > 1 and rng.uniform() < 0.5:
                    ops.append(
                        {
                            "operator": "relate",
                            "arguments": [str(rng.choice(self.relations)), True,
                                          str(rng.choice(self.nouns))],
                        }
                    )
                else:
                    ops.append({"operator": "filter", "arguments": [str(rng.choice(self.attrs))]})
            ans = "yes" if self.eval_branch(img, ops).any() else "no"
            if balance and ((ans == "yes") != want_yes):
                continue
            want_yes = not want_yes
            out.append(
                {
                    "program": {"branches": [ops], "last_op": {"operator": "exist", "arguments": []}},
                    "answer": ans,
                    "imageId": img,
                    "question_id": f"p{len(out)}",
                }
            )
        return out
