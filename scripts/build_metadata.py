"""Consolidate GQA ontology metadata into a single compressed asset.

The upstream ∇-FOL framework ships five JSON metadata files
(reference: src/nsvqa/data/metadata/*.json — gqa_vocab.json, gqa_all_attribute.json,
gqa_all_class.json, gqa_relation.json, op_map.json). This script reads
reference-format JSON files and re-packs the *data* into one gzip-compressed
JSON asset with a flat, versioned schema that `dfol_vqa_tpu.ontology` loads.

Usage:
    python scripts/build_metadata.py --src /path/to/metadata_dir \
        --out dfol_vqa_tpu/data/metadata/gqa_metadata.json.gz
"""

import argparse
import gzip
import json
import os


def build(src_dir: str) -> dict:
    with open(os.path.join(src_dir, "gqa_vocab.json")) as f:
        vocab = json.load(f)
    with open(os.path.join(src_dir, "gqa_all_attribute.json")) as f:
        attribute_categories = json.load(f)
    with open(os.path.join(src_dir, "gqa_all_class.json")) as f:
        class_families = json.load(f)
    with open(os.path.join(src_dir, "gqa_relation.json")) as f:
        relations = json.load(f)
    with open(os.path.join(src_dir, "op_map.json")) as f:
        op_map = json.load(f)

    # idx_to_* lists are the canonical order (1-based codes = index + 1).
    meta = {
        "schema_version": 1,
        "ops": vocab["idx_to_op"],
        "args": vocab["idx_to_arg"],
        "images": vocab["idx_to_img"],
        "attribute_categories": attribute_categories,
        "class_families": class_families,
        "relations": sorted(set(relations)),
        "op_map": op_map,
    }
    return meta


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    meta = build(args.src)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with gzip.open(args.out, "wt", encoding="utf-8") as f:
        json.dump(meta, f, separators=(",", ":"))
    print("wrote", args.out)
    for k in ("ops", "args", "images", "relations"):
        print(k, len(meta[k]))
    print("attribute_categories", len(meta["attribute_categories"]))
    print("class_families", len(meta["class_families"]))
    print("op_map", len(meta["op_map"]))


if __name__ == "__main__":
    main()
