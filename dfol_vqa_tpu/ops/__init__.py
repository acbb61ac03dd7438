from dfol_vqa_tpu.ops.cells import filter_update, relate_update, apply_negation

__all__ = ["filter_update", "relate_update", "apply_negation"]
