"""Pin the fused pair-MLP kernel's numerics on real TPU at production dims.

tests/test_pair_mlp_kernel.py proves interpret-mode == XLA with true-f32
dots on CPU; the production claim is different: ON CHIP, the kernel's
explicit bf16 dot-operand casts round exactly like XLA's DEFAULT-precision
f32 matmuls (one bf16 MXU pass), so `tpu.fused_pair_mlp: true` changes
bytes, not bits (ops/pallas/pair_mlp.py _mlp_chain). This script runs the
full production relation-cache path (`rel_cache_shared`, the code the
executor actually calls — pair MLP trunk + shared-contract kernel) both
ways at O=100/U=4/B=32 production dims and compares bitwise.

VERDICT r4 item 1: "pin the bf16-operand identity ON THE CHIP ... at O=100
production dims, checked into TPU_HW_r05. Done = pair_mlp
bit_identical=True". Reference for the fused computation:
/root/reference/src/nsvqa/nn/vision/classifier_oracle.py:97-137.

Exit codes: 0 = bit-identical, 1 = mismatch, 3 = no TPU backend (skip).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    os.environ.pop("JAX_PLATFORMS", None)
    os.environ.pop("JAX_PLATFORM_NAME", None)
    import jax

    if jax.default_backend() != "tpu":
        print(f"SKIP: backend={jax.default_backend()}")
        return 3

    import jax.numpy as jnp

    from dfol_vqa_tpu.config import Config
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from dfol_vqa_tpu.models.oracle import rel_cache_shared
    from dfol_vqa_tpu.ontology import GQAOntology

    O, U, B = 100, 4, 32  # production worst-case dims (GQA max detections)

    def cfg_with(fused: bool) -> Config:
        cfg = Config()
        cfg.tpu.max_object_num = O
        cfg.tpu.fused_pair_mlp = fused
        assert cfg.tpu.use_pallas
        return cfg

    ont = GQAOntology()
    interp = Interpreter(cfg_with(True), ont)
    params = interp.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    cfg0 = cfg_with(True)
    attr_in_u = jnp.asarray(
        rng.standard_normal((U, O, cfg0.attr_input_dim)).astype(np.float32))
    pos_u = jnp.asarray(rng.uniform(0.05, 0.95, (U, O, 4)).astype(np.float32))
    img_index = jnp.asarray(rng.integers(0, U, B).astype(np.int32))
    R = cfg0.tpu.rel_table_size
    rel_tokens = jnp.asarray(rng.integers(0, 300, (B, R)).astype(np.int32))

    def run(fused: bool):
        cfg = cfg_with(fused)
        fn = jax.jit(lambda p: rel_cache_shared(
            p, attr_in_u, pos_u, img_index, rel_tokens, cfg))
        return np.asarray(fn(params))

    out_fused = run(True)
    out_xla = run(False)
    identical = np.array_equal(out_fused, out_xla)
    max_abs = float(np.max(np.abs(out_fused - out_xla)))
    print(f"pair_mlp bit_identical={identical} max_abs_delta={max_abs:.3e} "
          f"shape={out_fused.shape} O={O} U={U} B={B} "
          f"device={jax.devices()[0].device_kind}")
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
