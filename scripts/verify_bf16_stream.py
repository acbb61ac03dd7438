"""Pin the `tpu.rel_stream_dtype=bfloat16` bit-identity claim on real TPU.

config.py documents that storing the shared O^2 pair code h2 (and e_sel) in
bf16 is BIT-IDENTICAL to f32 storage on the Pallas shared-contract path at
JAX's default TPU matmul precision, because the MXU decomposes f32 operands
to bf16 passes anyway. That claim only activates with backend==tpu and
O >= 64 (models/oracle.py rel_cache_shared), so the CPU-pinned test suite
cannot exercise it; this script runs the exact production path both ways on
the real chip and compares bitwise.

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
    from dfol_vqa_tpu.models.oracle import rel_cache_shared
    from dfol_vqa_tpu.models.interpreter import Interpreter
    from dfol_vqa_tpu.ontology import GQAOntology

    O, U, B = 100, 4, 12  # O >= 64 engages the Pallas path
    cfg_f32 = Config()
    cfg_f32.tpu.max_object_num = O
    cfg_f32.tpu.rel_stream_dtype = "float32"
    cfg_bf16 = Config()
    cfg_bf16.tpu.max_object_num = O
    cfg_bf16.tpu.rel_stream_dtype = "bfloat16"
    assert cfg_bf16.tpu.use_pallas and cfg_f32.tpu.use_pallas

    ont = GQAOntology()
    interp = Interpreter(cfg_f32, ont)
    params = interp.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    attr_in_u = jnp.asarray(
        rng.standard_normal((U, O, cfg_f32.attr_input_dim)).astype(np.float32))
    pos_u = jnp.asarray(rng.uniform(0, 1, (U, O, 4)).astype(np.float32))
    img_index = jnp.asarray(rng.integers(0, U, B).astype(np.int32))
    R = cfg_f32.tpu.rel_table_size
    rel_tokens = jnp.asarray(rng.integers(0, 300, (B, R)).astype(np.int32))

    def run(cfg):
        fn = jax.jit(lambda p: rel_cache_shared(
            p, attr_in_u, pos_u, img_index, rel_tokens, cfg))
        return np.asarray(fn(params))

    out_f32 = run(cfg_f32)
    out_bf16 = run(cfg_bf16)
    identical = np.array_equal(out_f32, out_bf16)
    max_abs = float(np.max(np.abs(out_f32 - out_bf16)))
    print(f"bit_identical={identical} max_abs_delta={max_abs:.3e} "
          f"shape={out_f32.shape} device={jax.devices()[0].device_kind}")
    return 0 if identical else 1


if __name__ == "__main__":
    sys.exit(main())
