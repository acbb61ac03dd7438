"""On-chip experiments for the O=100 relation-path roofline gap (r5).

Times candidate formulations of the shared-image relation cache at the
production worst-case dims (B=32, O=100->128 pad, R=8, U=4, E=300, H=256)
in isolation, on the real TPU, using the same k-differencing methodology
as bench.measure_device. Informs the per-dims kernel routing table.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

B, O, R, U, E, H, D = 32, 100, 8, 4, 300, 256, 516
O_PAD = 128


def timeit(fn, *args, k_small=8, k_big=256):
    ks = {}
    for k in (k_small, k_big):
        @jax.jit
        def run(c0, *a, k=k):
            def body(c, _):
                out = fn(*((a[0] + c,) + a[1:]))
                return jnp.sum(out.astype(jnp.float32)) * 1e-30, None
            c, _ = jax.lax.scan(body, c0, None, length=k)
            return c
        float(run(jnp.float32(0.0), *args))
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(jnp.float32(0.0), *args))
            reps.append(time.perf_counter() - t0)
        ks[k] = float(np.median(reps))
    return (ks[k_big] - ks[k_small]) / (k_big - k_small)


def main():
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    print("device:", dev.device_kind)

    x = jnp.asarray(rng.standard_normal((U, O_PAD, D)), jnp.float32)
    pos = jnp.asarray(rng.uniform(0.05, 0.95, (U, O_PAD, 4)), jnp.float32)
    w_s = jnp.asarray(rng.standard_normal((D, H)) * 0.05, jnp.float32)
    w_o = jnp.asarray(rng.standard_normal((D, H)) * 0.05, jnp.float32)
    w_g = jnp.asarray(rng.standard_normal((4, H)) * 0.05, jnp.float32)
    b0 = jnp.zeros((H,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((H, E)) * 0.05, jnp.float32)
    b1 = jnp.zeros((E,), jnp.float32)
    # questions grouped by image, 8 per image
    img_index = jnp.asarray(np.repeat(np.arange(U), B // U), jnp.int32)
    e_sel = jnp.asarray(rng.standard_normal((B, R, E)), jnp.float32)
    b_sel = jnp.asarray(rng.standard_normal((B, R)), jnp.float32)
    rel_tokens = jnp.asarray(rng.integers(1, 300, (B, R)), jnp.int32)

    h_s = jnp.dot(x, w_s)
    h_o = jnp.dot(x, w_o)
    layers = [{"w": w1, "b": b1}]

    from dfol_vqa_tpu.models.featurizer import pair_geometry
    from dfol_vqa_tpu.ops.pallas.pair_mlp import pair_mlp_fused, _pair_mlp_xla
    from dfol_vqa_tpu.ops.pallas.shared_contract import shared_contract_pallas

    # --- piece 1: pair MLP trunk
    def mlp_xla(h_s, h_o):
        g = pair_geometry(pos)
        return _pair_mlp_xla(g[..., 0], g[..., 1], g[..., 2], g[..., 3],
                             h_s, h_o, w_g, b0, layers).astype(jnp.bfloat16)

    t = timeit(mlp_xla, h_s, h_o)
    print(f"pair_mlp XLA (bf16 out):       {t*1e3:8.3f} ms")

    def mlp_pallas(h_s, h_o):
        return pair_mlp_fused(pos, h_s, h_o, w_g, b0, layers,
                              out_dtype=jnp.bfloat16)

    t = timeit(mlp_pallas, h_s, h_o)
    print(f"pair_mlp Pallas (bf16 out):    {t*1e3:8.3f} ms")

    h2 = jax.jit(mlp_pallas)(h_s, h_o)

    # --- piece 2: per-question contract
    def contract_pallas(h2):
        return shared_contract_pallas(h2, img_index, e_sel.astype(jnp.bfloat16),
                                      b_sel, rel_tokens, -13.8, valid_o=O)

    t = timeit(contract_pallas, h2)
    print(f"contract Pallas kernel:        {t*1e3:8.3f} ms")

    def contract_xla_pq(h2):
        h2q = jnp.take(h2, img_index, axis=0)
        logits = jnp.einsum("bije,bre->brij", h2q.astype(jnp.float32),
                            e_sel, preferred_element_type=jnp.float32)
        return jax.nn.log_sigmoid(logits + b_sel[:, :, None, None])

    t = timeit(contract_xla_pq, h2)
    print(f"contract XLA gather-then-dot:  {t*1e3:8.3f} ms")

    K = 334
    emb_rel = jnp.asarray(rng.standard_normal((E, K + 1)), jnp.float32)
    slot = jnp.asarray(rng.integers(0, K, (B, R)), jnp.int32)

    def contract_xla_ctg(h2):
        h2k = jnp.einsum("upe,ek->ukp", h2.astype(jnp.float32).reshape(U, O_PAD * O_PAD, E),
                         emb_rel, preferred_element_type=jnp.float32)
        flat = img_index[:, None] * (K + 1) + slot
        logits = jnp.take(h2k.reshape(U * (K + 1), O_PAD * O_PAD), flat, axis=0)
        return jax.nn.log_sigmoid(logits + b_sel[:, :, None])

    t = timeit(contract_xla_ctg, h2)
    print(f"contract XLA contract-gather:  {t*1e3:8.3f} ms")

    # --- piece 3: ragged_dot for the per-question contract
    group_sizes = jnp.asarray([B // U * R] * U, jnp.int32)  # questions sorted
    e_flat = e_sel.reshape(B * R, E)

    def contract_ragged(h2):
        rhs = h2.astype(jnp.float32).reshape(U, O_PAD * O_PAD, E).transpose(0, 2, 1)
        out = jax.lax.ragged_dot(e_flat, rhs, group_sizes,
                                 preferred_element_type=jnp.float32)
        return jax.nn.log_sigmoid(out.reshape(B, R, O_PAD, O_PAD)
                                  + b_sel[:, :, None, None])

    try:
        t = timeit(contract_ragged, h2)
        print(f"contract ragged_dot:           {t*1e3:8.3f} ms")
    except Exception as e:
        print("ragged_dot failed:", str(e)[:300])

    # bf16 rhs variant
    def contract_ragged_bf16(h2):
        rhs = h2.reshape(U, O_PAD * O_PAD, E).transpose(0, 2, 1)
        out = jax.lax.ragged_dot(e_flat.astype(jnp.bfloat16), rhs, group_sizes,
                                 preferred_element_type=jnp.float32)
        return jax.nn.log_sigmoid(out.reshape(B, R, O_PAD, O_PAD)
                                  + b_sel[:, :, None, None])

    try:
        t = timeit(contract_ragged_bf16, h2)
        print(f"contract ragged_dot bf16:      {t*1e3:8.3f} ms")
    except Exception as e:
        print("ragged_dot bf16 failed:", str(e)[:300])

    # --- combined current production paths
    def rel_path_kernel(h_s, h_o):
        h2 = pair_mlp_fused(pos, h_s, h_o, w_g, b0, layers, out_dtype=jnp.bfloat16)
        return shared_contract_pallas(h2, img_index, e_sel.astype(jnp.bfloat16),
                                      b_sel, rel_tokens, -13.8, valid_o=O)

    t = timeit(rel_path_kernel, h_s, h_o)
    print(f"rel path kernel+kernel:        {t*1e3:8.3f} ms")

    def rel_path_mlp_plus_ragged(h_s, h_o):
        h2 = pair_mlp_fused(pos, h_s, h_o, w_g, b0, layers, out_dtype=jnp.bfloat16)
        rhs = h2.reshape(U, O_PAD * O_PAD, E).transpose(0, 2, 1)
        out = jax.lax.ragged_dot(e_flat.astype(jnp.bfloat16), rhs, group_sizes,
                                 preferred_element_type=jnp.float32)
        return jax.nn.log_sigmoid(out.reshape(B, R, O_PAD, O_PAD)
                                  + b_sel[:, :, None, None])

    try:
        t = timeit(rel_path_mlp_plus_ragged, h_s, h_o)
        print(f"rel path kernel+ragged:        {t*1e3:8.3f} ms")
    except Exception as e:
        print("kernel+ragged failed:", str(e)[:300])


if __name__ == "__main__":
    main()
