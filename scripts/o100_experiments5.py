"""Fifth O=100 experiment round: contract-then-gather cost split, pair-MLP
pad sensitivity, and a transcendental-cost probe for the fused kernel.

Informs the r5 rel-path redesign: EXP2/3/4 showed the per-question contract
kernel is MXU-underfilled (R=8 rows per dot) and the executor's attr-cache
gathers use a 40x-slower layout than a row gather.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


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
    B, O, R, U, E, H, D = 32, 100, 8, 4, 300, 256, 516
    K = 334  # relation sub-vocabulary
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0].device_kind)

    from dfol_vqa_tpu.ops.pallas.pair_mlp import pair_mlp_fused

    w_g = jnp.asarray(rng.standard_normal((4, H)) * 0.05, jnp.float32)
    b0 = jnp.zeros((H,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((H, E)) * 0.05, jnp.float32)
    b1 = jnp.zeros((E,), jnp.float32)
    layers = [{"w": w1, "b": b1}]
    img_index = jnp.asarray(np.repeat(np.arange(U), B // U), jnp.int32)
    b_sel = jnp.asarray(rng.standard_normal((B, R)), jnp.float32)
    slot = jnp.asarray(rng.integers(0, K, (B, R)), jnp.int32)
    emb_rel = jnp.asarray(rng.standard_normal((E, K + 1)) * 0.1, jnp.float32)

    # ---- pair MLP at different object paddings (pads enter the kernel)
    for O_PAD in (104, 128):
        x = jnp.asarray(rng.standard_normal((U, O_PAD, D)), jnp.float32)
        pos = jnp.asarray(rng.uniform(0.05, 0.95, (U, O_PAD, 4)), jnp.float32)
        w_s = jnp.asarray(rng.standard_normal((D, H)) * 0.05, jnp.float32)
        w_o = jnp.asarray(rng.standard_normal((D, H)) * 0.05, jnp.float32)
        h_s = jnp.dot(x, w_s)
        h_o = jnp.dot(x, w_o)

        def mlp(h_s, h_o, pos=pos):
            return pair_mlp_fused(pos, h_s, h_o, w_g, b0, layers,
                                  out_dtype=jnp.bfloat16)
        try:
            t = timeit(mlp, h_s, h_o)
            print(f"pair_mlp Pallas O_pad={O_PAD}:      {t*1e3:8.3f} ms")
        except Exception as e:
            print(f"pair_mlp O_pad={O_PAD} failed: {str(e)[:200]}")

    # ---- contract-then-gather split, from a precomputed bf16 h2
    O_PAD = 128
    h2 = jnp.asarray(rng.uniform(0, 1, (U, O_PAD, O_PAD, E)), jnp.float32).astype(jnp.bfloat16)

    def ctg_full(h2):
        h2k = jnp.einsum("upe,ek->ukp",
                         h2.reshape(U, O_PAD * O_PAD, E),
                         emb_rel.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        flat = img_index[:, None] * (K + 1) + slot
        logits = jnp.take(h2k.reshape(U * (K + 1), O_PAD * O_PAD), flat, axis=0)
        return jax.nn.log_sigmoid(logits + b_sel[:, :, None])

    t = timeit(ctg_full, h2)
    print(f"ctg full (einsum+gather+lsig): {t*1e3:8.3f} ms")

    def ctg_einsum_only(h2):
        return jnp.einsum("upe,ek->ukp",
                          h2.reshape(U, O_PAD * O_PAD, E),
                          emb_rel.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    t = timeit(ctg_einsum_only, h2)
    print(f"ctg einsum only:               {t*1e3:8.3f} ms")

    # einsum emitting bf16 (halves the h2k HBM write + gather read)
    def ctg_full_bf16(h2):
        h2k = jnp.einsum("upe,ek->ukp",
                         h2.reshape(U, O_PAD * O_PAD, E),
                         emb_rel.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        flat = img_index[:, None] * (K + 1) + slot
        logits = jnp.take(h2k.reshape(U * (K + 1), O_PAD * O_PAD), flat, axis=0)
        return jax.nn.log_sigmoid(logits.astype(jnp.float32) + b_sel[:, :, None])

    t = timeit(ctg_full_bf16, h2)
    print(f"ctg full, bf16 h2k:            {t*1e3:8.3f} ms")

    # ---- per-question contract but with all same-image questions batched
    # into one dot: group rows (B//U * R = 64) per image
    e_sel = jnp.asarray(rng.standard_normal((B, R, E)), jnp.float32).astype(jnp.bfloat16)

    def grouped_contract(h2):
        eg = e_sel.reshape(U, (B // U) * R, E)  # questions sorted by image
        out = jnp.einsum("uqe,upe->uqp", eg,
                         h2.reshape(U, O_PAD * O_PAD, E),
                         preferred_element_type=jnp.float32)
        return jax.nn.log_sigmoid(out + b_sel.reshape(U, -1)[:, :, None])

    t = timeit(grouped_contract, h2)
    print(f"grouped per-image contract:    {t*1e3:8.3f} ms")

    # ---- transcendental probe: the pair-MLP tail ops alone on (U,O2,H/E)
    h_lin = jnp.asarray(rng.standard_normal((U, O_PAD * O_PAD, H)), jnp.float32)

    def probe_elu_dot_sig(h):
        y = jax.nn.elu(h)
        y = jnp.dot(y.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return jax.nn.sigmoid(y).astype(jnp.bfloat16)

    t = timeit(probe_elu_dot_sig, h_lin)
    print(f"XLA elu+dot+sigmoid tail:      {t*1e3:8.3f} ms")

    def probe_relu_dot_id(h):
        y = jnp.maximum(h, 0.0)
        y = jnp.dot(y.astype(jnp.bfloat16), w1.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    t = timeit(probe_relu_dot_id, h_lin)
    print(f"XLA relu+dot (no transcend.):  {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
