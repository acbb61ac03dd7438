"""Dev-time harness to run the UNTRUSTED public reference implementation.

Used only by parity tests that are skipped when /root/reference is absent.
We import the reference's torch modules to produce golden outputs; we never
copy its code into the framework.
"""

import sys

REFERENCE_SRC = "/root/reference/src"


def import_reference():
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import nsvqa.nn.interpreter.util  # noqa: F401
    import nsvqa.nn.interpreter.batch_base_types as types
    import nsvqa.nn.interpreter.batch_base_ops as ops

    return types, ops


def block_diag_sparse_map(torch, counts, total):
    """Build the reference's sparse (Q, O_total) batch_object_map."""
    rows, cols = [], []
    off = 0
    for q, n in enumerate(counts):
        for j in range(n):
            rows.append(q)
            cols.append(off + j)
        off += n
    ind = torch.tensor([rows, cols], dtype=torch.int64)
    vals = torch.ones(len(rows))
    return torch.sparse_coo_tensor(ind, vals, (len(counts), total))


def dense_to_ragged(x, counts, O):
    """(B, O) dense padded -> (O_total,) ragged concat of valid entries."""
    import numpy as np

    return np.concatenate([x[b, : counts[b]] for b in range(len(counts))], axis=0)


def ragged_pair_tensor(x_dense, counts, O, fill):
    """(B, O, O) dense per-question -> (O_total, O_total) block-diagonal."""
    import numpy as np

    total = sum(counts)
    out = np.full((total, total), fill, np.float32)
    off = 0
    for b, n in enumerate(counts):
        out[off : off + n, off : off + n] = x_dense[b, :n, :n]
        off += n
    return out
