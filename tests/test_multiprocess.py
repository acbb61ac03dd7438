"""Multi-PROCESS distributed training smoke (reference's dead multi-node
path made real and EXECUTED: jax.distributed.initialize, 2 processes x 4
CPU devices, host-sharded loaders, one GSPMD train step — see
scripts/multiprocess_smoke.py)."""

import os
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow  # excluded from the quick tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_train_step():
    env = dict(os.environ)
    # workers configure their own device counts/platform
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME"):
        env.pop(k, None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multiprocess_smoke.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=540,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "PASS multiprocess smoke" in proc.stdout, proc.stdout[-2000:]
