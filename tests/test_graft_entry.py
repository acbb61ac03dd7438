"""The driver's entry points must work as invoked by the driver.

Round-1 regression: the driver calls ``dryrun_multichip(8)`` in a plain
environment where only one real device is visible; the entry point must
self-provision an 8-device virtual CPU mesh rather than erroring out.
"""

import os
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow  # excluded from the quick tier

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_self_provisions():
    env = dict(os.environ)
    # Simulate the driver: none of the CPU-forcing knobs are set.
    for k in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "DFOL_DRYRUN_CHILD"):
        env.pop(k, None)
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    )
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout
    assert "'data': 4" in proc.stdout and "'model': 2" in proc.stdout, proc.stdout
