"""Test environment: force an 8-device virtual CPU mesh.

Multi-device pjit/shard_map semantics are tested without TPU hardware via
XLA's host-platform device-count override — the JAX-native answer to
"test multi-node without a cluster" (see SURVEY.md §4).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is jit-compile-bound (hundreds
# of small executables; ~12 min cold on this 1-core host), and the cache is
# keyed by HLO+jaxlib version so warm reruns skip straight to execution.
# The cache key does NOT include host CPU features, and CPU AOT artifacts
# are machine-specific (reusing another host's cache can load code compiled
# for unavailable ISA extensions -> cpu_aot_loader warnings / SIGILL risk),
# so the directory name carries a host discriminator: arch + a hash of the
# CPU-feature flags. A cache copied across hosts simply goes cold.
# Kept out of git (.gitignore); delete the dir to force a cold run.
def _host_tag() -> str:
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    h = hashlib.sha256(feats.encode()).hexdigest()[:8]
    return f"{platform.machine()}-{h}"


_cache_dir = os.environ.get("DFOL_TEST_JIT_CACHE")
if _cache_dir is None:
    _cache_dir = os.path.join(
        os.path.dirname(__file__), os.pardir, f".pytest_jit_cache-{_host_tag()}"
    )
if _cache_dir != "0":
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "src"))


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference checkout not available"
)


@pytest.fixture(scope="session")
def ontology():
    from dfol_vqa_tpu.ontology import GQAOntology

    return GQAOntology()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
