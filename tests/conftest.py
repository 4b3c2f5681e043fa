"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding tests run without TPU hardware (SURVEY.md §4 implication).

IMPORTANT: the ambient axon TPU plugin force-sets
``jax_platforms="axon,cpu"`` at import time, *overriding* the
``JAX_PLATFORMS`` env var — so the env var alone is not enough; we must
``jax.config.update`` after importing jax.  Running tests through the
axon tunnel is catastrophically slow (its first device→host readback per
process takes minutes)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache: single-core CPU compiles dominate test
# time; cache XLA executables across pytest runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()


# ---------------------------------------------------------------------------
# Bound the process-lifetime compiler state.  The suite compiles ~100+
# large programs in one process; with round 5's added tests the CPU XLA
# compiler started segfaulting on big-graph compiles late in the run
# (heap-state-dependent: the same programs compile fine in fresh
# processes; a 128 MB stack does not help; the crash point moves with
# unrelated test additions).  Dropping every cached trace/executable
# after each test module keeps the compiler's heap regime close to a
# fresh process while preserving intra-module jit-cache hits.
import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
    gc.collect()
