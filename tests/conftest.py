"""Test configuration.

Tests run against the CPU backend with 8 virtual devices so the multi-chip
sharding paths (mesh/shard_map) execute without TPU hardware, per the
reference-equivalent strategy in SURVEY.md §4.

The axon TPU plugin (when present) force-selects its platform via
``jax.config.update("jax_platforms", "axon,cpu")`` during ``import jax``,
so the env var alone is not enough — we re-force CPU after import.
Set ``PT_TEST_BACKEND=tpu`` to run the suite on the real chip instead.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if os.environ.get("PT_TEST_BACKEND", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()} ({len(jax.devices())} devices)"


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_between_modules():
    """Drop compiled executables at module boundaries.

    The full suite compiles 1000+ distinct XLA CPU programs in one
    process; past a threshold the NEXT compile segfaults inside
    LLVM (jax 0.9.0 CPU backend — deterministic at the same test across
    runs, absent when any subset runs alone).  Freeing executables
    between modules keeps the live-code footprint under that threshold;
    per-module recompiles are cheap (each module re-warms only what it
    uses).
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def fixtures_dir():
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
