"""Test bootstrap: force an 8-device CPU simulator (SURVEY.md §4.4).

The container's axon sitecustomize registers the real TPU in every process and
forces jax_platforms=axon,cpu; the in-process config override below runs before
any backend initialization and wins. Set RT_TESTS_TPU=1 to run the suite on the
real chip instead (single device; distributed tests auto-skip).
"""

import os

import jax

if os.environ.get("RT_TESTS_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache: the suite is compile-bound (~19 min cold); jitted
# programs (render_banded bands, grad programs, …) reload across runs/sessions.
# Only jax.jit-ed computations are cached — eager op-by-op dispatch is not.
# SEPARATE dir from the bench/CLI `.jax_cache`: a pytest run concurrent with
# another cache-writing python process segfaulted inside the cache READ
# (jax _cache_read deserializing a racing entry, observed 2026-08-20);
# tests themselves are a single serial process, so a private dir removes
# the only writer/reader race.
try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_tests"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: needs the real TPU chip")
    config.addinivalue_line("markers", "slow: long-running test")


def pytest_collection_modifyitems(config, items):
    on_tpu = os.environ.get("RT_TESTS_TPU") == "1"
    for item in items:
        if "tpu" in item.keywords and not on_tpu:
            item.add_marker(pytest.mark.skip(reason="RT_TESTS_TPU!=1"))
