"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded code paths are
validated on XLA's host platform with 8 virtual devices (the strategy the
survey prescribes in SURVEY.md §4). The environment may pre-import jax with a
TPU plugin (axon sitecustomize), so the platform is forced via jax.config,
which works as long as no backend has been initialized yet."""
import os

import pytest

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

# Tests must NOT touch the persistent compile cache (~/.jax_cache) at all:
# XLA:CPU's executable.serialize() segfaults (jax 0.9.0, reproduced twice at
# the identical put_executable_and_time site) persisting the big
# interpret-mode kNN programs, and a later read-only run against the same
# cache dir segfaulted inside backend_compile_and_load — while the same test
# passes cleanly against an empty cache dir (811 s, 2026-08-20). So: point
# the cache at an empty per-run tmpdir AND raise the min-compile-time gate
# (it runs before serialization) so nothing is ever written either. Warming
# the real cache is bench/production's job, not the test suite's.
# NBODYHPC_TPU_CACHE=0 stops the package __init__ from re-pointing the
# cache at ~/.jax_cache on import.
os.environ["NBODYHPC_TPU_CACHE"] = "0"

import tempfile  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("NBODYHPC_TPU_CACHE_DIR",
                   tempfile.mkdtemp(prefix="nbodyhpc_test_cache_")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run @pytest.mark.slow interpret-mode kernel tests",
    )


def pytest_collection_modifyitems(config, items):
    """`slow` tests (interpret-mode kernel parity, minutes each on one CPU
    core) are skipped by default so the everyday `pytest -q` stays under a
    few minutes; run them with `--runslow` / NBODYHPC_RUN_SLOW=1 (CI runs
    both tiers — see .github/workflows/python-package.yml)."""
    if config.getoption("--runslow") or os.environ.get("NBODYHPC_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow: use --runslow or NBODYHPC_RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
