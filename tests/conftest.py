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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


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
