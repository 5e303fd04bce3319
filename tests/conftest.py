"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharded code paths are
validated on XLA's host platform with 8 virtual devices (the strategy the
survey prescribes in SURVEY.md §4). The environment may pre-import jax with a
TPU plugin (axon sitecustomize), so the platform is forced via jax.config,
which works as long as no backend has been initialized yet."""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
