"""Test config: force CPU jax with a virtual 8-device mesh.

Multi-chip sharding is validated on a host-platform device mesh (no real
TPU pod available in CI), per SURVEY.md §4. Note: this environment's
``sitecustomize`` registers an ``axon`` TPU plugin that overrides
``JAX_PLATFORMS``, so we must force the platform via ``jax.config`` after
import — the env var alone is not honored.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
