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

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The full suite compiles hundreds of XLA:CPU programs in one process;
    past ~180 tests the NEXT compile segfaults inside LLVM
    (backend_compile_and_load) — deterministic, independent of the
    persistent compile cache and of the native ctypes library (bisected
    2026-08-19). Dropping executable references per module keeps the
    process under the trigger volume; cross-module shared shapes
    recompile, which is seconds on CPU.
    """
    yield
    jax.clear_caches()
