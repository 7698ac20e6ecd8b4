"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md section 4e).

Opt-in TPU smoke lane: RUN_TPU_TESTS=1 keeps the real device visible and
enables tests marked @pytest.mark.tpu (the denormal-flush class of bug —
commit 64982f9 — is invisible to the CPU suite).  Never run the TPU lane
while another process holds the chip.
"""

import os

import pytest

RUN_TPU = os.environ.get("RUN_TPU_TESTS", "") == "1"

if not RUN_TPU:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not RUN_TPU:
    # The axon TPU plugin ignores the JAX_PLATFORMS env var; the config
    # flag does force the CPU backend (and enables the virtual devices).
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

from royaltracer_dx_tpu import cache  # noqa: E402,F401  (persistent XLA cache)


def pytest_collection_modifyitems(config, items):
    for item in items:
        if "tpu" in item.keywords and not RUN_TPU:
            item.add_marker(pytest.mark.skip(
                reason="TPU smoke lane: set RUN_TPU_TESTS=1"))
        if RUN_TPU and "tpu" not in item.keywords:
            item.add_marker(pytest.mark.skip(
                reason="RUN_TPU_TESTS=1 runs only @pytest.mark.tpu tests"))


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: opt-in smoke tests on the real TPU chip")
