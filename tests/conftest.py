"""Test config: run on a virtual 8-device CPU mesh (TPU-free, hermetic).

This mirrors SURVEY.md §4's plan: multi-device correctness is validated with
XLA's host-platform device simulation — the TPU-native analogue of the
reference's op_cpu fake-backend (model/stylegan/op_cpu/readme.md).
"""

import os

# Must be set before jax initializes its backends (override any outer value —
# the test suite is hermetic-CPU by design).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may have pinned a hardware platform; tests
# are hermetic-CPU, so override after import as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

