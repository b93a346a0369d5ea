"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware isn't available in CI; sharding paths are validated on
XLA's host-platform virtual devices (the reference's analog is its
DummyBackend fake-device pattern, vop_core_tests.cpp:21).

Note: the environment may pre-register a remote TPU backend at interpreter
startup (sitecustomize), so we must both set the env vars AND force the
platform through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
