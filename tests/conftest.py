"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's IPUModel simulator strategy (reference:
src/ipu_utils.hpp:78-86): the same compiled code runs on a simulated
target so multi-chip sharding is testable without hardware.

Note: this environment's sitecustomize may pre-register a remote TPU
backend and force jax_platforms, so setting JAX_PLATFORMS in os.environ
is not enough - we must override via jax.config after import.  XLA_FLAGS
must still be set before the CPU client is instantiated.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
