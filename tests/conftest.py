"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests exercise jax.sharding without TPU hardware via
XLA's host-platform device-count override (SURVEY.md section 4c).

Note: the environment's sitecustomize registers the remote-TPU (axon)
backend at interpreter startup, so env vars set here are too late —
``jax.config.update`` before the first backend use is the reliable switch.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
