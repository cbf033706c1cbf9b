"""Test harness configuration.

Runs the whole suite on an 8-device virtual CPU mesh so sharding tests
exercise the same SPMD code paths as a real TPU slice.  Must run before
any test imports initialize a JAX backend.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
