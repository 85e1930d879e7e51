"""Test configuration: run everything on a virtual 8-device CPU mesh in
float64, so numerical checks validate the math independent of TPU float32
behaviour.  Sharding tests use the 8 virtual devices.

Note: the JAX_PLATFORMS env var is not honoured when an out-of-tree TPU
platform plugin self-registers, so the platform is forced via jax.config.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
