"""Test configuration: force JAX onto CPU with 8 virtual devices so engine
and sharding tests run without TPU hardware (SURVEY.md section 4).

Note: the axon TPU plugin ignores the JAX_PLATFORMS environment variable,
so the platform is forced through jax.config (and JAX_PLATFORM_NAME as a
belt-and-braces fallback) before any test imports jax-using modules.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
