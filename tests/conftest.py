"""Test harness: force an 8-device virtual CPU mesh.

This is the fake-backend story the reference lacks (SURVEY.md §4): all
multi-device sharding tests run on host CPU with
``--xla_force_host_platform_device_count=8``.

Note: the sandbox presets ``JAX_PLATFORMS=axon`` (tunneled TPU) and the axon
plugin wins over the env var, so we must force the platform through
``jax.config`` after import. A persistent compilation cache keeps repeat runs
cheap.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env is set)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
