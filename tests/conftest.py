"""Test configuration: force an 8-virtual-device CPU mesh (SURVEY.md §5).

The build environment's `sitecustomize.py` registers the axon TPU-tunnel
PJRT plugin in EVERY interpreter and forces `jax_platforms=axon,cpu` —
env vars alone cannot opt out, so "CPU" tests would silently run on the
shared TPU service (minutes-long compile queues). We re-override the jax
config here, before any backend is initialized, and request 8 host
devices so every shard_map/collective path is exercised without TPU
hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
