"""Test harness: run everything on a simulated 8-device CPU mesh.

Multi-chip sharding is validated the standard JAX way
(xla_force_host_platform_device_count) since real multi-chip hardware is not
available in CI. The container's sitecustomize force-registers the remote
'axon' TPU backend and overrides jax_platforms, so we must both scrub the env
and update the jax config before any backend is initialized.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()
assert len(jax.devices()) == 8, jax.devices()
