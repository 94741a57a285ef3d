"""Test configuration: force an 8-device virtual CPU mesh.

The ambient environment registers a remote TPU backend ("axon") via
sitecustomize and forces ``jax_platforms="axon,cpu"`` — every op would
round-trip through the TPU tunnel.  Unit tests run on a virtual 8-device
CPU mesh instead (sharding tests exercise the same pjit/shard_map paths
the driver validates with its multichip dry-run).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may already have set jax_platforms="axon,cpu"; override it
# before any backend is initialized so everything runs on host CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
