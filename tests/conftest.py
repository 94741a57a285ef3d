"""Test configuration: force an 8-device virtual CPU mesh.

The ambient environment registers a remote TPU backend ("axon") via
sitecustomize and forces ``jax_platforms="axon,cpu"`` — every op would
round-trip through the TPU tunnel.  Unit tests run on a virtual 8-device
CPU mesh instead (sharding tests exercise the same pjit/shard_map paths
the driver validates with its multichip dry-run).
"""

import os
import sys

# The axon PJRT plugin (dlopen'd by sitecustomize's register() at
# interpreter start whenever PALLAS_AXON_POOL_IPS is set) intermittently
# segfaults XLA's backend_compile_and_load when the FULL suite runs in one
# process, even though every op runs on CPU.  The plugin .so cannot be
# unloaded in-process, so the fix is a one-shot re-exec of pytest with the
# variable cleared — making ``python -m pytest tests/`` safe by default
# instead of depending on the runner remembering ``PALLAS_AXON_POOL_IPS=``.
# The re-exec happens in pytest_configure (below), not at import: pytest's
# fd-level capture is already active here, and exec'ing now would leave the
# child writing into the dead parent's capture tempfile.


def pytest_configure(config):
    if not os.environ.get("PALLAS_AXON_POOL_IPS") or os.environ.get(
        "_SLEQP_TPU_TESTS_REEXEC"
    ):
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        # restore the real stdout/stderr fds so the exec'd child inherits
        # the terminal, not the dead parent's capture tempfile
        capman.stop_global_capturing()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["_SLEQP_TPU_TESTS_REEXEC"] = "1"
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env,
    )


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
