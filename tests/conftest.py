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

# Persistent compilation cache: the suite is compile-bound (~10 min cold);
# warm re-runs skip XLA compilation entirely.  Shares .jax_cache with
# bench.py — entries are keyed by platform + program hash, so CPU test
# entries and TPU bench entries coexist.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def pytest_collection_modifyitems(config, items):
    """Tag the curated fast-representative subset as ``quick`` so
    ``pytest -m quick`` gives sub-2-minute coverage of every subsystem
    (VERDICT r4 #9); everything else stays un-marked (full suite)."""
    import pytest

    quick = _QUICK_TESTS
    for item in items:
        key = (item.module.__name__, item.name.split("[")[0])
        if key in quick or (item.module.__name__, "*") in quick:
            item.add_marker(pytest.mark.quick)


# one or two fast tests per subsystem file; ("module", "*") marks the
# whole file.  Keep this list in sync when adding subsystems.
_QUICK_TESTS = {
    ("test_foundations", "*"),
    ("test_solver", "test_quadcons"),
    ("test_solver", "test_rosenbrock"),
    ("test_solver_class", "test_solver_basic"),
    ("test_solver_class", "test_polishing_inactive_guards_infinite_bounds"),
    ("test_cauchy", "test_linear_problem_step"),
    ("test_simplex", "test_small_lp"),
    ("test_simplex", "test_bound_flip_lp"),
    ("test_kkt", "test_min_norm_solution"),
    ("test_kkt", "test_lsq_duals_and_projection"),
    ("test_gltr", "test_gltr_vs_dense_convex"),
    ("test_gltr", "test_gltr_vs_dense_indefinite"),
    ("test_lp_enum", "test_enum_auto_resolution"),
    ("test_lsq", "test_lsqr_solves_least_squares"),
    ("test_lsq", "test_rosenbrock_lsq_gauss_newton"),
    ("test_quasi_newton", "test_bfgs_secant_property"),
    ("test_quasi_newton", "test_sr1_secant_property"),
    ("test_scale", "test_scaling_exactness"),
    ("test_scale", "test_solver_chain_auto_scaling"),
    ("test_preprocessor", "test_fixed_variable_elimination"),
    ("test_preprocessor", "test_solve_with_preprocessor"),
    ("test_minimize", "test_unconstrained_rosenbrock_jax"),
    ("test_misc", "test_float32_solve"),
    ("test_trial_rejection", "test_nonfinite_objective_rejected"),
    ("test_num_asserts", "test_num_asserts_detect_nonfinite"),
    ("test_checkpoint", "test_save_load_roundtrip"),
    ("test_dyn", "test_dyn_rosenbrock_solves"),
    ("test_profile", "test_profile_unconstrained"),
    ("test_pdlp", "test_pdlp_matches_simplex"),
    ("test_restoration_batched", "test_solve_with_restoration_single"),
    ("test_schur_sharded", "test_sharded_under_jit"),
    ("test_banded", "test_banded_chain_solves"),
    ("test_ocp", "test_ocp_solves_to_kkt_point"),
    ("test_mixed_precision", "test_mixed_fixtures"),
    ("test_block_tridiag", "test_thomas_vs_dense"),
    ("test_pallas_tridiag", "test_factor_solve_matches_scan"),
    ("test_harness", "test_registry_complete"),
    ("test_sparse", "test_sparse_unconstrained_quadratic"),
    ("test_sparse", "test_sparse_matches_dense_path_hs71"),
    ("test_harness", "test_deriv_check_catches_wrong_gradient"),
    ("test_variants", "test_initial_tr_choice"),
}
