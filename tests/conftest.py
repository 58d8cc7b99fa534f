"""Test configuration: run on an 8-virtual-device CPU mesh.

Multi-chip logic (shard_map + ppermute/psum) is validated on CPU exactly as
the driver's dryrun does; bench.py runs on the real TPU chip.
"""

import os

# Must be set before jax initializes its backends.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# Test tiers: the names below (bare function names; parametrized variants
# inherit) are the long to-tolerance/parity runs — each >= ~17 s on the
# shared 4-core host, together ~85% of the suite's 45 minutes.  They carry
# redundant signal at small scale, so the fast tier for iteration is
#     pytest -m "not slow" tests/        (~5 min)
# and CI/verify runs the full suite.  Tests already marked slow in-file
# (pytest.mark.slow) are unaffected.
import pytest  # noqa: E402

_SLOW_TESTS = {
    "test_fmg_dist_matches_serial",
    "test_overlap_mode_bitwise_vs_sequential",
    "test_fmg_beats_mg_to_tolerance",
    "test_dist_maf_line_matches_serial_unsplit_k",
    "test_fmg_init_alone_reaches_discretization_error",
    "test_dist_fused_pcr_matches_jnp_dist",
    "test_dist_fused_maf_pcr_rb_matches_jnp_dist",
    "test_mg_fused_smoother_matches_xla",
    "test_mg_fused_smoother_matches_xla_nonzero_b",
    "test_fmg_as_precond_maps_to_one_vcycle",
    "test_dist_maf_matches_serial",
    "test_dist_pcr_unsplit_k_matches_serial",
    "test_dist_sor2sma_matches_serial",
    "test_mg_dist_matches_serial",
    "test_sor2sma_color_sync_matches_jnp_dist",
    "test_mg_grid_independent_cycles_and_contraction",
    "test_bicgstab_mg_precond",
    "test_sor2sma_8_blocks_matches_lowsync_oracle",
    "test_dist_jacobi_matches_serial",
    "test_mg_converges_fast_any_size",
    "test_mg_eps_1e6",
    "test_fmg_rejects_custom_x0",
    "test_mg_solution_accuracy",
    "test_mg_history_semantics",
    "test_jacobi_8_blocks_matches_jnp_dist",
    "test_single_block_matches_serial_exactly",
    "test_maf_stretched_h2_convergence",
    "test_solve_dist_total_all_solvers",
    "test_fmg_maf",
    "test_fastdiag_sweep_matches_pcr_sweep",
    "test_dist_packed_bitwise_vs_serial_packed",
    # r5 additions re-tiered after a --durations pass (the six below are
    # 11 of the fast tier's 17 minutes): overlap parity is covered
    # to-tolerance by the dryrun + slow tier; the pack path keeps
    # test_dist_packed_residuals_match_serial as its fast signal
    "test_fused_overlap_matches_color_sync",
    "test_fused_overlap_single_block_bitwise",
    "test_sharded_checkpoint_resume_matches_straight",
    "test_dist_packed_maf_stretched_bitwise",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        base = item.name.split("[")[0]
        if base in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
