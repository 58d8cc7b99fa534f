"""perf/scaling.py harness — functional run on the virtual CPU mesh.

Timing on oversubscribed virtual devices is meaningless (SCALING.md); these
tests pin that the harness *drives the production paths* — the fused
per-block kernels (``impl='fused'``, interpret mode off-TPU) and the
portable jnp dist step — and that the report machinery is sound.
"""

import jax
import pytest

from cubez_tpu.perf import scaling


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
@pytest.mark.parametrize("impl,solver", [
    ("fused", "sor2sma"),   # fused per-block point sweep
    ("fused", "pcr_rb"),    # fused per-block line solver (line layout)
    ("jnp", "sor2sma"),     # portable shard_map step
])
def test_weak_scaling_runs_production_paths(impl, solver):
    pts = scaling.weak_scaling(
        block=16, solver=solver, omega=1.5, iters=2,
        device_counts=[1, 2], impl=impl,
    )
    assert [p.n_devices for p in pts] == [1, 2]
    for p in pts:
        assert p.seconds > 0 and p.cells_per_s > 0
        # the harness must not silently fall back: the point records which
        # step implementation actually ran
        assert p.step_impl == impl
    # 2-device point doubles the global grid along one axis
    assert sorted(pts[1].global_shape) != sorted(pts[0].global_shape)
    eff = scaling.efficiency(pts)
    assert len(eff) == 2 and eff[0] == 1.0
    rep = scaling.report(pts)
    assert "Mcells/s" in rep and len(rep.splitlines()) == 3
