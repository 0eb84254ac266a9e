"""Auxiliary subsystems: checkpoint/resume, chunked loop, compare tooling."""
import os

import jax
import numpy as np
import pytest

from mpc_tpu.planner import closed_loop as cl
from mpc_tpu.utils import checkpoint as ck
from mpc_tpu.utils import compare
from mpc_tpu.utils import synthetic

from asset_paths import GOLD  # noqa: F401


def test_chunked_loop_matches_full():
    """init_carry performs the SAME cold-start warm-up as run_closed_loop
    (shared cold_start_state), so chunked == full including warm-up solves."""
    lcfg, params = synthetic.make_bench_loop(n_steps=8, horizon=10, n_lanes=1)
    assert lcfg.cold_start_solves > 0  # the parity being tested
    one = jax.tree.map(lambda x: x[0], params)
    full = cl.closed_loop_jit(lcfg, one)
    carry = cl.init_carry(lcfg, one)
    carry, r1 = cl.closed_loop_chunk(lcfg, one, carry, 3)
    carry, r2 = cl.closed_loop_chunk(lcfg, one, carry, 5)
    X_chunked = np.concatenate([np.asarray(r1.X), np.asarray(r2.X)])
    np.testing.assert_allclose(X_chunked, np.asarray(full.X), atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    lcfg, params = synthetic.make_bench_loop(n_steps=6, horizon=10, n_lanes=1)
    import dataclasses
    lcfg = dataclasses.replace(lcfg, cold_start_solves=0)
    one = jax.tree.map(lambda x: x[0], params)
    carry = cl.init_carry(lcfg, one)
    carry, r1 = cl.closed_loop_chunk(lcfg, one, carry, 3)
    ck.save_checkpoint(str(tmp_path), carry, 3)
    assert ck.latest_step(str(tmp_path)) == 3
    restored = ck.restore_checkpoint(str(tmp_path), carry)
    for a, b in zip(jax.tree.leaves(carry), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume and compare against uninterrupted run
    _, r2 = cl.closed_loop_chunk(lcfg, one, jax.tree.map(
        lambda x: jax.numpy.asarray(x), restored), 3)
    carry_direct = cl.init_carry(lcfg, one)
    _, rfull = cl.closed_loop_chunk(lcfg, one, carry_direct, 6)
    np.testing.assert_allclose(
        np.concatenate([np.asarray(r1.X), np.asarray(r2.X)]),
        np.asarray(rfull.X), atol=1e-5)


def test_checkpoint_sharded_roundtrip(tmp_path):
    """Sharded arrays checkpoint WITHOUT a host gather and restore with
    their shardings intact (orbax StandardCheckpointer path)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mpc_tpu.parallel import mesh as pm

    if not ck._HAVE_ORBAX:
        pytest.skip("orbax not available")
    n = min(len(jax.devices()), 8)
    mesh = pm.make_mesh((n // 2, 2), devices=jax.devices()[:n])
    sh = NamedSharding(mesh, P("dp"))
    state = {
        "U": jax.device_put(jax.numpy.arange(n * 12, dtype=jax.numpy.float32
                                             ).reshape(n, 4, 3), sh),
        "step": jax.numpy.asarray(7, jax.numpy.int32),
    }
    ck.save_checkpoint(str(tmp_path), state, 7)
    restored = ck.restore_checkpoint(str(tmp_path), state)
    np.testing.assert_array_equal(np.asarray(restored["U"]),
                                  np.asarray(state["U"]))
    assert restored["U"].sharding.is_equivalent_to(sh, state["U"].ndim)
    assert int(restored["step"]) == 7


def test_compare_tooling(tmp_path):
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    for d, scale in [(d1, 0.002), (d2, 0.04)]:
        os.makedirs(d)
        np.savetxt(os.path.join(d, "solve time.txt"),
                   np.full(30, scale))
    stats = compare.compare_solve_times({"fast": str(d1), "slow": str(d2)})
    assert stats["fast"]["p50_ms"] == pytest.approx(2.0)
    assert stats["slow"]["p50_ms"] == pytest.approx(40.0)
    png = compare.plot_solve_time_comparison(
        {"fast": str(d1), "slow": str(d2)}, str(tmp_path / "cmp.png"))
    assert os.path.exists(png)


def test_compare_against_reference_artifacts():
    dirs = {
        "ref-casadi": os.path.join(GOLD, "2D_plots_casadi_ZAM_Over-1_1_lane_following"),
        "ref-forcespro":
            os.path.join(GOLD, "2D_plots_forcespro_ZAM_Over-1_1_lane_following"),
    }
    stats = compare.compare_solve_times(dirs)
    # sanity vs SURVEY.md §6 numbers
    assert 30 < stats["ref-casadi"]["p50_ms"] < 50
    assert 1 < stats["ref-forcespro"]["p50_ms"] < 4


def test_profiling_time_jitted_and_breakdown():
    import jax.numpy as jnp
    from mpc_tpu.utils import profiling

    def f(x):
        return {"a": x * 2.0, "b": jnp.sum(x)}

    x = jnp.ones((64, 64))
    dt = profiling.time_jitted(f, x, reps=3)
    assert dt > 0.0
    res = profiling.breakdown([("double", f, (x,))], reps=2)
    assert res["double"] > 0.0


def test_profiling_solve_time_series():
    import numpy as np
    from mpc_tpu.utils import profiling

    s = profiling.solve_time_series(0.3, 30)
    assert s.shape == (30,)
    np.testing.assert_allclose(s, 0.01)


def test_profiling_trace_writes_files(tmp_path):
    import os
    import jax
    import jax.numpy as jnp
    from mpc_tpu.utils import profiling

    with profiling.trace(str(tmp_path)):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # trace dir gets a plugins/profile/<ts>/ tree
    found = any("profile" in r for r, _, _ in os.walk(tmp_path))
    assert found
