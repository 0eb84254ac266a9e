"""Multi-chip scaling evidence without multi-chip hardware (VERDICT r4 #6).

Two artifacts into SCALING_MESH.json:

1. **Collective census of the PRODUCTION sharded program.**  Lowers
   ``closed_loop_batch_sharded`` (the engine-sharded shard_map path the
   dryrun and pod deployments run) at B = 256 lanes/device x 8 devices,
   H=30, T=100 and counts every cross-device collective in the compiled
   HLO, with byte volumes parsed from the op shapes.  Expected result: the
   LOOP program contains ZERO collectives (lanes are independent; each
   device runs its shard's entire closed loop locally), and the
   ``summarize_loop`` diagnostics program contains only SCALAR
   psum/pmax reductions (O(bytes), once per run — not per step).  This
   bounds cross-chip traffic per solve at ~zero: weak scaling on real
   chips is then limited only by dispatch skew, which is why the >85%
   BASELINE.json target follows from program structure.

2. **Compute-normalized weak-scaling measurement.**  The round-4
   ``SCALING_MESH.json`` reported 0.774 efficiency at 8 virtual devices —
   on a TWO-core host, where 8 virtual CPU devices contend for the same
   silicon and the naive 1-device baseline uses the whole host.  The
   honest baseline for "does the mesh program add overhead?" is 8
   CONCURRENT independent 1-device processes on the same host (same
   compute demand, zero communication by construction): efficiency_norm =
   makespan(8 concurrent 1-dev) / wall(8-dev mesh).  >= 1.0 means the
   sharded program is no slower than perfectly-communication-free
   execution of the same work on the same silicon.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 3600 python tools/scaling_census.py
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COLLECTIVES = ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter")

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
                "bf16": 2, "f16": 2, "pred": 1, "u8": 1, "s8": 1}


def _shape_bytes(shape_txt: str) -> int:
    """Bytes of an HLO shape string like 'f32[2048,30]' or '(f32[], s32[])'."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_txt):
        dt, dims = m.group(1), m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def census(compiled_txt: str):
    """Count collective ops + their output byte volumes in HLO text."""
    counts = {c: 0 for c in COLLECTIVES}
    total_bytes = 0
    ops = []
    for line in compiled_txt.splitlines():
        for c in COLLECTIVES:
            # matches '  %name = f32[...] all-reduce(...)' and start/done
            # variants ('all-reduce-start')
            if re.search(rf"=\s*\S+\s+{c}(-start)?\(", line):
                counts[c] += 1
                m = re.search(r"=\s*(\(?[\w\[\],\s]+?\)?)\s+" + c, line)
                shape = m.group(1) if m else ""
                b = _shape_bytes(shape)
                total_bytes += b
                ops.append({"op": c, "shape": shape.strip(), "bytes": b})
    return {"collectives": counts, "collective_bytes": total_bytes,
            "ops": ops[:16]}


def census_rows():
    import jax

    from mpc_tpu.parallel import batch as pb
    from mpc_tpu.parallel import mesh as pm
    from mpc_tpu.planner import closed_loop as cl
    from mpc_tpu.utils import synthetic

    n_dev = len(jax.devices())
    mesh = pm.make_mesh((n_dev, 1), devices=jax.devices())
    lanes_per_dev = 256
    n_steps = 100
    lcfg, params = synthetic.make_bench_loop(
        n_steps=n_steps, horizon=30, n_lanes=lanes_per_dev * n_dev,
        method="al", al_iters=1, sqp_iters=1, alphas=(1.0,))

    loop_lowered = pb.lower_closed_loop_sharded(lcfg, params, mesh)
    loop_txt = loop_lowered.compile().as_text()
    loop_census = census(loop_txt)

    res_shape = jax.eval_shape(
        lambda p: cl.closed_loop_batch_vec(lcfg, p), params)
    sum_lowered = pb.lower_summarize_loop(res_shape, mesh)
    sum_txt = sum_lowered.compile().as_text()
    sum_census = census(sum_txt)

    total_solves = lanes_per_dev * n_dev * n_steps
    return {
        "devices": n_dev,
        "lanes_per_device": lanes_per_dev,
        "n_steps": n_steps,
        "loop_program": {k: v for k, v in loop_census.items() if k != "ops"},
        "summary_program": sum_census,
        "cross_chip_bytes_per_solve": round(
            (loop_census["collective_bytes"]
             + sum_census["collective_bytes"]) / total_solves, 6),
    }


_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
import jax
assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 1
from mpc_tpu.planner import closed_loop as cl
from mpc_tpu.utils import synthetic
lcfg, params = synthetic.make_bench_loop(
    n_steps={steps}, horizon=30, n_lanes={lanes}, method="al",
    al_iters=1, sqp_iters=1, alphas=(1.0,))
import numpy as np
res = cl.closed_loop_batch_vec(lcfg, params)   # compile + warm
np.asarray(res.X)
# signal readiness, then wait for the coordinator's start flag so all
# children time their runs CONCURRENTLY (compiles stagger on a 2-core
# host; timing must not begin until every child is warm)
start = {start!r}
with open(start + ".ready.{idx}", "w") as f:
    f.write("ready")
while not os.path.exists(start):
    time.sleep(0.05)
t0 = time.perf_counter()
res = cl.closed_loop_batch_vec(lcfg, params)
np.asarray(res.X)
print("ELAPSED", time.perf_counter() - t0)
"""


def normalized_efficiency(lanes_per_dev=64, n_steps=5):
    import numpy as np

    import jax

    from mpc_tpu.parallel import batch as pb
    from mpc_tpu.parallel import mesh as pm
    from mpc_tpu.utils import synthetic

    n_dev = len(jax.devices())

    # mesh run (the production sharded program)
    mesh = pm.make_mesh((n_dev, 1), devices=jax.devices())
    lcfg, params = synthetic.make_bench_loop(
        n_steps=n_steps, horizon=30, n_lanes=lanes_per_dev * n_dev,
        method="al", al_iters=1, sqp_iters=1, alphas=(1.0,))
    res = pb.closed_loop_batch_sharded(lcfg, params, mesh)
    np.asarray(res.X)
    t0 = time.perf_counter()
    res = pb.closed_loop_batch_sharded(lcfg, params, mesh)
    np.asarray(res.X)
    t_mesh = time.perf_counter() - t0

    # in-process single-shard reference (one device, one shard's lanes):
    # t_mesh / (n_dev * t_1shard) ~ 1 means the virtual-CPU runtime ran
    # the n_dev shard programs SEQUENTIALLY — wall-clock mesh "efficiency"
    # on virtual devices then measures the host runtime's device
    # scheduling, not the program's (zero, per the census) communication
    from mpc_tpu.planner import closed_loop as cl
    lcfg1, params1 = synthetic.make_bench_loop(
        n_steps=n_steps, horizon=30, n_lanes=lanes_per_dev,
        method="al", al_iters=1, sqp_iters=1, alphas=(1.0,))
    r1 = cl.closed_loop_batch_vec(lcfg1, params1)
    np.asarray(r1.X)
    t0 = time.perf_counter()
    r1 = cl.closed_loop_batch_vec(lcfg1, params1)
    np.asarray(r1.X)
    t_1shard = time.perf_counter() - t0

    # baseline: n_dev CONCURRENT independent 1-device processes running the
    # same per-device workload on the same host (zero communication by
    # construction) — the compute-normalized ideal
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        start = os.path.join(td, "start")
        env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=1")
        procs = []
        for i in range(n_dev):
            script = _CHILD.format(repo=REPO, steps=n_steps,
                                   lanes=lanes_per_dev, start=start, idx=i)
            procs.append(subprocess.Popen(
                [sys.executable, "-c", script],
                stdout=subprocess.PIPE, env=env, text=True))
        # wait until EVERY child has compiled + warmed before starting the
        # clock (compiles stagger heavily on a shared-core host)
        deadline = time.time() + 1200
        while time.time() < deadline:
            if all(os.path.exists(f"{start}.ready.{i}")
                   for i in range(n_dev)):
                break
            time.sleep(0.2)
        else:
            raise TimeoutError("children never became ready")
        t0 = time.perf_counter()
        with open(start, "w") as f:
            f.write("go")
        elapsed = []
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            assert p.returncode == 0, out
            elapsed.append(float(out.split("ELAPSED")[1].split()[0]))
        makespan = time.perf_counter() - t0 - 0.05  # minus barrier poll lag

    return {
        "devices": n_dev,
        "lanes_per_device": lanes_per_dev,
        "n_steps": n_steps,
        "t_mesh_s": round(t_mesh, 3),
        "t_1shard_inprocess_s": round(t_1shard, 3),
        "mesh_vs_sequential_shards": round(t_mesh / (n_dev * t_1shard), 3),
        "t_concurrent_makespan_s": round(makespan, 3),
        "t_concurrent_per_proc_s": [round(e, 3) for e in elapsed],
        "efficiency_normalized": round(makespan / t_mesh, 3),
        "note": ("baseline = same per-device work in independent "
                 "communication-free processes on the same host; >= 1.0 "
                 "means the sharded mesh program adds no overhead over the "
                 "compute-normalized ideal.  mesh_vs_sequential_shards ~ 1 "
                 "means the virtual-CPU device runtime executed the shard "
                 "programs back-to-back (its scheduling, not program "
                 "communication — the loop program census shows ZERO "
                 "collectives), so virtual-mesh wall time cannot measure "
                 "real-chip scaling; the census bounds cross-chip traffic "
                 "instead"),
    }


def main():
    import jax

    out = {
        "platform": jax.default_backend(),
        "host_physical_cores": os.cpu_count(),
        "census": census_rows(),
        "normalized_weak_scaling": normalized_efficiency(),
    }
    with open(os.path.join(REPO, "SCALING_MESH.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
