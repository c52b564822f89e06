"""Measure the committed host-CPU baseline anchor for bench.py.

Runs the IDENTICAL compiled step algorithm (SoA engine, FDM-GMRES,
4-iteration Newton with line search, f32) on the host CPU at 512 and
4096 elements and writes bench_anchor.json at the repo root.  The 4096-
element per-qp throughput is the bench denominator (VERDICT r3 next
#10: a same-size-defensible anchor instead of the 512-element one —
4096 amortizes CPU fixed costs; the measured 512->4096 scaling factor
is also recorded so a live 512-element re-measurement can be projected).

The reference itself cannot be built here (vendored submodules are
empty snapshots, no egress — BASELINE.md); this conservative stand-in
vectorizes at least as well as the reference's scalar quad loops with
(n_tdof+1)x forward-FD element tangents, which bench.py does NOT count.

Run: JAX_PLATFORMS=cpu python scripts/measure_cpu_anchor.py
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("MIMI_TPU_X64", "0")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

import bench  # the bench's own builders: identical algorithm by construction


def measure(subdiv, n_steps):
    from mimi_tpu.parallel import sharding as sh

    prob = bench._build(subdiv, None)
    step = sh.make_step(
        prob, dt=0.05, newton_iters=bench.NEWTON_ITERS, solver="cg",
        cg_iters=40, residual_impl="soa", precond="fdm",
        lin_rel_tol=1e-3,
    )
    carry = sh.initial_carry(prob)
    carry = step(carry)  # compile + warm
    float(carry["u"].sum())
    t0 = time.perf_counter()
    for _ in range(n_steps):
        carry = step(carry)
    float(carry["u"].sum())
    wall = (time.perf_counter() - t0) / n_steps
    qp = prob.n_el * prob.n_q
    rate = qp * bench.RES_EVALS_PER_STEP / wall
    print(f"subdiv {subdiv}: {prob.n_el} elems, {wall:.2f} s/step, "
          f"{rate:.4g} qp-evals/s")
    return rate, prob.n_el


def main():
    import platform

    r512, n512 = measure(3, 2)
    r4096, n4096 = measure(4, 2)
    out = {
        "cpu_qp_evals_per_sec": r4096,
        "cpu_qp_evals_per_sec_512": r512,
        "scale_512_to_4096": r4096 / r512,
        "config": (
            f"host-CPU XLA, {n4096}-elem 3D J2 JC step "
            "(soa engine, FDM-GMRES lin 1e-3, 4-iter Newton, f32)"
        ),
        "host": platform.node() or "unknown",
        "measured_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    with open(os.path.join(HERE, "bench_anchor.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
