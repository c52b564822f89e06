"""North-star contact sweep through the compiled core (scale probe).

BASELINE.json's headline config is a ~1e5-element 3D J2 **contact**
sweep.  This script runs a 48^3 cube pressed by a rigid bilinear
surface through the fused-kernel compiled core with the contact-spring
FDM preconditioner (solvers/fdm.py) and reports s/step + contact
observables.

Round-2 status (one v5e, f32): the body-force J2 config runs at 1.18
s/step; with contact the step is ~31 s/step, dominated by the
closest-point projection pass (vmapped per-point damped Newton on
(2,)-sized parametrics — tiny-dim padded; see docs/ROADMAP.md item 3
for the planned SoA treatment).  Kept as the measurement harness for
that work.

Usage:  python scripts/bench_contact_scale.py [spans] [precond] [tangent]
            [lin_rel_tol] [matvec_dtype]
"""

import os
import sys
import time

os.environ.setdefault("MIMI_TPU_X64", "0")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import mimi_tpu as mimi
from mimi_tpu.splines import Bezier
from mimi_tpu.parallel import sharding as sh


def main():
    spans = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    precond = sys.argv[2] if len(sys.argv) > 2 else "fdm"
    tangent = sys.argv[3] if len(sys.argv) > 3 else "consistent"
    lin_rel_tol = float(sys.argv[4]) if len(sys.argv) > 4 else None
    matvec_dtype = sys.argv[5] if len(sys.argv) > 5 else "f32"
    restart = int(sys.argv[6]) if len(sys.argv) > 6 else 30

    mat = mimi.J2()
    mat.density = 1e3
    mat.viscosity = 100.0
    mat.melting_temperature = 1500.0
    mat.initial_temperature = 20.0
    mat.specific_heat = 450.0
    mat.heat_fraction = 0.9
    mat.set_young_poisson(1e6, 0.3)
    h = mimi.JohnsonCookTemperatureAndRateDependentHardening()
    h.A, h.B, h.n, h.m = 700.0, 1400.0, 0.2835, 1.3558
    h.eps0_dot = 0.004
    h.reference_temperature = 20.0
    mat.hardening = h

    tool = Bezier(
        [1, 1],
        [
            [-0.5, -0.5, 1.02],
            [-0.5, 1.5, 1.02],
            [1.5, -0.5, 1.02],
            [1.5, 1.5, 1.02],
        ],
    )
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(tool)
    scene.plant_kd_tree(spans, 1)
    scene.coefficient = 5e7

    t0 = time.perf_counter()
    prob = sh.build_problem(
        os.path.join(HERE, "tests", "data", "cube-nurbs.mesh"),
        elevate=1,
        subdivide=0,
        refine_spans=spans,
        material=mat,
        dirichlet=[(0, 0), (0, 1), (0, 2)],
        body_force={},
        rho_inf=0.5,
        dtype=jnp.float32,
        contact=[(1, scene)],
    )
    print(
        f"build {time.perf_counter() - t0:.0f}s n_el={prob.n_el}",
        flush=True,
    )
    step = sh.make_step(
        prob,
        dt=0.01,
        newton_iters=10,
        solver="cg",
        cg_iters=80,
        residual_impl="pallas",
        precond=precond,
        contact_tangent=tangent,
        rel_tol=1e-3,
        lin_rel_tol=lin_rel_tol,
        matvec_dtype=matvec_dtype,
        gmres_restart=restart,
    )
    carry = sh.initial_carry(prob)
    t0 = time.perf_counter()
    # device-side rigid-tool sweep (see scene.translate_scene_data)
    push = jnp.asarray([0.0, 0.0, -0.01], jnp.float32)
    sd = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32), scene.scene_data()
    )
    sd = mimi.NearestDistanceToSplines.translate_scene_data(sd, push)
    carry = step(carry, contact_scenes=[sd])
    carry["u"].block_until_ready()
    print(f"compile+1st: {time.perf_counter() - t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    n = 4
    for _ in range(n):
        sd = mimi.NearestDistanceToSplines.translate_scene_data(sd, push)
        carry = step(carry, contact_scenes=[sd])
    float(carry["u"].sum())
    per = (time.perf_counter() - t0) / n
    cb = carry["contact"][0]
    nd = carry["newton"]
    print(
        f"per-step: {per * 1e3:.0f} ms  newton {int(nd['iters'])} its "
        f"gmres {int(nd['lin_iters'])} "
        f"norm {float(nd['norm']):.2e}/{float(nd['norm0']):.2e}"
    )
    print(
        f"force_z {float(cb['force'][2]):.4f} area {float(cb['area']):.4f} "
        f"|u|max {float(jnp.abs(carry['u']).max()):.5f} "
        f"finite {bool(jnp.isfinite(carry['u']).all())}"
    )


if __name__ == "__main__":
    main()
