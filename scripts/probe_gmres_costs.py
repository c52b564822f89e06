"""Per-GMRES-iteration cost decomposition at the north-star contact
config (one v5e): times each J-matvec ingredient standalone —

  (a) the fused matvec sweep kernel (f32 and bf16 table streams),
  (b) the structured gather/scatter pair,
  (c) the FDM preconditioner apply,
  (d) the consistent contact tangent jvp (jax.linearize of the
      two-pass mortar residual),

so the next optimization target is chosen by measurement, not guess
(docs/ROADMAP.md "Next performance steps").

Usage: python scripts/probe_gmres_costs.py [spans]
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
from mimi_tpu.ops import sweeps as sw
from mimi_tpu.solvers.fdm import make_fdm_apply


def timeit(fn, *args, n=20, warm=3):
    """Chained timing (block_until_ready is unreliable on axon): feed
    the previous output's sum into a dummy add on the next input."""
    out = None
    for _ in range(warm):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # fetch a scalar to force completion
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / n


def main():
    spans = int(sys.argv[1]) if len(sys.argv) > 1 else 48
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
    print(f"build {time.perf_counter() - t0:.0f}s n_el={prob.n_el}")
    dim, nd, n_q, n_el = prob.dim, prob.conn.shape[1], prob.n_q, prob.n_el
    n_dof = prob.n_dof
    rng = np.random.default_rng(0)

    # ---- (a) matvec sweep kernel ----
    block_e = sw.pick_block_e(n_el, 128)
    mv = sw.make_matvec_sweep(
        dim=dim, nd=nd, n_q=n_q, n_el=n_el, rho=mat.density,
        fac0=0.01, fac1_mu_v=0.0, has_visc=False, block_e=block_e,
    )
    dN_t = jnp.asarray(
        np.transpose(prob.dN_dX, (2, 3, 1, 0)).copy(), jnp.float32
    )
    N_t = jnp.asarray(np.transpose(prob.N, (2, 1, 0)).copy(), jnp.float32)
    wdet_t = jnp.asarray(np.ascontiguousarray(prob.w_detJ.T), jnp.float32)
    C = jnp.asarray(
        rng.standard_normal((dim * dim, dim * dim, n_q, n_el)), jnp.float32
    )
    w_el = jnp.asarray(
        rng.standard_normal((dim, nd, n_el)), jnp.float32
    )
    jmv = jax.jit(mv)
    t_f32 = timeit(jmv, w_el, dN_t, N_t, wdet_t, C)
    t_bf16 = timeit(
        jmv, w_el, dN_t.astype(jnp.bfloat16), N_t.astype(jnp.bfloat16),
        wdet_t, C.astype(jnp.bfloat16),
    )
    print(f"(a) matvec kernel: f32 {t_f32*1e3:.2f} ms  "
          f"bf16 {t_bf16*1e3:.2f} ms")

    # ---- (b) gather/scatter ----
    connT = jnp.asarray(np.ascontiguousarray(prob.conn.T))
    w = jnp.asarray(rng.standard_normal((n_dof, dim)), jnp.float32)
    y_t = jnp.asarray(rng.standard_normal((dim, nd, n_el)), jnp.float32)
    if prob.grid is not None:
        g = prob.grid
        n_pad = prob.n_el - int(np.prod(g["spans"]))
        gat = jax.jit(
            lambda v: sh._structured_gather(
                v, dim, g["spans"], g["pp1"], g["nc"], n_pad
            )
        )
        sca = jax.jit(
            lambda yy: sh._structured_scatter(
                yy, dim, g["spans"], g["pp1"], g["nc"], n_dof, n_pad
            )
        )
        print(f"(b) gather {timeit(gat, w)*1e3:.2f} ms  "
              f"scatter {timeit(sca, y_t)*1e3:.2f} ms (structured)")
    else:
        gat = jax.jit(lambda v: v.T[:, connT])
        print(f"(b) gather {timeit(gat, w)*1e3:.2f} ms (conn)")

    # ---- (c) FDM apply ----
    if prob.fdm is not None:
        f0, f1 = 0.01, 0.1
        fa = jax.jit(make_fdm_apply(prob.fdm, f0, f1, jnp.float32))
        v = jnp.asarray(
            rng.standard_normal(n_dof * dim), jnp.float32
        )
        print(f"(c) fdm apply: {timeit(fa, v)*1e3:.2f} ms")

    # ---- (d) consistent contact tangent jvp ----
    cfns = sh._contact_fns_for(prob)
    cd = prob.contact[0]
    pp, rp, _ = cfns[0]

    def contact_residual(u_cur):
        pressure, _, _ = pp(u_cur, cd, cd["scene"], cd["penalty"])
        r, _, _ = rp(u_cur, cd, pressure)
        return r

    u0 = jnp.asarray(
        0.001 * rng.standard_normal((n_dof, dim)), jnp.float32
    )

    @jax.jit
    def lin_pair(u, wv):
        _, jvp = jax.linearize(contact_residual, u)
        return jvp(wv)

    t_full = timeit(lin_pair, u0, w, n=10)
    print(f"(d) contact linearize+jvp (per Newton, incl. primal): "
          f"{t_full*1e3:.2f} ms")

    # jvp alone at fixed primal (per GMRES iteration cost)
    _, jvp_fn = jax.linearize(contact_residual, u0)
    jjvp = jax.jit(jvp_fn)
    print(f"(d) contact jvp alone (per GMRES iter): "
          f"{timeit(jjvp, w)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
