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

    # reuse the bench's (cached) host problem build — same config
    t0 = time.perf_counter()
    import bench as _bench

    prob, scene, tool = _bench._build_contact(spans)
    mat = prob.material  # already set up for prob.dim
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
    import gc

    jmv = jax.jit(mv)
    dN_b = dN_t.astype(jnp.bfloat16)
    N_b = N_t.astype(jnp.bfloat16)
    t_f32 = timeit(jmv, w_el, dN_t, N_t, wdet_t, C)
    Cb = C.astype(jnp.bfloat16)
    del C
    gc.collect()
    t_bf16 = timeit(jmv, w_el, dN_b, N_b, wdet_t, Cb)
    del Cb
    gc.collect()
    print(f"(a) matvec kernel: f32 {t_f32*1e3:.2f} ms  "
          f"bf16 {t_bf16*1e3:.2f} ms")

    # cauchy storage (37 planes, the J2-family engine of record since r5)
    lay = sw.cauchy_plane_layout(dim)
    mv_c = sw.make_matvec_sweep(
        dim=dim, nd=nd, n_q=n_q, n_el=n_el, rho=mat.density,
        fac0=0.01, fac1_mu_v=0.0, has_visc=False, block_e=block_e,
        c_storage="cauchy",
    )
    Cc = jnp.asarray(
        rng.standard_normal((lay["n_plane"], n_q, n_el)), jnp.float32
    )
    jmv_c = jax.jit(mv_c)
    t_cf = timeit(jmv_c, w_el, dN_t, N_t, wdet_t, Cc)
    Ccb = Cc.astype(jnp.bfloat16)
    t_cb = timeit(jmv_c, w_el, dN_b, N_b, wdet_t, Ccb)
    del Ccb
    gc.collect()
    print(f"(a) matvec kernel cauchy-37: f32 {t_cf*1e3:.2f} ms  "
          f"bf16 {t_cb*1e3:.2f} ms")

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
        from mimi_tpu.solvers.fdm import (
            build_contact_face_schur,
            make_fdm_schur_apply,
        )

        schur = build_contact_face_schur(prob.fdm, f0, f1)
        if schur is not None:
            sa = jax.jit(
                make_fdm_schur_apply(prob.fdm, schur, f0, f1, jnp.float32)
            )
            print(f"(c) fdm+schur apply: {timeit(sa, v)*1e3:.2f} ms")

    # ---- (e) residual / assemble sweeps (the non-matvec step cost) ----
    st0 = prob.state0
    res = sw.make_residual_sweep(
        mat=mat, dt=0.01, dim=dim, nd=nd, n_q=n_q, n_el=n_el,
        rho=mat.density, mu_v=mat.viscosity, has_visc=True, state=st0,
        block_e=block_e,
    )
    asm = sw.make_assemble_sweep(
        mat=mat, dt=0.01, dim=dim, nd=nd, n_q=n_q, n_el=n_el,
        rho=mat.density, mu_v=mat.viscosity, has_visc=True, state=st0,
        block_e=block_e, c_dtype=jnp.bfloat16, c_storage="cauchy",
    )
    a_el = jnp.asarray(rng.standard_normal((dim, nd, n_el)), jnp.float32)
    v_el = jnp.asarray(rng.standard_normal((dim, nd, n_el)), jnp.float32)
    u_el = 0.001 * a_el
    jres = jax.jit(res)
    jasm = jax.jit(asm)
    print(f"(e) residual sweep: "
          f"{timeit(jres, u_el, a_el, v_el, st0, dN_t, N_t, wdet_t, n=10) * 1e3:.2f} ms")
    print(f"(e) assemble sweep (cauchy bf16 C): "
          f"{timeit(jasm, u_el, a_el, v_el, st0, dN_t, N_t, wdet_t, n=10) * 1e3:.2f} ms")

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
