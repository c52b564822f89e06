"""Pallas fused-residual kernel vs f64 reference (interpret mode on CPU).

All but the smoke test are slow-marked (interpret-mode pallas: ~8 min
for the full file on this host); test_pallas_sweeps_smoke runs in the
default tier so `pytest -q` always exercises the engine of record
(VERDICT r4 weak #4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mimi_tpu as mimi
from mimi_tpu.ops.pallas_residual import neohookean_residual_pallas

import os

DATA = os.path.join(os.path.dirname(__file__), "data")

slow = pytest.mark.slow


def test_pallas_sweeps_smoke():
    """DEFAULT-TIER smoke of ops/sweeps.py — one residual, one
    assemble (residual+tangent) and one matvec sweep, interpret mode,
    8 elements, against the same SoA math in plain jnp.  Guards the
    kernels every headline number runs through without the slow tier."""
    from mimi_tpu.parallel import sharding as sh
    from mimi_tpu.ops import sweeps

    mat = mimi.J2Linear()
    mat.density = 2.0
    mat.viscosity = -1
    mat.set_young_poisson(2100, 0.3)
    mat.sigma_y = 5.0  # low yield: the radial return actually fires
    mat.isotropic_hardening = 100.0
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1,
        1,
        mat,
        [(1, 0), (1, 1), (1, 2)],
        {1: -3.0},
        dtype=jnp.float32,
        pad_multiple=8,
    )
    dim, n_el, n_q = prob.dim, prob.n_el, prob.n_q
    nd = int(prob.conn.shape[1])
    rng = np.random.default_rng(7)
    u = jnp.asarray(
        0.05 * rng.standard_normal((prob.n_dof, dim)), jnp.float32
    )
    a = jnp.asarray(
        0.5 * rng.standard_normal((prob.n_dof, dim)), jnp.float32
    )
    w = jnp.asarray(
        rng.standard_normal((prob.n_dof, dim)), jnp.float32
    )
    connT = np.ascontiguousarray(prob.conn.T)
    dN_t = jnp.asarray(np.transpose(prob.dN_dX, (2, 3, 1, 0)).copy())
    N_t = jnp.asarray(np.transpose(prob.N, (2, 1, 0)).copy())
    wdet_t = jnp.asarray(np.ascontiguousarray(prob.w_detJ.T))
    gt = lambda x: x.T[:, connT]  # (dim, nd, n_el)
    u_el, a_el, w_el = gt(u), gt(a), gt(w)
    state = prob.state0
    rho = float(mat.density)

    # plain-jnp SoA reference of the identical math
    F = jnp.einsum("ndqe,cne->cdqe", dN_t, u_el) + jnp.eye(
        dim, dtype=jnp.float32
    )[:, :, None, None]
    P_ref, jvp = jax.linearize(
        lambda Ft: mat.pk1_soa(Ft, state, 0.05), F
    )
    aq = jnp.einsum("nqe,cne->cqe", N_t, a_el)
    y_ref = jnp.einsum(
        "qe,ndqe,cdqe->cne", wdet_t, dN_t, P_ref
    ) + rho * jnp.einsum("qe,nqe,cqe->cne", wdet_t, N_t, aq)

    kw = dict(
        mat=mat, dt=0.05, dim=dim, nd=nd, n_q=n_q, n_el=n_el,
        rho=rho, mu_v=0.0, has_visc=False, state=state,
        block_e=8, interpret=True,
    )
    res = sweeps.make_residual_sweep(**kw)
    y = res(u_el, a_el, None, state, dN_t, N_t, wdet_t)
    scale = float(jnp.abs(y_ref).max())
    assert float(jnp.abs(y - y_ref).max()) < 1e-4 * scale

    asm = sweeps.make_assemble_sweep(**kw)
    y2, C = asm(u_el, a_el, None, state, dN_t, N_t, wdet_t)
    assert float(jnp.abs(y2 - y_ref).max()) < 1e-4 * scale

    # matvec vs jvp of the reference residual at frozen state
    mv = sweeps.make_matvec_sweep(
        dim=dim, nd=nd, n_q=n_q, n_el=n_el, rho=rho, fac0=1.0,
        fac1_mu_v=0.0, has_visc=False, block_e=8, interpret=True,
    )
    y_mv = mv(w_el, dN_t, N_t, wdet_t, C)
    dF = jnp.einsum("ndqe,cne->cdqe", dN_t, w_el)
    dP = jvp(dF)
    wq = jnp.einsum("nqe,cne->cqe", N_t, w_el)
    y_mv_ref = jnp.einsum(
        "qe,ndqe,cdqe->cne", wdet_t, dN_t, dP
    ) + rho * jnp.einsum("qe,nqe,cqe->cne", wdet_t, N_t, wq)
    mv_scale = float(jnp.abs(y_mv_ref).max())
    assert float(jnp.abs(y_mv - y_mv_ref).max()) < 1e-3 * mv_scale
    # Cauchy-decomposition storage (tangent_storage="cauchy", 37 planes
    # vs 81): the matvec must reproduce the SAME jvp exactly — the
    # geometric transform dP = tr(F^-1 dF) P + J (M:sym dF) F^-T
    # - P dF^T F^-T is an identity for sigma(sym F), not a model
    assert type(mat).tangent_cauchy_decomp
    asm_c = sweeps.make_assemble_sweep(**kw, c_storage="cauchy")
    y3, Cc = asm_c(u_el, a_el, None, state, dN_t, N_t, wdet_t)
    assert float(jnp.abs(y3 - y_ref).max()) < 1e-4 * scale
    from mimi_tpu.ops.sweeps import cauchy_plane_layout

    assert Cc.shape[0] == cauchy_plane_layout(dim)["n_plane"]  # 37
    mv_c = sweeps.make_matvec_sweep(
        dim=dim, nd=nd, n_q=n_q, n_el=n_el, rho=rho, fac0=1.0,
        fac1_mu_v=0.0, has_visc=False, block_e=8, interpret=True,
        c_storage="cauchy",
    )
    y_mv_c = mv_c(w_el, dN_t, N_t, wdet_t, Cc)
    assert float(jnp.abs(y_mv_c - y_mv_ref).max()) < 1e-3 * mv_scale

    # sum-factorized matvec (make_matvec_sweep_sf): streams the 1D
    # basis factors + per-qp Jinv instead of dense dN/N — must
    # reproduce the same jvp (polynomial patch; VERDICT r4 #4 spike)
    from mimi_tpu.nurbs.mesh_io import read_mfem_nurbs_mesh
    from mimi_tpu.nurbs.topology import build_patch_from_mesh

    mesh = read_mfem_nurbs_mesh(os.path.join(DATA, "cube-nurbs.mesh"))
    patch, _, _ = build_patch_from_mesh(mesh)
    patch.elevate_degrees(1)
    patch.uniform_refine()
    n_g = round(n_q ** (1 / 3))
    tabs, jinv = sweeps.build_sf_tables(
        patch, prob.x_ref, np.asarray(prob.conn), n_g, np.float32
    )
    mv_sf = sweeps.make_matvec_sweep_sf(
        dim=dim, nd=nd, n_q=n_q, n_el=n_el, rho=rho, fac0=1.0,
        fac1_mu_v=0.0, has_visc=False, block_e=8, interpret=True,
        c_storage="cauchy", n_g=n_g, pp1=patch.degrees[0] + 1,
    )
    y_sf = mv_sf(
        w_el, *[jnp.asarray(t) for t in tabs], jnp.asarray(jinv),
        wdet_t, Cc,
    )
    assert float(jnp.abs(y_sf - y_mv_ref).max()) < 1e-3 * mv_scale

    # sum-factorized residual + assemble sweeps (sf_mode=True): same
    # y/C as the dense-table kernels
    sf_args = [jnp.asarray(t) for t in tabs] + [jnp.asarray(jinv)]
    res_sf = sweeps.make_residual_sweep(
        **kw, sf_mode=True, n_g=n_g, pp1=patch.degrees[0] + 1
    )
    y_rsf = res_sf(u_el, a_el, None, state, *sf_args, wdet_t)
    assert float(jnp.abs(y_rsf - y_ref).max()) < 1e-4 * scale
    asm_sf = sweeps.make_assemble_sweep(
        **kw, c_storage="cauchy", sf_mode=True, n_g=n_g,
        pp1=patch.degrees[0] + 1,
    )
    y_asf, Cc_sf = asm_sf(u_el, a_el, None, state, *sf_args, wdet_t)
    assert float(jnp.abs(y_asf - y_ref).max()) < 1e-4 * scale
    c_err = float(
        jnp.abs(
            Cc_sf.astype(jnp.float32) - Cc.astype(jnp.float32)
        ).max()
    )
    c_scale = float(jnp.abs(Cc).max())
    assert c_err < 1e-4 * c_scale, (c_err, c_scale)

    # pin the major symmetry of the Voigt matrix D-hat = d sigma/d eps
    # the 21-plane tri storage relies on (consistent radial-return
    # tangent of associated J2: built from I, I(x)I, N(x)N — symmetric;
    # note the 1/w_m minor-symmetry weights, sweeps.py assemble kernel)
    sig0, jvp_s = jax.linearize(
        lambda Ft: mat.cauchy_soa(Ft, state, 0.05), F
    )
    SYM = sweeps.sym_basis(dim)
    n_sym = len(SYM)
    cols = []
    for m, (i, j) in enumerate(SYM):
        seed = jnp.zeros_like(F).at[i, j].set(1.0)
        if i != j:
            seed = seed.at[j, i].set(1.0)
        cols.append(jvp_s(seed) * (1.0 if i == j else 0.5))
    M = np.stack(
        [
            np.stack([np.asarray(cols[m][i, j]) for m in range(n_sym)])
            for (i, j) in SYM
        ]
    )  # D-hat (a, m, q, e)
    m_asym = np.abs(M - M.transpose(1, 0, 2, 3)).max()
    assert m_asym < 1e-4 * max(np.abs(M).max(), 1e-30), m_asym

    # the run exercised the plastic branch, not just elasticity: at an
    # elastic-only yield the stress would differ
    mat_el = mimi.J2Linear()
    mat_el.density = 2.0
    mat_el.viscosity = -1
    mat_el.set_young_poisson(2100, 0.3)
    mat_el.sigma_y = 1e9
    mat_el.isotropic_hardening = 100.0
    mat_el.setup(dim)
    from mimi_tpu.fem import soa as _soa
    P_el = mat_el.pk1_soa(
        F, _soa.state_to_soa(mat_el.init_state((n_el, n_q))), 0.05
    )
    assert float(jnp.abs(P_ref - P_el).max()) > 1e-3 * scale


@slow
def test_pallas_neohookean_residual_interpret():
    from mimi_tpu.parallel import sharding as sh

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1
    mat.viscosity = -1
    mat.set_young_poisson(2100, 0.3)
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1,
        1,
        mat,
        [(1, 0), (1, 1), (1, 2)],
        {1: -3.0},
        dtype=jnp.float32,
        pad_multiple=8,
    )
    n_el, n_q = prob.w_detJ.shape
    dim, nd = prob.dim, prob.conn.shape[1]
    rng = np.random.default_rng(0)
    u = 0.02 * rng.standard_normal((prob.n_dof, dim))

    # f64 reference
    conn = np.asarray(prob.conn)
    dN64 = np.asarray(prob.dN_dX, np.float64)
    w64 = np.asarray(prob.w_detJ, np.float64)
    F = np.eye(dim) + np.einsum("enc,eqnd->eqcd", u[conn], dN64)
    J = np.linalg.det(F)
    B = np.einsum("eqcd,eqkd->eqck", F, F)
    I = np.eye(dim)
    sig = (mat.mu / J)[..., None, None] * (B - I) + (
        mat.lambda_ * (J - 1)
    )[..., None, None] * I
    P = J[..., None, None] * np.einsum(
        "eqcd,eqdk->eqck", sig, np.linalg.inv(F).transpose(0, 1, 3, 2)
    )
    r64 = np.einsum("eq,eqnd,eqcd->enc", w64, dN64, P)

    dN_t = jnp.transpose(prob.dN_dX, (3, 2, 0, 1))
    u_el = jnp.asarray(u, jnp.float32)[prob.conn]
    u_q = jnp.broadcast_to(
        jnp.transpose(u_el, (2, 1, 0))[..., None], (dim, nd, n_el, n_q)
    )
    r_pal = neohookean_residual_pallas(
        u_q, dN_t, prob.w_detJ, mat.lambda_, mat.mu, block_e=8,
        interpret=True,
    )
    r_pal = np.transpose(np.asarray(r_pal), (2, 1, 0))
    err = np.abs(r_pal - r64).max()
    assert err < 1e-4 * max(1.0, np.abs(r64).max()), err


@slow
def test_make_step_pallas_residual_matches_xla():
    """residual_impl='pallas' (interpret mode on CPU) reproduces the XLA
    step trajectory."""
    from mimi_tpu.parallel import sharding as sh

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1
    mat.viscosity = -1
    mat.set_young_poisson(2100, 0.3)
    kw = dict(
        rho_inf=0.5,
        dtype=jnp.float32,
        pad_multiple=8,
    )
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1,
        1,
        mat,
        [(1, 0), (1, 1), (1, 2)],
        {1: -3.0},
        **kw,
    )
    carry0 = sh.initial_carry(prob, dt=0.05)
    # fused-sweep kernels (interpret mode on CPU) vs the XLA SoA engine
    step_pc = sh.make_step(
        prob, 0.05, newton_iters=2, solver="cg", cg_iters=40,
        residual_impl="pallas",
    )
    cpc = step_pc(carry0)
    step_xc = sh.make_step(prob, 0.05, newton_iters=2, solver="cg",
                           cg_iters=40, residual_impl="soa")
    cxc = step_xc(carry0)
    scale = float(jnp.abs(cxc["u"]).max())
    err = float(jnp.abs(cxc["u"] - cpc["u"]).max())
    assert err < 1e-4 * max(scale, 1.0), (err, scale)

    with pytest.raises(ValueError):
        sh.make_step(prob, 0.05, residual_impl="bogus")
    # the kernel path requires an iterative solver
    with pytest.raises(ValueError):
        sh.make_step(prob, 0.05, residual_impl="pallas")  # dense default

    # J2Linear plasticity runs through the generic kernels (state,
    # closed-form radial return — no scalar solve)
    j2 = mimi.J2Linear()
    j2.density = 1
    j2.viscosity = -1
    j2.set_young_poisson(2100, 0.3)
    prob_j2 = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1,
        1,
        j2,
        [(1, 0), (1, 1), (1, 2)],
        {1: -3.0},
        **kw,
    )
    step_j2p = sh.make_step(
        prob_j2, 0.05, newton_iters=2, solver="cg", cg_iters=40,
        residual_impl="pallas",
    )
    step_j2s = sh.make_step(
        prob_j2, 0.05, newton_iters=2, solver="cg", cg_iters=40,
        residual_impl="soa",
    )
    c0 = sh.initial_carry(prob_j2, dt=0.05)
    cj_p = step_j2p(c0)
    cj_s = step_j2s(c0)
    err = float(jnp.abs(cj_p["u"] - cj_s["u"]).max())
    assert err < 1e-5, err


@slow
def test_make_step_pallas_bf16_matvec_interpret():
    """matvec_dtype='bf16' (half-width Krylov-operator streams + the
    conv-based matvec scatter on structured grids) stays within the
    documented ~4e-3 operator-perturbation envelope of the f32 step."""
    from mimi_tpu.parallel import sharding as sh

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1
    mat.viscosity = -1
    mat.set_young_poisson(2100, 0.3)
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1,
        1,
        mat,
        [(1, 0), (1, 1), (1, 2)],
        {1: -3.0},
        rho_inf=0.5,
        dtype=jnp.float32,
        pad_multiple=8,
    )
    assert prob.grid is not None  # conv scatter path active under bf16
    outs = {}
    for mv in ("f32", "bf16"):
        # tiny budgets: every interpret-mode GMRES matvec replays the
        # kernel in pure Python (~seconds each)
        step = sh.make_step(
            prob, 0.05, newton_iters=1, solver="cg", cg_iters=8,
            residual_impl="pallas", lin_rel_tol=1e-2, matvec_dtype=mv,
        )
        outs[mv] = np.asarray(step(sh.initial_carry(prob, dt=0.05))["u"])
    scale = np.abs(outs["f32"]).max()
    err = np.abs(outs["f32"] - outs["bf16"]).max()
    # ONE unconverged Newton iteration: the ~4e-3 Krylov-operator
    # perturbation shows at full size (converged solves wash it out to
    # ~1e-6; layout/indexing bugs would show at O(1))
    assert np.isfinite(outs["bf16"]).all()
    assert err < 2e-2 * max(scale, 1e-6), (err, scale)
    # the auto path above used the sum-factorized matvec (prob.sf is
    # built for this polynomial cube patch); the dense kernel must
    # produce the same f32 step to quadrature roundoff
    assert prob.sf is not None
    step_d = sh.make_step(
        prob, 0.05, newton_iters=1, solver="cg", cg_iters=8,
        residual_impl="pallas", lin_rel_tol=1e-2, matvec_dtype="f32",
        matvec_impl="dense",
    )
    u_d = np.asarray(step_d(sh.initial_carry(prob, dt=0.05))["u"])
    err_sf = np.abs(outs["f32"] - u_d).max()
    assert err_sf < 1e-5 * max(scale, 1e-6), (err_sf, scale)


@slow
def test_make_step_pallas_j2_scalar_solve_interpret():
    """The in-kernel J2 radial return (kernel_solver_mode fixed-trip
    scalar solve + lax.cond plastic gating) vs the soa engine — the
    J2Linear case above has no scalar solve, so this is the only CI
    coverage of that kernel path (ADVICE r2).  Tiny: 8 elements, 2
    steps, interpret mode."""
    from mimi_tpu.parallel import sharding as sh

    mat = mimi.J2()
    mat.density = 1
    mat.viscosity = -1
    mat.melting_temperature = 1500
    mat.initial_temperature = 20
    mat.specific_heat = 450
    mat.heat_fraction = 0.9
    mat.set_young_poisson(2100, 0.3)
    h = mimi.PowerLawHardening()
    h.sigma_y, h.n, h.eps0 = 10.0, 2.0, 1e-3  # low yield: plastic flow
    mat.hardening = h
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1,
        1,
        mat,
        [(1, 0), (1, 1), (1, 2)],
        {1: -5.0},
        rho_inf=0.5,
        dtype=jnp.float32,
        pad_multiple=8,
    )
    outs = {}
    for impl in ("pallas", "soa"):
        step = sh.make_step(
            prob, 0.05, newton_iters=3, solver="cg", cg_iters=40,
            residual_impl=impl,
        )
        c = sh.initial_carry(prob, dt=0.05)
        for _ in range(2):
            c = step(c)
        outs[impl] = c
    err = float(
        jnp.abs(outs["pallas"]["u"] - outs["soa"]["u"]).max()
    )
    assert err < 1e-5, err
    # the run actually plasticized (the cond path was taken)
    eqps = outs["soa"]["state"]["eqps"]
    assert float(eqps.max()) > 1e-4, float(eqps.max())
    eqps_p = outs["pallas"]["state"]["eqps"]
    assert float(jnp.abs(eqps_p - eqps).max()) < 1e-5


@slow
def test_pallas_neohookean_tangent_apply_interpret():
    """Fused tangent-apply kernel vs jvp of the f64 residual."""
    from mimi_tpu.parallel import sharding as sh
    from mimi_tpu.ops.pallas_residual import (
        neohookean_tangent_apply_pallas,
    )

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1
    mat.viscosity = -1
    mat.set_young_poisson(2100, 0.3)
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1,
        1,
        mat,
        [(1, 0), (1, 1), (1, 2)],
        {1: -3.0},
        dtype=jnp.float32,
        pad_multiple=8,
    )
    n_el, n_q = prob.w_detJ.shape
    dim, nd = prob.dim, prob.conn.shape[1]
    rng = np.random.default_rng(1)
    u = 0.02 * rng.standard_normal((prob.n_dof, dim))
    w = rng.standard_normal((prob.n_dof, dim))

    conn = jnp.asarray(prob.conn)
    dN64 = jnp.asarray(prob.dN_dX, jnp.float64)
    w64 = jnp.asarray(prob.w_detJ, jnp.float64)
    I = jnp.eye(dim, dtype=jnp.float64)

    def res64(uu):
        F = I + jnp.einsum("enc,eqnd->eqcd", uu[conn], dN64)
        P = jax.vmap(jax.vmap(lambda Fq: mat.pk1(Fq, None, 0.1)))(F)
        return jnp.einsum("eq,eqnd,eqcd->enc", w64, dN64, P)

    _, y64 = jax.jvp(res64, (jnp.asarray(u),), (jnp.asarray(w),))
    y64 = np.asarray(y64)

    dN_t = jnp.transpose(prob.dN_dX, (3, 2, 0, 1))

    def bcast(x):
        return jnp.broadcast_to(
            jnp.transpose(jnp.asarray(x, jnp.float32)[prob.conn], (2, 1, 0))[
                ..., None
            ],
            (dim, nd, n_el, n_q),
        )

    y_pal = neohookean_tangent_apply_pallas(
        bcast(u), bcast(w), dN_t, prob.w_detJ, mat.lambda_, mat.mu,
        block_e=8, interpret=True,
    )
    y_pal = np.transpose(np.asarray(y_pal), (2, 1, 0))
    err = np.abs(y_pal - y64).max()
    assert err < 1e-4 * max(1.0, np.abs(y64).max()), err


@slow
def test_make_step_pallas_symmetric_tangent_storage():
    """tangent_storage='sym' (45 upper-triangle planes instead of 81,
    VERDICT r4 #3): exact for major-symmetric dP/dF, so the step
    trajectory must match full storage to f32 roundoff for NeoHookean;
    guarded off for the measured-asymmetric J2 family."""
    from mimi_tpu.parallel import sharding as sh

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1
    mat.viscosity = 100.0  # exercise the has_visc matvec term too
    mat.set_young_poisson(2100, 0.3)
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1, 1, mat,
        [(1, 0), (1, 1), (1, 2)],
        {1: -3.0},
        rho_inf=0.5, dtype=jnp.float32, pad_multiple=8,
    )
    carry0 = sh.initial_carry(prob, dt=0.05)
    outs = {}
    for storage in ("full", "sym"):
        step = sh.make_step(
            prob, 0.05, newton_iters=3, solver="cg", cg_iters=40,
            residual_impl="pallas", tangent_storage=storage,
        )
        outs[storage] = step(carry0)["u"]
    scale = float(jnp.abs(outs["full"]).max())
    err = float(jnp.abs(outs["full"] - outs["sym"]).max())
    assert scale > 1e-6
    assert err < 1e-6 * max(scale, 1.0), (err, scale)

    # guardrail: sym storage on a material without declared major
    # symmetry is an error, not a silent corruption
    j2 = mimi.J2Linear()
    j2.density = 1
    j2.viscosity = -1
    j2.set_young_poisson(2100, 0.3)
    j2.sigma_y = 10.0
    prob_j2 = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"), 1, 1, j2,
        [(1, 0), (1, 1), (1, 2)], {1: -3.0},
        rho_inf=0.5, dtype=jnp.float32, pad_multiple=8,
    )
    with pytest.raises(ValueError, match="major-symmetric"):
        sh.make_step(
            prob_j2, 0.05, solver="cg", residual_impl="pallas",
            tangent_storage="sym",
        )


@slow
def test_tangent_major_symmetry_flags():
    """Pins the measured symmetry classification the sym-storage gate
    relies on (round-4 probe, docs/ROADMAP.md): hyperelastic energy
    Hessians are symmetric to roundoff; the J2 family's Cauchy->PK1
    geometric terms are NOT."""
    import numpy as np

    rng = np.random.default_rng(3)

    def asym(mat, state, d=3):
        worst = 0.0
        for _ in range(3):
            F0 = jnp.asarray(np.eye(d) + 0.08 * rng.standard_normal((d, d)))
            _, jvp = jax.linearize(
                lambda Ft: mat.pk1(Ft, state, 0.05), F0
            )
            C = np.zeros((d * d, d * d))
            for g in range(d):
                for f in range(d):
                    seed = np.zeros((d, d))
                    seed[g, f] = 1.0
                    C[:, g * d + f] = np.asarray(
                        jvp(jnp.asarray(seed))
                    ).reshape(-1)
            worst = max(
                worst, np.abs(C - C.T).max() / max(np.abs(C).max(), 1e-30)
            )
        return worst

    neo = mimi.CompressibleOgdenNeoHookean()
    neo.set_young_poisson(2100, 0.3)
    assert neo.tangent_major_symmetric
    assert asym(neo, None) < 1e-10

    stvk = mimi.StVenantKirchhoff()
    stvk.set_young_poisson(2100, 0.3)
    assert stvk.tangent_major_symmetric
    assert asym(stvk, None) < 1e-10

    j2 = mimi.J2()
    j2.density = 1.0
    j2.viscosity = -1.0
    j2.melting_temperature = 1500.0
    j2.initial_temperature = 20.0
    j2.specific_heat = 450.0
    j2.heat_fraction = 0.9
    j2.set_young_poisson(2100.0, 0.3)
    h = mimi.JohnsonCookHardening()
    h.A, h.B, h.n = 70.0, 140.0, 0.2835
    j2.hardening = h
    j2.setup(3)
    st = j2.init_state(())
    assert not j2.tangent_major_symmetric
    assert asym(j2, st) > 1e-3  # genuinely asymmetric at plastic states
