"""Functional problem core + multi-chip sharding.

The interactive `NonlinearSolid` session keeps Newton orchestration in
Python for reference-exact line-search control flow.  This module provides
the *compiled* counterpart used for benchmarking and scale-out: one fully
jitted generalized-alpha step (predict -> fixed-trip Newton with the
3-point line search -> correct -> state accumulate) over a pytree problem
description.

Multi-chip design (the TPU-native replacement for the reference's
shared-memory element loop, n_thread_exe.hpp:37-97): a 1D
`jax.sharding.Mesh` over axis "e"; all (n_elem, ...) quadrature tables and
material-state arrays are sharded along "e", dof vectors are replicated.
XLA turns the element-batch scatter-add into local scatters + an
all-reduce over ICI; dot products in CG/Newton reduce with psum.  Elements
are padded with zero-measure entries (w_detJ = 0, dN/dX = 0 -> F = I) to a
multiple of the device count, so padding contributes exactly zero.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fem import kernels as K
from ..fem.space import FESpace
from ..nurbs.mesh_io import read_mfem_nurbs_mesh
from ..nurbs.topology import build_patch_from_mesh
from ..solvers.linear import pcg


@dataclass
class Problem:
    """Pytree-able problem data + static config for the compiled step."""

    material: object
    n_dof: int
    dim: int
    n_el: int
    n_q: int
    # element tables (shardable along axis 0)
    conn: jnp.ndarray
    dN_dX: jnp.ndarray
    w_detJ: jnp.ndarray
    N: jnp.ndarray
    mass_blocks: jnp.ndarray  # scalar blocks, same conn
    # dof data (replicated)
    rhs: jnp.ndarray
    free: jnp.ndarray  # (n_dof, dim) 1.0/0.0
    # gen-alpha factors
    facs: dict
    state0: object  # material state pytree or None

    def tree_arrays(self):
        return [
            "conn",
            "dN_dX",
            "w_detJ",
            "N",
            "mass_blocks",
            "rhs",
            "free",
        ]


def build_problem(
    mesh_path: str,
    elevate: int,
    subdivide: int,
    material,
    dirichlet: list,  # [(bid, dim), ...]
    body_force: dict,  # {dim: value}
    rho_inf: float = 0.25,
    dtype=jnp.float64,
    pad_multiple: int = 1,
) -> Problem:
    mesh = read_mfem_nurbs_mesh(mesh_path)
    patch, topo, _ = build_patch_from_mesh(mesh)
    if elevate > 0:
        patch.elevate_degrees(elevate)
    for _ in range(subdivide):
        patch.uniform_refine()
    fes = FESpace(patch, topo)
    dim = fes.dim
    n_dof = fes.n_dof
    material.setup(dim)

    tables = fes.domain_tables(-1)
    # mass shares the stiffness quadrature (one conn array for sharding;
    # exact for affine geometry, the 2p+3 rule over-integrates mass)
    mass_blocks = K.scalar_blocks_mass(tables, material.density)

    zero_mask = fes.boundary_dof_mask(_merge_dirichlet(dirichlet))
    free = (~zero_mask).astype(np.float64)

    rhs = np.zeros((n_dof, dim))
    if body_force:
        nodal = np.einsum(
            "eq,eqn->en", tables.w_detJ, tables.N, optimize=True
        )
        acc = np.zeros(n_dof)
        np.add.at(acc, tables.conn, nodal)
        for c, val in body_force.items():
            rhs[:, c] += acc * val
        rhs[zero_mask] = 0.0

    n_el, n_q, n_dof_el = tables.N.shape
    # pad element batch
    n_pad = (-n_el) % pad_multiple
    def padel(a, fill=0.0):
        if n_pad == 0:
            return a
        pad_shape = (n_pad,) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, a.dtype)])

    conn = padel(tables.conn, 0)
    dN_dX = padel(tables.dN_dX)
    w_detJ = padel(tables.w_detJ)
    N = padel(tables.N)
    mblocks = padel(mass_blocks)

    rho = min(max(rho_inf, 0.0), 1.0)
    am = (2.0 - rho) / (1.0 + rho)
    af = 1.0 / (1.0 + rho)
    beta = 0.25 * (1.0 + am - af) ** 2
    gamma = 0.5 + am - af
    facs = dict(
        fac0=0.5 - beta / am,
        fac1=af,
        fac1_inv=1.0 / af,
        fac2=af * (1.0 - gamma / am),
        fac3=beta * af / am,
        fac4=gamma * af / am,
        fac5_inv=1.0 / am,
    )

    state0 = (
        material.init_state((n_el + n_pad, n_q))
        if material.has_state
        else None
    )

    cast = lambda a: jnp.asarray(a, dtype) if a.dtype.kind == "f" else jnp.asarray(a)
    return Problem(
        material=material,
        n_dof=n_dof,
        dim=dim,
        n_el=n_el + n_pad,
        n_q=n_q,
        conn=jnp.asarray(conn),
        dN_dX=cast(dN_dX),
        w_detJ=cast(w_detJ),
        N=cast(N),
        mass_blocks=cast(mblocks),
        rhs=cast(rhs),
        free=cast(free),
        facs=facs,
        state0=jax.tree.map(lambda a: jnp.asarray(a, dtype), state0)
        if state0 is not None
        else None,
    )


def _merge_dirichlet(pairs):
    out = {}
    for b, d in pairs:
        out.setdefault(b, set()).add(d)
    return out


def initial_carry(prob: Problem, dt: float = 1.0):
    """Zero fields + the first-step explicit acceleration
    a0 = M^{-1}(f - E(0)) (GeneralizedAlpha2 nstate==0 semantics,
    ode.cpp:38-42).  `dt` only reaches rate-dependent hardening terms; at
    the zero state nothing yields, so any positive value is equivalent
    (the reference evaluates this with its dt defaulted to 0 and relies on
    IEEE inf semantics; a positive dt is the traced-code-safe analog)."""
    z = jnp.zeros((prob.n_dof, prob.dim), prob.rhs.dtype)
    a0 = _explicit_accel(prob, z, z, prob.state0, dt)
    return {"u": z, "v": z, "a": a0, "state": prob.state0}


def _explicit_accel(prob: Problem, u, v, state, dt):
    mat = prob.material
    dim = prob.dim
    n_dof = prob.n_dof
    conn = prob.conn
    free = prob.free
    I = jnp.eye(dim, dtype=prob.rhs.dtype)

    def elem_residual(u_el, dNdX_e, wdet_e, state_e):
        F = I + jnp.einsum("nc,qnd->qcd", u_el, dNdX_e)
        P_ = jax.vmap(lambda Fq, sq: mat.pk1(Fq, sq, dt))(F, state_e)
        return jnp.einsum("q,qnd,qcd->nc", wdet_e, dNdX_e, P_)

    res_el = jax.vmap(elem_residual)(
        u[conn], prob.dN_dX, prob.w_detJ, state
    )
    E_u = jnp.zeros((n_dof, dim), u.dtype).at[conn].add(res_el)
    z = (prob.rhs - E_u) * free

    def mass_apply(w_flat):
        w = w_flat.reshape(n_dof, dim) * free
        ye = jnp.einsum("enm,emc->enc", prob.mass_blocks, w[conn])
        y = jnp.zeros((n_dof, dim), w.dtype).at[conn].add(ye)
        return (
            y * free + w_flat.reshape(n_dof, dim) * (1 - free)
        ).reshape(-1)

    m_diag = jnp.zeros(n_dof, prob.rhs.dtype).at[conn].add(
        jnp.einsum("enn->en", prob.mass_blocks)
    )
    diag = jnp.repeat(m_diag, dim)
    diag = jnp.where(free.reshape(-1) > 0, diag, 1.0)
    a = pcg(mass_apply, z.reshape(-1), diag, rel_tol=1e-8, abs_tol=1e-12,
            max_iter=1000)
    return a.reshape(n_dof, dim) * free


def make_step(
    prob: Problem,
    dt: float,
    newton_iters: int = 4,
    solver: str = "dense",
    cg_iters: int = 200,
    chunk: int | None = None,
    residual_impl: str = "xla",
):
    """Fully jitted generalized-alpha step: carry -> carry.

    Newton runs a fixed trip count with the reference's 3-point-quadratic
    line search; `solver` picks dense LU ("dense") or matrix-free
    Jacobi-preconditioned GMRES ("cg"/"iterative"; the operator apply
    contracts the per-quad material tangent, shared with the Jacobi
    diagonal).

    `residual_impl="pallas"` routes the line-search residual evaluations
    through the fused VMEM kernel (ops/pallas_residual.py: 2x the XLA
    einsum path's throughput and true-f32 accuracy).  Requires a
    neo-Hookean material and a float32 problem; single-chip only (the
    kernel is not shard_map-wrapped yet).  Off TPU it runs in interpret
    mode, so it is correctness-only there.  Step-level effect today is
    small (~2% at 512 elems with GMRES: the step is dominated by the
    fused residual+tangent assembly and matvecs, which stay on the XLA
    path until the tangent kernel lands); the accuracy benefit applies
    to every line-search evaluation it covers.

    All large arrays enter the compiled function as ARGUMENTS — embedding
    them as closure constants makes XLA constant-fold mesh-sized dots at
    compile time (observed: compile time exploding with element count).
    The returned callable is already jitted; do not re-wrap it in jax.jit
    (that would re-embed the arrays as constants).
    """
    mat = prob.material
    dim = prob.dim
    n_dof = prob.n_dof
    f = prob.facs
    I = jnp.eye(dim, dtype=prob.rhs.dtype)
    dt = float(dt)
    fac0 = f["fac3"] * dt * dt
    fac1 = f["fac4"] * dt
    iterative = solver in ("cg", "iterative", "gmres")
    if chunk is not None and prob.n_el % chunk != 0:
        raise ValueError(
            f"chunk ({chunk}) must divide the padded element count "
            f"({prob.n_el}); pass pad_multiple to build_problem"
        )
    use_pallas = residual_impl == "pallas"
    if use_pallas:
        from ..materials import CompressibleOgdenNeoHookean
        from ..ops.pallas_residual import (
            neohookean_residual_pallas,
            neohookean_tangent_apply_pallas,
        )

        if not isinstance(mat, CompressibleOgdenNeoHookean):
            raise ValueError(
                "residual_impl='pallas' supports the neo-Hookean "
                f"material only (got {type(mat).__name__})"
            )
        if prob.rhs.dtype != jnp.float32:
            raise ValueError(
                "residual_impl='pallas' requires a float32 problem"
            )
        _block_e = next(
            b for b in (32, 16, 8, 4, 2, 1) if prob.n_el % b == 0
        )
        _interpret = jax.default_backend() != "tpu"
    elif residual_impl != "xla":
        raise ValueError(f"unknown residual_impl {residual_impl!r}")

    data = {
        "conn": prob.conn,
        "dNdX": prob.dN_dX,
        "wdet": prob.w_detJ,
        "mass_blocks": prob.mass_blocks,
        "rhs": prob.rhs,
        "free": prob.free,
    }
    if use_pallas:
        # (dim, nd, n_el, n_q): element axis on sublanes, quads on lanes
        data["dNdX_t"] = jnp.transpose(prob.dN_dX, (3, 2, 0, 1))

    def pk1_and_tangent(Fq, state_q):
        def fn(Fx):
            P = mat.pk1(Fx, state_q, dt)
            return P, P

        C, P = jax.jacfwd(fn, has_aux=True)(Fq)
        return P, C

    def impl(carry, d):
        conn = d["conn"]
        dNdX = d["dNdX"]
        wdet = d["wdet"]
        mass_blocks = d["mass_blocks"]
        rhs = d["rhs"]
        free = d["free"]

        if use_pallas:
            n_el_, n_q_ = wdet.shape
            nd_ = conn.shape[1]

            def E(u, state):
                u_q = jnp.broadcast_to(
                    jnp.transpose(u[conn], (2, 1, 0))[..., None],
                    (dim, nd_, n_el_, n_q_),
                )
                res_t = neohookean_residual_pallas(
                    u_q,
                    d["dNdX_t"],
                    wdet,
                    mat.lambda_,
                    mat.mu,
                    block_e=_block_e,
                    interpret=_interpret,
                )
                res_el = jnp.transpose(res_t, (2, 1, 0))
                return (
                    jnp.zeros((n_dof, dim), u.dtype).at[conn].add(res_el)
                )

        else:

            def E(u, state):
                F = I + jnp.einsum("enc,eqnd->eqcd", u[conn], dNdX)
                P = jax.vmap(
                    jax.vmap(lambda Fq, sq: mat.pk1(Fq, sq, dt))
                )(F, state)
                res_el = jnp.einsum("eq,eqnd,eqcd->enc", wdet, dNdX, P)
                return (
                    jnp.zeros((n_dof, dim), u.dtype).at[conn].add(res_el)
                )

        def mass_apply(u):
            ye = jnp.einsum("enm,emc->enc", mass_blocks, u[conn])
            return jnp.zeros((n_dof, dim), u.dtype).at[conn].add(ye)

        def residual(aa, xa, va, state):
            temp_x = xa + fac0 * aa
            y = mass_apply(aa * free) + E(temp_x, state)
            return (y - rhs) * free

        def line_search_scale(r, c, aa, xa, va, state):
            q1 = jnp.linalg.norm(r)
            q3 = jnp.linalg.norm(residual(aa - c, xa, va, state))
            q2 = jnp.linalg.norm(residual(aa - 0.5 * c, xa, va, state))
            denom = q1 - 2.0 * q2 + q3
            eps = (3.0 * q1 - 4.0 * q2 + q3) / (4.0 * denom)
            return jnp.where(
                (denom > 0) & (eps > 0) & (eps < 1),
                eps,
                jnp.where(q3 < q1, 1.0, 0.05),
            )

        d2 = dim * dim
        n_el, n_q = wdet.shape

        def assemble_PC_t(aa, xa, state):
            """Residual + material tangent, tangent returned batch-last
            (d2, d2, n_el*n_q).  With `chunk` set, runs as lax.map over
            element blocks so the jacfwd intermediates (whose tiny minor
            dims XLA lane-pads ~19x) stay chunk-sized."""
            temp_x = xa + fac0 * aa

            def block(args):
                conn_c, dN_c, w_c, st_c = args
                F = I + jnp.einsum(
                    "enc,eqnd->eqcd", temp_x[conn_c], dN_c
                )
                P, C = jax.vmap(jax.vmap(pk1_and_tangent))(F, st_c)
                res_el = jnp.einsum("eq,eqnd,eqcd->enc", w_c, dN_c, P)
                n_e_c = w_c.shape[0]
                Ct = C.reshape(n_e_c * n_q, d2, d2).transpose(1, 2, 0)
                return res_el, Ct

            if chunk is None:
                res_el, Ct = block((conn, dNdX, wdet, state))
                rE = (
                    jnp.zeros((n_dof, dim), aa.dtype)
                    .at[conn]
                    .add(res_el)
                )
                return rE, Ct
            n_chunks = n_el // chunk

            def resh(a):
                return a.reshape(n_chunks, chunk, *a.shape[1:])

            args = (
                resh(conn),
                resh(dNdX),
                resh(wdet),
                jax.tree.map(resh, state),
            )
            res_els, Cts = jax.lax.map(block, args)
            rE = (
                jnp.zeros((n_dof, dim), aa.dtype)
                .at[conn]
                .add(res_els.reshape(n_el, -1, dim))
            )
            # (n_chunks, d2, d2, chunk*n_q) -> (d2, d2, n_el*n_q)
            Ct = jnp.moveaxis(Cts, 0, 2).reshape(d2, d2, n_el * n_q)
            return rE, Ct

        def newton_dense(aa, xa, va, state):
            def body(i, aa):
                rE, Ct = assemble_PC_t(aa, xa, state)
                C = Ct.transpose(2, 0, 1).reshape(
                    n_el, n_q, dim, dim, dim, dim
                )
                r = (mass_apply(aa * free) + rE - rhs) * free
                blocks = jnp.einsum(
                    "eq,eqnd,eqcdgf,eqmf->encmg", wdet, dNdX, C, dNdX
                )
                nd = conn.shape[1]
                blocks = blocks.reshape(n_el, nd * dim, nd * dim)
                J = fac0 * K.scatter_dense_vblocks(
                    blocks, conn, n_dof, dim
                ) + K.dense_from_scalar_blocks_jnp(
                    mass_blocks, conn, n_dof, dim
                )
                free_flat = free.reshape(-1)
                J = J * jnp.outer(free_flat, free_flat) + jnp.diag(
                    1.0 - free_flat
                )
                c = jnp.linalg.solve(J, r.reshape(-1)).reshape(n_dof, dim)
                scale = line_search_scale(r, c, aa, xa, va, state)
                return aa - scale * c

            return jax.lax.fori_loop(0, newton_iters, body, aa)

        def newton_gmres(aa, xa, va, state):
            m_diag = jnp.zeros(n_dof, aa.dtype).at[conn].add(
                jnp.einsum("enn->en", mass_blocks)
            )

            def body(i, aa):
                rE, Ct = assemble_PC_t(aa, xa, state)
                r = (mass_apply(aa * free) + rE - rhs) * free

                if use_pallas:
                    # fused VMEM matvec: recomputes F from the current
                    # iterate per apply instead of contracting the stored
                    # (d2, d2, eq) tangent — 5x the einsum path's
                    # throughput and f32-exact (see ops/pallas_residual)
                    nd = conn.shape[1]

                    def bcast_q(x):
                        return jnp.broadcast_to(
                            jnp.transpose(x[conn], (2, 1, 0))[..., None],
                            (dim, nd, n_el, n_q),
                        )

                    x_q = bcast_q(xa + fac0 * aa)

                    def K_apply(w):
                        y_t = neohookean_tangent_apply_pallas(
                            x_q,
                            bcast_q(w),
                            d["dNdX_t"],
                            wdet,
                            mat.lambda_,
                            mat.mu,
                            block_e=_block_e,
                            interpret=_interpret,
                        )
                        y_el = jnp.transpose(y_t, (2, 1, 0))
                        return (
                            jnp.zeros((n_dof, dim), w.dtype)
                            .at[conn]
                            .add(y_el)
                        )

                else:

                    def K_apply(w):
                        w_el = w[conn]
                        # batch-last throughout: dF as (d2, eq)
                        dF_t = jnp.einsum(
                            "emg,eqmf->gfeq", w_el, dNdX
                        ).reshape(d2, n_el * n_q)
                        dP_t = jnp.einsum("abx,bx->ax", Ct, dF_t)
                        dP = jnp.moveaxis(
                            dP_t.reshape(dim, dim, n_el, n_q),
                            (0, 1),
                            (2, 3),
                        )
                        y_el = jnp.einsum(
                            "eq,eqnd,eqcd->enc", wdet, dNdX, dP
                        )
                        return (
                            jnp.zeros((n_dof, dim), w.dtype)
                            .at[conn]
                            .add(y_el)
                        )

                def J_apply(w_flat):
                    w = w_flat.reshape(n_dof, dim) * free
                    y = mass_apply(w) + fac0 * K_apply(w)
                    return (
                        y * free
                        + w_flat.reshape(n_dof, dim) * (1 - free)
                    ).reshape(-1)

                C4 = jnp.moveaxis(
                    Ct.reshape(dim, dim, dim, dim, n_el, n_q),
                    (4, 5),
                    (0, 1),
                )  # (e, q, c, d, g, f)
                k_diag_el = jnp.einsum(
                    "eq,eqnd,eqcdcf,eqnf->enc", wdet, dNdX, C4, dNdX
                )
                k_diag = (
                    jnp.zeros((n_dof, dim), aa.dtype)
                    .at[conn]
                    .add(k_diag_el)
                )
                diag = (m_diag[:, None] + fac0 * k_diag).reshape(-1)
                diag = jnp.where(free.reshape(-1) > 0, diag, 1.0)
                if use_pallas:
                    # gmres goes through lax.custom_linear_solve, which
                    # transposes the operator; pallas_call has no
                    # transpose rule.  The neo-Hookean (hyperelastic)
                    # tangent is symmetric, so Jacobi-PCG applies — and
                    # needs no transposition.
                    c = pcg(
                        J_apply,
                        r.reshape(-1),
                        diag,
                        rel_tol=1e-8,
                        abs_tol=1e-12,
                        max_iter=cg_iters,
                    )
                else:
                    c, _ = jax.scipy.sparse.linalg.gmres(
                        J_apply,
                        r.reshape(-1),
                        tol=1e-8,
                        atol=1e-12,
                        restart=30,
                        maxiter=max(1, cg_iters // 30),
                        M=lambda v: v / diag,
                        solve_method="batched",
                    )
                c = c.reshape(n_dof, dim)
                scale = line_search_scale(r, c, aa, xa, va, state)
                return aa - scale * c

            return jax.lax.fori_loop(0, newton_iters, body, aa)

        newton = newton_gmres if iterative else newton_dense

        def elem_accumulate(u_el, dNdX_e, state_e):
            F = I + jnp.einsum("nc,qnd->qcd", u_el, dNdX_e)
            return jax.vmap(
                lambda Fq, sq: mat.accumulate(Fq, sq, dt)
            )(F, state_e)

        u, v, a, state = (
            carry["u"],
            carry["v"],
            carry["a"],
            carry["state"],
        )
        prev_fac = 1.0 - f["fac1_inv"]
        xa = u + (v + f["fac0"] * dt * a) * f["fac1"] * dt
        va = v + f["fac2"] * dt * a
        aa = newton(jnp.zeros_like(u), xa, va, state)
        xa = xa + fac0 * aa
        va = va + fac1 * aa
        u = u * prev_fac + f["fac1_inv"] * xa
        v = v * prev_fac + f["fac1_inv"] * va
        a = a * prev_fac + f["fac5_inv"] * aa
        if state is not None:
            state = jax.vmap(elem_accumulate, in_axes=(0, 0, 0))(
                u[conn], dNdX, state
            )
        return {"u": u, "v": v, "a": a, "state": state}

    jitted = jax.jit(impl)

    def step(carry):
        return jitted(carry, data)

    return step

def shard_problem(prob: Problem, mesh: Mesh) -> Problem:
    """Places element-axis arrays sharded over mesh axis 'e', dof arrays
    replicated."""
    e_shard = NamedSharding(mesh, P("e"))
    rep = NamedSharding(mesh, P())
    put_e = lambda a: jax.device_put(a, e_shard)
    put_r = lambda a: jax.device_put(a, rep)
    return Problem(
        material=prob.material,
        n_dof=prob.n_dof,
        dim=prob.dim,
        n_el=prob.n_el,
        n_q=prob.n_q,
        conn=put_e(prob.conn),
        dN_dX=put_e(prob.dN_dX),
        w_detJ=put_e(prob.w_detJ),
        N=put_e(prob.N),
        mass_blocks=put_e(prob.mass_blocks),
        rhs=put_r(prob.rhs),
        free=put_r(prob.free),
        facs=prob.facs,
        state0=jax.tree.map(put_e, prob.state0)
        if prob.state0 is not None
        else None,
    )


def make_forward(prob: Problem, dt: float):
    """Jittable forward operator: the Newton residual
    y = M aa + E(xa + fac0 aa) - f with Dirichlet rows masked.  Used by the
    single-chip compile check.  Large arrays are bound as call-time
    arguments (see make_step note on XLA constant folding)."""
    mat = prob.material
    dim = prob.dim
    n_dof = prob.n_dof
    I = jnp.eye(dim, dtype=prob.rhs.dtype)
    fac0 = prob.facs["fac3"] * dt * dt
    data = {
        "conn": prob.conn,
        "dNdX": prob.dN_dX,
        "wdet": prob.w_detJ,
        "mass_blocks": prob.mass_blocks,
        "rhs": prob.rhs,
        "free": prob.free,
    }

    def elem_residual(u_el, dNdX_e, wdet_e, state_e):
        F = I + jnp.einsum("nc,qnd->qcd", u_el, dNdX_e)
        P_ = jax.vmap(lambda Fq, sq: mat.pk1(Fq, sq, dt))(F, state_e)
        return jnp.einsum("q,qnd,qcd->nc", wdet_e, dNdX_e, P_)

    batched_res = jax.vmap(elem_residual, in_axes=(0, 0, 0, 0))

    def impl(aa, xa, va, state, d):
        conn = d["conn"]
        res_el = batched_res(
            (xa + fac0 * aa)[conn], d["dNdX"], d["wdet"], state
        )
        ye = jnp.einsum("enm,emc->enc", d["mass_blocks"], (aa * d["free"])[conn])
        y = jnp.zeros((n_dof, dim), aa.dtype).at[conn].add(ye)
        y = y.at[conn].add(res_el)
        return (y - d["rhs"]) * d["free"]

    jitted = jax.jit(impl)

    def forward(aa, xa, va, state):
        return jitted(aa, xa, va, state, data)

    return forward
