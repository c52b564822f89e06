"""Generic fused quadrature-sweep Pallas kernels (any SoA material).

The compiled core's three hot sweeps — operator residual, residual +
element tangent, and the GMRES matvec — as single VMEM-resident kernels
per block of elements.  The XLA SoA engine (parallel/sharding.py) lowers
the same math to ~1.5k unrolled VPU ops whose intermediates spill to HBM
between fusions (measured ~15x off bandwidth bound); here each block's
entire computation stays in VMEM and the tables stream exactly once.

Layout contract (shared with the XLA engine, fem/soa.py): quadrature
batch is (n_q, n_el) — elements on lanes, quads on sublanes — so blocks
tile with zero padding and per-element dof values broadcast along
sublanes.  Tables: dN (nd, dim, n_q, n_el), N (nd, n_q, n_el),
w_detJ (n_q, n_el); element dof values (dim, nd, n_el); material state
as SoA pytrees with (n_q, n_el)-trailing leaves.

Because the materials' `pk1_soa` fast paths are pure elementwise jnp
code (including the radial-return scalar solve, a lax.while_loop with an
implicit-function-theorem JVP), the kernels call them directly — one
generic kernel set serves every SoA material, J2 plasticity included.
The element tangent uses jax.linearize with 9 one-hot seeds inside the
kernel, exactly like the XLA engine.

Gather (u[conn]) and scatter-add stay outside in XLA: they are
dof-indexed, cheap, and XLA's scatter is already efficient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_block_e(n_el: int, limit: int = 256) -> int:
    """Element-block size for the sweep kernels.

    Mosaic requires the minor (lane) block dim to be a multiple of 128
    or equal to the full array extent, so: the whole batch when n_el <=
    limit, else the largest 128-multiple divisor <= limit, else the full
    batch (single block)."""
    if n_el <= limit:
        return n_el
    b = (limit // 128) * 128
    while b >= 128:
        if n_el % b == 0:
            return b
        b -= 128
    return n_el


def _stack2(rows):
    return jnp.stack([jnp.stack(r, 0) for r in rows], 0)


def tri_index_map(d2: int):
    """Upper-triangle plane index for symmetric tangent storage:
    (a, b) with a <= b -> flat index into d2*(d2+1)//2 planes."""
    idx = {}
    k = 0
    for a in range(d2):
        for b in range(a, d2):
            idx[(a, b)] = k
            k += 1
    return idx, k


def sym_basis(dim: int):
    """Symmetric-tensor basis index pairs, row-major upper triangle:
    dim 3 -> [(0,0),(0,1),(0,2),(1,1),(1,2),(2,2)].  The m-th basis
    tensor is S_m = e_ij + e_ji (i != j) or e_ii, so the coefficients of
    sym(dF) in this basis are dF_ii / 0.5 (dF_ij + dF_ji) directly."""
    return [(i, j) for i in range(dim) for j in range(i, dim)]


def cauchy_plane_layout(dim: int):
    """Plane layout of the Cauchy-decomposition tangent block
    (c_storage="cauchy", see Material.tangent_cauchy_decomp):
    [0:n_tri)            M = d sigma/d eps, upper triangle over the
                         sym_basis x sym_basis Voigt matrix (major-
                         symmetric for associated J2 — pinned by test)
    [n_tri:n_tri+n_sym)  sigma entries in sym_basis order
    [+dim*dim)           F^{-1} row-major
    [last]               J = det F
    Total: dim 3 -> 21 + 6 + 9 + 1 = 37 planes (vs 81 full)."""
    n_sym = dim * (dim + 1) // 2
    tri, n_tri = tri_index_map(n_sym)
    return {
        "sym": sym_basis(dim),
        "tri": tri,
        "n_tri": n_tri,
        "off_sig": n_tri,
        "off_fi": n_tri + n_sym,
        "off_j": n_tri + n_sym + dim * dim,
        "n_plane": n_tri + n_sym + dim * dim + 1,
    }


def _grad_interp(dim, nd, w_ref, dn_ref):
    """dF[g,f](q, be) = sum_n w[g,n](be) dN[n,f](q, be).

    The (be,)-lane dof row broadcasts against the (n_q, be) plane via
    trailing-dim rules (no explicit (1, be) reshape — Mosaic chokes on
    degenerate minor dims)."""
    return _stack2(
        [
            [
                sum(
                    dn_ref[n, f, :, :] * w_ref[g, n, :]
                    for n in range(nd)
                )
                for f in range(dim)
            ]
            for g in range(dim)
        ]
    )


def _value_interp(dim, nd, w_ref, n_ref):
    return jnp.stack(
        [
            sum(
                n_ref[n, :, :] * w_ref[c, n, :]
                for n in range(nd)
            )
            for c in range(dim)
        ]
    )


def _scatter_store(dim, nd, w, dn_ref, n_ref, P, vec, out_ref):
    """out[c,n](be) = sum_q w (sum_d dN[n,d] P[c,d] + N[n] vec[c])."""
    for c in range(dim):
        for n in range(nd):
            integ = sum(
                dn_ref[n, dd, :, :] * P[c, dd] for dd in range(dim)
            )
            if vec is not None:
                integ = integ + n_ref[n, :, :] * vec[c]
            out_ref[c, n, :] = jnp.sum(w * integ, axis=0)





def _sf_tiles(b_refs, d_refs, g0, g1, g2, p1):
    """Tile the per-axis 1D basis tables (n_g, p+1, be) to full
    (n_q, be) planes, matching the q = q0 + g0 q1 + g0 g1 q2 fast-axis-
    first quadrature layout (fem/space.py:_tensor_basis_numpy)."""
    f32 = jnp.float32

    def tile0(tab, i):  # pattern repeats every g0 rows
        sl = tab[:, i, :].astype(f32)
        return jnp.concatenate([sl] * (g1 * g2), axis=0)

    def tile1(tab, j):  # constant over g0, cycles with period g0*g1
        sl = tab[:, j, :].astype(f32)
        rep = jnp.repeat(sl, g0, axis=0)
        return jnp.concatenate([rep] * g2, axis=0)

    def tile2(tab, k):  # constant over g0*g1
        sl = tab[:, k, :].astype(f32)
        return jnp.repeat(sl, g0 * g1, axis=0)

    b0r, b1r, b2r = b_refs
    d0r, d1r, d2r = d_refs
    return {
        "0B": [tile0(b0r, i) for i in range(p1)],
        "0D": [tile0(d0r, i) for i in range(p1)],
        "1B": [tile1(b1r, j) for j in range(p1)],
        "1D": [tile1(d1r, j) for j in range(p1)],
        "2B": [tile2(b2r, k) for k in range(p1)],
        "2D": [tile2(d2r, k) for k in range(p1)],
    }


def _sf_interp(w_ref, g, T, ji, dim, p1):
    """Sum-factorized gradient + value interpolation of component g:
    returns ([dF_phys[g][f] for f], vq[g]) from staged partial sums
    over the tiled 1D factors T and the per-qp Jacobian inverse ji."""
    nd = p1**3
    w_g = [w_ref[g, n, :] for n in range(nd)]
    s1B = {}
    s1D = {}
    for i in range(p1):
        for j in range(p1):
            accB = T["2B"][0] * w_g[i + p1 * j]
            accD = T["2D"][0] * w_g[i + p1 * j]
            for k in range(1, p1):
                wn = w_g[i + p1 * j + p1 * p1 * k]
                accB = accB + T["2B"][k] * wn
                accD = accD + T["2D"][k] * wn
            s1B[(i, j)] = accB
            s1D[(i, j)] = accD
    s2BB, s2DB, s2BD = {}, {}, {}
    for i in range(p1):
        aBB = T["1B"][0] * s1B[(i, 0)]
        aDB = T["1D"][0] * s1B[(i, 0)]
        aBD = T["1B"][0] * s1D[(i, 0)]
        for j in range(1, p1):
            aBB = aBB + T["1B"][j] * s1B[(i, j)]
            aDB = aDB + T["1D"][j] * s1B[(i, j)]
            aBD = aBD + T["1B"][j] * s1D[(i, j)]
        s2BB[i] = aBB
        s2DB[i] = aDB
        s2BD[i] = aBD
    d0 = T["0D"][0] * s2BB[0]
    d1 = T["0B"][0] * s2DB[0]
    d2_ = T["0B"][0] * s2BD[0]
    vv = T["0B"][0] * s2BB[0]
    for i in range(1, p1):
        d0 = d0 + T["0D"][i] * s2BB[i]
        d1 = d1 + T["0B"][i] * s2DB[i]
        d2_ = d2_ + T["0B"][i] * s2BD[i]
        vv = vv + T["0B"][i] * s2BB[i]
    dFp = (d0, d1, d2_)
    dF_g = [
        sum(dFp[a] * ji[a][f] for a in range(dim)) for f in range(dim)
    ]
    return dF_g, vv


def _sf_grad_value_interp(w_ref, T, ji, dim, p1):
    """All components: (dF stacked (dim, dim, n_q, be), vq list)."""
    rows, vq = [], []
    for g in range(dim):
        dF_g, vv = _sf_interp(w_ref, g, T, ji, dim, p1)
        rows.append(dF_g)
        vq.append(vv)
    return _stack2(rows), vq


def _sf_value_interp(w_ref, T, dim, p1):
    """Value-only interpolation (B-channel staged sums)."""
    out = []
    for g in range(dim):
        w_g = [w_ref[g, n, :] for n in range(p1**3)]
        vv = None
        for i in range(p1):
            aBB = None
            for j in range(p1):
                accB = None
                for k in range(p1):
                    t = T["2B"][k] * w_g[i + p1 * j + p1 * p1 * k]
                    accB = t if accB is None else accB + t
                t = T["1B"][j] * accB
                aBB = t if aBB is None else aBB + t
            t = T["0B"][i] * aBB
            vv = t if vv is None else vv + t
        out.append(vv)
    return out


def _sf_scatter(out_ref, X, vecm, T, ji, w, dim, p1):
    """Sum-factorized transpose scatter:
    out[c, n] = sum_q dN_xi[n, a] Z[c, a] + N_xi[n] m[c]
    with Z[c, a] = sum_f ji[a][f] (w X[c][f]), m[c] = w vecm[c]."""
    for c in range(dim):
        Z = [
            sum(ji[a][f] * (w * X[c][f]) for f in range(dim))
            for a in range(dim)
        ]
        m = w * vecm[c]
        y0 = [[None] * p1 for _ in range(4)]
        for ch, (Ti, src) in enumerate(
            (
                (T["0D"], Z[0]),
                (T["0B"], Z[1]),
                (T["0B"], Z[2]),
                (T["0B"], m),
            )
        ):
            for i in range(p1):
                y0[ch][i] = Ti[i] * src
        for j in range(p1):
            y1 = [[None] * p1 for _ in range(4)]
            for ch, Tj in enumerate((T["1B"], T["1D"], T["1B"], T["1B"])):
                for i in range(p1):
                    y1[ch][i] = Tj[j] * y0[ch][i]
            for k in range(p1):
                for i in range(p1):
                    n = i + p1 * j + p1 * p1 * k
                    tot = (
                        T["2B"][k] * (y1[0][i] + y1[1][i] + y1[3][i])
                        + T["2D"][k] * y1[2][i]
                    )
                    out_ref[c, n, :] = jnp.sum(tot, axis=0)


def _sf_specs(dim, nd, n_q, n_g, p1, block_e):
    """BlockSpecs for the sum-factorized table streams: six (n_g, p+1,
    be) 1D tables + the (dim, dim, n_q, be) Jacobian inverse."""
    t1d = pl.BlockSpec(
        (n_g, p1, block_e), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    jis = pl.BlockSpec(
        (dim, dim, n_q, block_e),
        lambda i: (0, 0, 0, i),
        memory_space=pltpu.VMEM,
    )
    return [t1d] * 6 + [jis]


def _common_specs(dim, nd, n_q, block_e, has_visc, state_leaves):
    """BlockSpecs for (u_el, a_el[, v_el], dN, N, wdet, *state)."""
    el3 = pl.BlockSpec(
        (dim, nd, block_e), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    dn = pl.BlockSpec(
        (nd, dim, n_q, block_e),
        lambda i: (0, 0, 0, i),
        memory_space=pltpu.VMEM,
    )
    nn = pl.BlockSpec(
        (nd, n_q, block_e), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    wq = pl.BlockSpec(
        (n_q, block_e), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    specs = [el3, el3] + ([el3] if has_visc else []) + [dn, nn, wq]
    for leaf in state_leaves:
        if leaf.ndim == 4:
            specs.append(
                pl.BlockSpec(
                    (leaf.shape[0], leaf.shape[1], n_q, block_e),
                    lambda i: (0, 0, 0, i),
                    memory_space=pltpu.VMEM,
                )
            )
        else:
            specs.append(wq)
    return specs, el3


def make_residual_sweep(
    mat, dt, dim, nd, n_q, n_el, rho, mu_v, has_visc, state,
    block_e=None, interpret=False, sf_mode=False, n_g=None, pp1=None,
):
    """Returns residual(u_el, a_el, v_el, state) -> y_el, all in the
    (dim, nd, n_el) element layout; state may be None.

    y_el[c, n, e] = sum_q w (dN[n,d] (P(F)[c,d] + mu_v dV[c,d])
                             + N[n] rho aq[c])

    sf_mode=True streams the sum-factorization factors instead of the
    dense dN/N tables (see make_matvec_sweep_sf; 3D polynomial patches
    only); the wrapper signature becomes
    residual(u_el, a_el, v_el, state_, b0, d0, b1, d1, b2, d2, jinv, wq).
    """
    import jax.tree_util as jtu

    block_e = block_e or pick_block_e(n_el)
    state_leaves, treedef = jtu.tree_flatten(state)
    n_state = len(state_leaves)
    if sf_mode:
        assert dim == 3 and n_g and pp1 and pp1**3 == nd
    g0 = g1 = g2 = int(n_g) if sf_mode else 0
    p1 = int(pp1) if sf_mode else 0

    def kernel(*refs):
        u_ref, a_ref = refs[0], refs[1]
        idx = 2
        v_ref = None
        if has_visc:
            v_ref = refs[idx]
            idx += 1
        if sf_mode:
            b0r, d0r, b1r, d1r, b2r, d2r, ji_ref, w_ref = refs[
                idx : idx + 8
            ]
            idx += 8
        else:
            dn_ref, n_ref, w_ref = refs[idx : idx + 3]
            idx += 3
        state_refs = refs[idx : idx + n_state]
        out_ref = refs[-1]

        from ..fem import soa as _soa

        if sf_mode:
            T = _sf_tiles(
                (b0r, b1r, b2r), (d0r, d1r, d2r), g0, g1, g2, p1
            )
            ji = [
                [ji_ref[a, f, :, :] for f in range(dim)]
                for a in range(dim)
            ]
            gu, _ = _sf_grad_value_interp(u_ref, T, ji, dim, p1)
            aq = _sf_value_interp(a_ref, T, dim, p1)
            F = _soa.add_diag(gu, 1.0)
        else:
            # F = I + grad u via a diagonal shift: identity tensors
            # (zero constant planes) crash Mosaic's layout pass under AD
            F = _soa.add_diag(_grad_interp(dim, nd, u_ref, dn_ref), 1.0)
        st = jtu.tree_unflatten(treedef, [r[...] for r in state_refs])
        from ..materials import kernel_solver_mode

        with kernel_solver_mode():
            P = mat.pk1_soa(F, st, dt)
        if sf_mode:
            if has_visc:
                dV, _ = _sf_grad_value_interp(v_ref, T, ji, dim, p1)
                P = P + mu_v * dV
            Pl = [[P[c, d] for d in range(dim)] for c in range(dim)]
            _sf_scatter(
                out_ref, Pl, [rho * a for a in aq], T, ji,
                w_ref[:, :], dim, p1,
            )
            return
        if has_visc:
            P = P + mu_v * _grad_interp(dim, nd, v_ref, dn_ref)
        aq = _value_interp(dim, nd, a_ref, n_ref)
        vec = [rho * aq[c] for c in range(dim)]
        _scatter_store(dim, nd, w_ref[:, :], dn_ref, n_ref, P, vec, out_ref)

    if sf_mode:
        el3 = pl.BlockSpec(
            (dim, nd, block_e),
            lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
        wq_s = pl.BlockSpec(
            (n_q, block_e), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        specs = [el3, el3] + ([el3] if has_visc else [])
        specs += _sf_specs(dim, nd, n_q, g0, p1, block_e) + [wq_s]
        for leaf in state_leaves:
            if leaf.ndim == 4:
                specs.append(
                    pl.BlockSpec(
                        (leaf.shape[0], leaf.shape[1], n_q, block_e),
                        lambda i: (0, 0, 0, i),
                        memory_space=pltpu.VMEM,
                    )
                )
            else:
                specs.append(wq_s)
    else:
        specs, el3 = _common_specs(
            dim, nd, n_q, block_e, has_visc, state_leaves
        )
    call = pl.pallas_call(
        kernel,
        grid=(n_el // block_e,),
        in_specs=specs,
        out_specs=el3,
        out_shape=jax.ShapeDtypeStruct((dim, nd, n_el), jnp.float32),
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    if sf_mode:

        def residual_full(u_el, a_el, v_el, state_, *sf_args):
            args = [u_el, a_el] + ([v_el] if has_visc else [])
            return call(*args, *sf_args, *jtu.tree_leaves(state_))

        return residual_full

    def residual_full(u_el, a_el, v_el, state_, dn, nn, wq):
        args = [u_el, a_el] + ([v_el] if has_visc else [])
        return call(*args, dn, nn, wq, *jtu.tree_leaves(state_))

    return residual_full


def make_assemble_sweep(
    mat, dt, dim, nd, n_q, n_el, rho, mu_v, has_visc, state,
    block_e=None, interpret=False, c_dtype=jnp.float32,
    c_storage="full", sf_mode=False, n_g=None, pp1=None,
):
    """Residual + per-qp consistent tangent C[c*dim+d, g*dim+f](q, e) via
    jax.linearize with one-hot seeds, fused in one pass.

    c_dtype: storage dtype of the emitted tangent C.  bfloat16 halves
    the dominant HBM stream of the GMRES matvec (C is read once per
    Krylov iteration); the residual and all in-kernel arithmetic stay
    float32.

    c_storage: "full" (d2, d2, q, e); "sym" — upper-triangle planes
    (d2*(d2+1)//2, q, e), storing (C + C^T)/2, exact for materials with
    major-symmetric dP/dF (hyperelastic energy Hessians:
    `Material.tangent_major_symmetric`; measured round 4: NeoHookean/
    StVK symmetric to 3e-16 while the J2 family's Cauchy->PK1 geometric
    terms break symmetry by 2-16%, docs/ROADMAP.md); or "cauchy" — the
    decomposition block of cauchy_plane_layout (37 planes at dim 3):
    the Voigt material tangent M = d sigma/d eps from 6 symmetric
    linearize seeds of `mat.cauchy_soa`, plus sigma, F^{-1} and J, with
    the exact geometric transform applied per-qp in the matvec kernel.
    Exact for `Material.tangent_cauchy_decomp` materials (small-strain
    J2 family: sigma symmetric, a function of sym(F) only)."""
    import jax.tree_util as jtu

    block_e = block_e or pick_block_e(n_el)
    d2 = dim * dim
    sym = c_storage == "sym"
    cauchy = c_storage == "cauchy"
    tri, n_tri = tri_index_map(d2)
    lay = cauchy_plane_layout(dim)
    state_leaves, treedef = jtu.tree_flatten(state)
    n_state = len(state_leaves)

    if sf_mode:
        assert dim == 3 and n_g and pp1 and pp1**3 == nd
    g0 = g1 = g2 = int(n_g) if sf_mode else 0
    p1 = int(pp1) if sf_mode else 0

    def kernel(*refs):
        u_ref, a_ref = refs[0], refs[1]
        idx = 2
        v_ref = None
        if has_visc:
            v_ref = refs[idx]
            idx += 1
        T = ji = dn_ref = n_ref = None
        if sf_mode:
            b0r, d0r, b1r, d1r, b2r, d2r, ji_ref, w_ref = refs[
                idx : idx + 8
            ]
            idx += 8
            T = _sf_tiles(
                (b0r, b1r, b2r), (d0r, d1r, d2r), g0, g1, g2, p1
            )
            ji = [
                [ji_ref[a, f, :, :] for f in range(dim)]
                for a in range(dim)
            ]
        else:
            dn_ref, n_ref, w_ref = refs[idx : idx + 3]
            idx += 3
        state_refs = refs[idx : idx + n_state]
        out_ref, c_ref = refs[-2], refs[-1]

        from ..fem import soa as _soa

        if sf_mode:
            gu, _ = _sf_grad_value_interp(u_ref, T, ji, dim, p1)
            F = _soa.add_diag(gu, 1.0)
        else:
            F = _soa.add_diag(_grad_interp(dim, nd, u_ref, dn_ref), 1.0)
        st = jtu.tree_unflatten(treedef, [r[...] for r in state_refs])
        from ..materials import kernel_solver_mode

        # Mosaic-safe tangent columns (both storages).  One-hot seeds
        # crash the layout pass (constant-zero slices fold into
        # rank-degenerate zeros), and iota/where-built seeds crash it
        # too; stacked jnp.full planes of {1, 2} survive.  So seed with
        # (basis + ones) and subtract the all-ones direction:
        # C:S = jvp(S + 1) - jvp(1).
        plane = F.shape[2:]

        def seed_for(hot):
            # hot: set of (i, j) entries that get 2.0 instead of 1.0
            return _stack2(
                [
                    [
                        jnp.full(
                            plane,
                            2.0 if (i, j) in hot else 1.0,
                            F.dtype,
                        )
                        for j in range(dim)
                    ]
                    for i in range(dim)
                ]
            )

        if cauchy:
            with kernel_solver_mode():
                sig, jvp_fn = jax.linearize(
                    lambda Ft: mat.cauchy_soa(Ft, st, dt), F
                )
            base = jvp_fn(jnp.ones_like(F))
            SYM, tri6 = lay["sym"], lay["tri"]
            n_sym = len(SYM)
            for m, (i, j) in enumerate(SYM):
                col = jvp_fn(seed_for({(i, j), (j, i)}))
                # col - base = D : S_m with S_m = e_ij + e_ji (i != j)
                # or e_ii.  Stored is the SYMMETRIC Voigt matrix
                # D-hat[a, m] = D_{(a)(m)} = (D:S_m)_a / w_m with
                # w_m = 2 on off-diagonal basis tensors (minor
                # symmetry); without the 1/w_m the mixed diag/off-diag
                # blocks break symmetry by exactly w (measured 1.1%
                # before the fix).  The matvec contracts with the
                # UNhalved coefficients (dF_ij + dF_ji).
                wm = 1.0 if i == j else 0.5
                for a, (ii, jj) in enumerate(SYM):
                    x = (col[ii, jj] - base[ii, jj]) * wm
                    if a == m:
                        c_ref[tri6[(a, m)], :, :] = x.astype(c_dtype)
                    elif a > m:
                        # first visit of pair (m, a): half now ...
                        c_ref[tri6[(m, a)], :, :] = (0.5 * x).astype(
                            c_dtype
                        )
                    else:
                        # ... accumulate the transpose half (m ascends)
                        c_ref[tri6[(a, m)], :, :] = c_ref[
                            tri6[(a, m)], :, :
                        ] + (0.5 * x).astype(c_dtype)
            fi = _soa.inv(F)
            jd = _soa.det(F)
            for a, (ii, jj) in enumerate(SYM):
                c_ref[lay["off_sig"] + a, :, :] = sig[ii, jj].astype(
                    c_dtype
                )
            for r in range(dim):
                for c in range(dim):
                    c_ref[lay["off_fi"] + r * dim + c, :, :] = fi[
                        r, c
                    ].astype(c_dtype)
            c_ref[lay["off_j"], :, :] = jd.astype(c_dtype)
            P = jd * _soa.matmul_nt(sig, fi)
        else:
            with kernel_solver_mode():
                P, jvp_fn = jax.linearize(
                    lambda Ft: mat.pk1_soa(Ft, st, dt), F
                )
            base = jvp_fn(jnp.ones_like(F))
            for g in range(dim):
                for f in range(dim):
                    col = jvp_fn(seed_for({(g, f)}))
                    b = g * dim + f
                    for c in range(dim):
                        for dd in range(dim):
                            a = c * dim + dd
                            x = col[c, dd] - base[c, dd]
                            if not sym:
                                c_ref[a, b, :, :] = x.astype(c_dtype)
                            elif a == b:
                                c_ref[tri[(a, b)], :, :] = x.astype(
                                    c_dtype
                                )
                            elif a > b:
                                # first visit of pair (b, a): half
                                c_ref[tri[(b, a)], :, :] = (
                                    0.5 * x
                                ).astype(c_dtype)
                            else:
                                # second visit (columns ascend): add
                                c_ref[tri[(a, b)], :, :] = c_ref[
                                    tri[(a, b)], :, :
                                ] + (0.5 * x).astype(c_dtype)
        P_eff = P
        if sf_mode:
            if has_visc:
                dV, _ = _sf_grad_value_interp(v_ref, T, ji, dim, p1)
                P_eff = P + mu_v * dV
            aq = _sf_value_interp(a_ref, T, dim, p1)
            Pl = [
                [P_eff[c, d] for d in range(dim)] for c in range(dim)
            ]
            _sf_scatter(
                out_ref, Pl, [rho * a_ for a_ in aq], T, ji,
                w_ref[:, :], dim, p1,
            )
            return
        if has_visc:
            P_eff = P + mu_v * _grad_interp(dim, nd, v_ref, dn_ref)
        aq = _value_interp(dim, nd, a_ref, n_ref)
        vec = [rho * aq[c] for c in range(dim)]
        _scatter_store(
            dim, nd, w_ref[:, :], dn_ref, n_ref, P_eff, vec, out_ref
        )

    if sf_mode:
        el3 = pl.BlockSpec(
            (dim, nd, block_e),
            lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
        wq_s = pl.BlockSpec(
            (n_q, block_e), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        specs = [el3, el3] + ([el3] if has_visc else [])
        specs += _sf_specs(dim, nd, n_q, g0, p1, block_e) + [wq_s]
        for leaf in state_leaves:
            if leaf.ndim == 4:
                specs.append(
                    pl.BlockSpec(
                        (leaf.shape[0], leaf.shape[1], n_q, block_e),
                        lambda i: (0, 0, 0, i),
                        memory_space=pltpu.VMEM,
                    )
                )
            else:
                specs.append(wq_s)
    else:
        specs, el3 = _common_specs(
            dim, nd, n_q, block_e, has_visc, state_leaves
        )
    if sym or cauchy:
        n_pl = lay["n_plane"] if cauchy else n_tri
        c_spec = pl.BlockSpec(
            (n_pl, n_q, block_e),
            lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
        c_shape = jax.ShapeDtypeStruct((n_pl, n_q, n_el), c_dtype)
    else:
        c_spec = pl.BlockSpec(
            (d2, d2, n_q, block_e),
            lambda i: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        )
        c_shape = jax.ShapeDtypeStruct((d2, d2, n_q, n_el), c_dtype)
    call = pl.pallas_call(
        kernel,
        grid=(n_el // block_e,),
        in_specs=specs,
        out_specs=[el3, c_spec],
        out_shape=[
            jax.ShapeDtypeStruct((dim, nd, n_el), jnp.float32),
            c_shape,
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    if sf_mode:

        def assemble_full(u_el, a_el, v_el, state_, *sf_args):
            args = [u_el, a_el] + ([v_el] if has_visc else [])
            return call(*args, *sf_args, *jtu.tree_leaves(state_))

        return assemble_full

    def assemble_full(u_el, a_el, v_el, state_, dn, nn, wq):
        args = [u_el, a_el] + ([v_el] if has_visc else [])
        return call(*args, dn, nn, wq, *jtu.tree_leaves(state_))

    return assemble_full


def _tangent_apply(
    c_ref, dF, dim, fac0, fac1_mu_v, has_visc, c_storage, lay, tri
):
    """dP[c][d](q, be) = fac0 * (dP/dF : dF) (+ fac1 mu_v dF) from the
    streamed tangent block c_ref, for every storage layout ("full",
    "sym", "cauchy" — see make_assemble_sweep).  Shared by the dense-dN
    and sum-factorized matvec kernels."""
    d2 = dim * dim
    sym = c_storage == "sym"
    cauchy = c_storage == "cauchy"
    if cauchy:
        SYM, tri6 = lay["sym"], lay["tri"]
        n_sym = len(SYM)

        def M_at(a, m):
            return c_ref[tri6[(min(a, m), max(a, m))], :, :]

        sig = {}
        for k, (i, j) in enumerate(SYM):
            s = c_ref[lay["off_sig"] + k, :, :]
            sig[(i, j)] = sig[(j, i)] = s
        fi = [
            [
                c_ref[lay["off_fi"] + r * dim + c, :, :]
                for c in range(dim)
            ]
            for r in range(dim)
        ]
        Jd = c_ref[lay["off_j"], :, :]
        # contraction coefficients against the stored D-hat (see
        # make_assemble_sweep): dF_ii / (dF_ij + dF_ji), UNhalved
        cm = [
            dF[i, i] if i == j else dF[i, j] + dF[j, i]
            for (i, j) in SYM
        ]
        dsig = {}
        for a, (i, j) in enumerate(SYM):
            acc = M_at(a, 0) * cm[0]
            for m in range(1, n_sym):
                acc = acc + M_at(a, m) * cm[m]
            dsig[(i, j)] = dsig[(j, i)] = acc
        # P = J sigma F^-T (rebuilt, not streamed)
        P = [
            [
                Jd * sum(sig[(c, e)] * fi[dd][e] for e in range(dim))
                for dd in range(dim)
            ]
            for c in range(dim)
        ]
        trF = sum(
            fi[c][e] * dF[e, c]
            for c in range(dim)
            for e in range(dim)
        )
        # A = dF^T F^-T: A[a][b] = sum_e dF[e,a] F^-1[b,e]
        A = [
            [
                sum(dF[e, a] * fi[b][e] for e in range(dim))
                for b in range(dim)
            ]
            for a in range(dim)
        ]
        dP = [[None] * dim for _ in range(dim)]
        for c in range(dim):
            for dd in range(dim):
                x = (
                    trF * P[c][dd]
                    + Jd
                    * sum(
                        dsig[(c, e)] * fi[dd][e] for e in range(dim)
                    )
                    - sum(P[c][e] * A[e][dd] for e in range(dim))
                )
                dP[c][dd] = fac0 * x
                if has_visc:
                    dP[c][dd] = dP[c][dd] + fac1_mu_v * dF[c, dd]
        return dP

    def C_at(a, k):
        if sym:
            return c_ref[tri[(min(a, k), max(a, k))], :, :]
        return c_ref[a, k, :, :]

    dP = [[None] * dim for _ in range(dim)]
    for c in range(dim):
        for dd in range(dim):
            a = c * dim + dd
            acc = C_at(a, 0) * dF[0, 0]
            for k in range(1, d2):
                acc = acc + C_at(a, k) * dF[k // dim, k % dim]
            dP[c][dd] = fac0 * acc
            if has_visc:
                dP[c][dd] = dP[c][dd] + fac1_mu_v * dF[c, dd]
    return dP


def make_matvec_sweep(
    dim, nd, n_q, n_el, rho, fac0, fac1_mu_v, has_visc,
    block_e=None, interpret=False, c_storage="full",
):
    """J w element sweep given the stored tangent C:
    y_el[c,n] = sum_q w (dN[n,d] (fac0 C:dF + fac1 mu_v dF)[c,d]
                         + N[n] rho wq[c]).

    c_storage="sym": C arrives as upper-triangle planes (45 instead of
    81 at dim 3); c_storage="cauchy": the 37-plane decomposition block
    (cauchy_plane_layout) with the exact geometric transform
        dP = tr(F^-1 dF) P + J (M : sym dF) F^-T - P dF^T F^-T
    applied here per-qp (P = J sigma F^-T rebuilt from the streamed
    sigma/F^-1/J) — cuts the kernel's dominant HBM stream 2.2x for the
    small-strain J2 family; see make_assemble_sweep for validity."""
    block_e = block_e or pick_block_e(n_el)
    d2 = dim * dim
    sym = c_storage == "sym"
    cauchy = c_storage == "cauchy"
    tri, _ = tri_index_map(d2)
    lay = cauchy_plane_layout(dim)

    def kernel(w_el_ref, dn_ref, n_ref, wq_ref, c_ref, out_ref):
        dF = _grad_interp(dim, nd, w_el_ref, dn_ref)
        dP = _tangent_apply(
            c_ref, dF, dim, fac0, fac1_mu_v, has_visc, c_storage,
            lay, tri,
        )
        vq = _value_interp(dim, nd, w_el_ref, n_ref)
        vec = [rho * vq[c] for c in range(dim)]
        w = wq_ref[:, :]
        for c in range(dim):
            for n in range(nd):
                integ = sum(
                    dn_ref[n, dd, :, :] * dP[c][dd] for dd in range(dim)
                )
                integ = integ + n_ref[n, :, :] * vec[c]
                out_ref[c, n, :] = jnp.sum(w * integ, axis=0)

    el3 = pl.BlockSpec(
        (dim, nd, block_e), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    dn = pl.BlockSpec(
        (nd, dim, n_q, block_e),
        lambda i: (0, 0, 0, i),
        memory_space=pltpu.VMEM,
    )
    nn = pl.BlockSpec(
        (nd, n_q, block_e), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    wq = pl.BlockSpec(
        (n_q, block_e), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    if sym or cauchy:
        n_pl = lay["n_plane"] if cauchy else d2 * (d2 + 1) // 2
        c_spec = pl.BlockSpec(
            (n_pl, n_q, block_e),
            lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
    else:
        c_spec = pl.BlockSpec(
            (d2, d2, n_q, block_e),
            lambda i: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        )
    call = pl.pallas_call(
        kernel,
        grid=(n_el // block_e,),
        in_specs=[el3, dn, nn, wq, c_spec],
        out_specs=el3,
        out_shape=jax.ShapeDtypeStruct((dim, nd, n_el), jnp.float32),
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def matvec(w_el, dn, nn_, wq_, C):
        return call(w_el, dn, nn_, wq_, C)

    return matvec


def make_matvec_sweep_sf(
    dim, nd, n_q, n_el, rho, fac0, fac1_mu_v, has_visc,
    block_e=None, interpret=False, c_storage="full", n_g=None, pp1=None,
):
    """Sum-factorized J w sweep (VERDICT r4 next #4 — measured spike).

    Replaces the dense dN/dX (nd*dim*n_q planes/element) and N
    (nd*n_q planes) streams of make_matvec_sweep with the tensor-product
    FACTORS they are built from: per-element 1D basis tables B/D
    (3 axes x n_g x (p+1) rows — ~2% of dN) plus the per-qp geometric
    Jacobian inverse dxi/dX (dim*dim*n_q planes — the non-separable
    part).  The reference exploits the same tensor-product structure
    through MFEM's NURBSext tables
    (/root/reference/src/mimi/utils/precomputed.cpp:264-330).

    Valid for POLYNOMIAL (unit-weight) single-patch bases in 3D: the
    rational quotient breaks separability of dN itself (the builder in
    parallel/sharding.py gates on patch.weights == 1).

    Contractions run as staged partial sums at full (n_q, be) plane
    width (axis-2 first, matching the q = q0 + G0 q1 + G0 G1 q2,
    n = a0 + P0 a1 + P0 P1 a2 fast-axis-first layouts of
    fem/space.py:_tensor_basis_numpy), so the op count stays in the
    same class as the dense kernel while the streams shrink ~3x:

      dF_param[g,a](q) = sum_i T0[a==0? D:B][i] (sum_j T1[...][j]
                          (sum_k T2[...][k] w[g, i+3j+9k]))
      dF = dF_param . Jinv;  dP = fac0 (C : dF) (+ visc)
      out[c, n] = sum_q [sum_a dN_xi[n,a] (Jinv[a,:] . (wq dP[c,:]))]
                  + N_xi[n] (wq rho vq[c])

    Inputs: w_el (dim, nd, n_el); b0,d0,b1,d1,b2,d2 (n_g, p+1, n_el)
    per-axis 1D value/derivative tables; jinv (dim, dim, n_q, n_el);
    wq (n_q, n_el); C (planes, [d2,] n_q, n_el) as in make_matvec_sweep.
    """
    assert dim == 3, "sum-factorized sweep is 3D-only"
    block_e = block_e or pick_block_e(n_el)
    lay = cauchy_plane_layout(dim)
    tri, _ = tri_index_map(dim * dim)
    if n_g is None or pp1 is None:
        raise ValueError("make_matvec_sweep_sf needs n_g and pp1")
    g0 = g1 = g2 = int(n_g)
    p1 = int(pp1)
    assert g0 * g1 * g2 == n_q and p1**3 == nd

    def kernel(w_ref, b0r, d0r, b1r, d1r, b2r, d2r, ji_ref, wq_ref,
               c_ref, out_ref):
        T = _sf_tiles((b0r, b1r, b2r), (d0r, d1r, d2r), g0, g1, g2, p1)
        ji = [
            [ji_ref[a, f, :, :] for f in range(dim)] for a in range(dim)
        ]
        dF, vq = _sf_grad_value_interp(w_ref, T, ji, dim, p1)
        dP = _tangent_apply(
            c_ref, dF, dim, fac0, fac1_mu_v, has_visc, c_storage,
            lay, tri,
        )
        _sf_scatter(
            out_ref, dP, [rho * v for v in vq], T, ji, wq_ref[:, :],
            dim, p1,
        )

    el3 = pl.BlockSpec(
        (dim, nd, block_e), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    t1d = pl.BlockSpec(
        (g0, p1, block_e), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    jis = pl.BlockSpec(
        (dim, dim, n_q, block_e),
        lambda i: (0, 0, 0, i),
        memory_space=pltpu.VMEM,
    )
    wqs = pl.BlockSpec(
        (n_q, block_e), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    if c_storage in ("sym", "cauchy"):
        n_pl = (
            lay["n_plane"]
            if c_storage == "cauchy"
            else (dim * dim) * (dim * dim + 1) // 2
        )
        c_spec = pl.BlockSpec(
            (n_pl, n_q, block_e),
            lambda i: (0, 0, i),
            memory_space=pltpu.VMEM,
        )
    else:
        c_spec = pl.BlockSpec(
            (dim * dim, dim * dim, n_q, block_e),
            lambda i: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        )
    call = pl.pallas_call(
        kernel,
        grid=(n_el // block_e,),
        in_specs=[el3] + [t1d] * 6 + [jis, wqs, c_spec],
        out_specs=el3,
        out_shape=jax.ShapeDtypeStruct((dim, nd, n_el), jnp.float32),
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    def matvec(w_el, b0, d0_, b1, d1_, b2, d2__, jinv, wq_, C):
        return call(w_el, b0, d0_, b1, d1_, b2, d2__, jinv, wq_, C)

    return matvec


def build_sf_tables(patch, x_ref, conn, n_q_axis, dtype=jnp.float32):
    """Host-side factors for make_matvec_sweep_sf on a single
    polynomial patch: per-axis per-element 1D basis tables and the
    per-qp inverse geometric Jacobian.

    Returns (tables, jinv): tables = [B0, D0, B1, D1, B2, D2] each
    (n_g, p+1, n_el) numpy; jinv (dim, dim, n_q, n_el).  Raises
    ValueError for rational patches (the quotient is not separable).
    """
    import numpy as np

    w = np.asarray(patch.weights).ravel()
    if not np.allclose(w, 1.0):
        raise ValueError("sum factorization needs unit weights")
    from ..fem.space import _dim_tables

    d = len(patch.degrees)
    assert d == 3
    tabs = [
        _dim_tables(patch.knot_vectors[ax], patch.degrees[ax], n_q_axis)
        for ax in range(d)
    ]
    spans = [t[0].shape[0] for t in tabs]
    n_el = int(np.prod(spans))
    assert n_el == conn.shape[0]
    pp1 = patch.degrees[0] + 1
    # element e = e0 + S0 e1 + S0 S1 e2 (axis 0 fastest)
    e0 = np.arange(n_el) % spans[0]
    e1 = (np.arange(n_el) // spans[0]) % spans[1]
    e2 = np.arange(n_el) // (spans[0] * spans[1])
    eids = (e0, e1, e2)
    tables = []
    for ax in range(3):
        B = tabs[ax][3][eids[ax]]  # (n_el, n_g, p+1)
        D = tabs[ax][4][eids[ax]]
        tables.append(np.ascontiguousarray(B.transpose(1, 2, 0)))
        tables.append(np.ascontiguousarray(D.transpose(1, 2, 0)))
    # geometric jacobian dX/dxi per qp from the parametric derivative
    # tensor basis and the control points (then per-qp 3x3 inverse).
    # Accumulated per (q, n) so the full (n_el, n_q, nd, 3) parametric
    # derivative table (4.6 GB at 48^3) is never materialized.
    n_g = n_q_axis
    n_q = n_g**3
    B0, D0, B1, D1, B2, D2 = [t.transpose(2, 0, 1) for t in tables]
    xs = np.asarray(x_ref)[np.asarray(conn)]  # (n_el, nd, dim)
    dXdxi = np.zeros((n_el, n_q, 3, 3), np.float64)
    # q = q0 + g q1 + g^2 q2; n = a0 + p a1 + p^2 a2 (axis 0 fastest)
    for q2 in range(n_g):
        for q1 in range(n_g):
            for q0 in range(n_g):
                q = q0 + n_g * q1 + n_g * n_g * q2
                for a2 in range(pp1):
                    for a1 in range(pp1):
                        for a0 in range(pp1):
                            n = a0 + pp1 * a1 + pp1 * pp1 * a2
                            b0 = B0[:, q0, a0]
                            b1 = B1[:, q1, a1]
                            b2 = B2[:, q2, a2]
                            g0v = D0[:, q0, a0] * b1 * b2
                            g1v = b0 * D1[:, q1, a1] * b2
                            g2v = b0 * b1 * D2[:, q2, a2]
                            x_n = xs[:, n, :]  # (n_el, 3)
                            dXdxi[:, q, 0, :] += g0v[:, None] * x_n
                            dXdxi[:, q, 1, :] += g1v[:, None] * x_n
                            dXdxi[:, q, 2, :] += g2v[:, None] * x_n
    inv = np.linalg.inv(dXdxi)  # inv[e,q,d,a]: sum_d M[a,d] inv[d,b]=I
    # wanted: jinv[a, f, q, e] = d xi_a / d X_f = inv[e, q, f, a]
    jinv = np.ascontiguousarray(inv.transpose(3, 2, 1, 0))
    return [np.asarray(t, dtype) for t in tables], np.asarray(jinv, dtype)
