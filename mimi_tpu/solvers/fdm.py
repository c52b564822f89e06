"""Tensor-product fast-diagonalization (FDM) preconditioner.

The implicit Newton tangent J = M + fac1 S + fac0 K on a single IGA
patch is spectrally close to the separable surrogate (per displacement
component c)

    J_c_hat = rho M1 (x) M2 (x) M3
              + sum_d (fac0 alpha_cd + fac1 mu_v) ... K_d (x) M (x) M ...

with 1D B-spline mass/stiffness matrices M_d, K_d per parametric
direction and alpha_cd = lambda + 2 mu for d == c else mu (the diagonal
blocks of isotropic elasticity).  The generalized eigendecomposition
K_d V_d = M_d V_d Lambda_d (V_d^T M_d V_d = I) diagonalizes the
surrogate, so its exact inverse applies as three dense 1D transforms
per side — small (n_1d x n_1d) matmuls batched over the rest of the
control grid, i.e. MXU work with O(N n_1d) flops:

    J_c_hat^{-1} = (V1 (x) V2 (x) V3) D_c^{-1} (V1 (x) V2 (x) V3)^T,
    D_c = rho + sum_d coef_cd Lambda_d   (broadcast over the grid).

Unlike Jacobi-type preconditioners its quality is h-independent (the
surrogate captures the full elliptic spectrum), which is what the
1e5-element north-star configuration needs — the reference has no
analog (it uses a sparse direct solve, py_nonlinear_solid.cpp:330-343).

Dirichlet faces restrict the 1D matrices per direction and component
(face BCs are tensor-product-exact); the eigenbasis is embedded with
zero rows at constrained indices so no gather/scatter is needed.
Geometry enters through per-axis physical lengths (bounding-box
extents) — exact for axis-aligned boxes, a spectral surrogate
otherwise (GMRES absorbs the difference in a few extra iterations).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _assemble_1d(kv, p, n_gauss, length):
    """1D B-spline mass/stiffness on knot vector kv with physical-length
    scaling: x = a + (L/U) u, so M_phys = (L/U) M_par and
    K_phys = (U/L) K_par."""
    from ..fem.space import _dim_tables
    from ..nurbs import knots as kn

    starts, uq, wq, B, D = _dim_tables(kv, p, n_gauss)
    n = kn.n_ctrl(kv, p)
    M = np.zeros((n, n))
    K = np.zeros((n, n))
    for s in range(len(starts)):
        idx = starts[s] + np.arange(p + 1)
        ix = np.ix_(idx, idx)
        for g in range(uq.shape[1]):
            M[ix] += wq[s, g] * np.outer(B[s, g], B[s, g])
            K[ix] += wq[s, g] * np.outer(D[s, g], D[s, g])
    U = float(kv[-1] - kv[0])
    scale = length / U if U > 0 else 1.0
    return M * scale, K / scale


def build_fdm_data(fes, dir_pairs, material, contact_springs=None):
    """Precompute the per-(component, axis) embedded eigenbases.

    dir_pairs: [(bid, component), ...] — must be face Dirichlet sets
    (the only kind the builder produces).  Returns a numpy dict or None
    when the decomposition does not apply (no elastic constants).

    contact_springs: [(bid, penalty), ...] — penalty contact on face
    `bid` adds kappa * (M x M x e_N e_N^T) to the tangent, which is
    Kronecker-separable: fold kappa/alpha into the face-normal
    component's 1D stiffness as a boundary spring (clamped B-spline
    bases are interpolatory at the ends, so the 1D end function is the
    e_N unit).  Without this, FDM-preconditioned GMRES stalls on
    contact-stiff tangents (penalty ~1e7-1e11 vs moduli ~1e6).

    Multi-patch spaces get the patch-wise additive-Schwarz variant
    (build_fdm_data_multipatch): one separable FDM inverse per patch,
    summed over the shared-interface dofs.
    """
    if not hasattr(fes, "patch"):  # MultiPatchFESpace
        return build_fdm_data_multipatch(
            fes, dir_pairs, material, contact_springs
        )
    lam_e = float(material.lambda_)
    mu_e = float(material.mu)
    if lam_e <= 0 and mu_e <= 0:
        return None
    import scipy.linalg

    patch = fes.patch
    d = fes.para_dim
    nc = list(fes.n_ctrl)
    # physical length per axis from the control-point bounding box
    ext = fes.x_ref.max(axis=0) - fes.x_ref.min(axis=0)
    # (bid -> (axis, end)) from the patch sides
    side_of_bid = {attr - 1: (axis, end) for attr, axis, end, _ in fes.sides}
    # constrained 1D indices per (component, axis)
    constrained = {
        (c, ax): set() for c in range(fes.dim) for ax in range(d)
    }
    for bid, comp in dir_pairs:
        if bid not in side_of_bid:
            return None  # non-face Dirichlet: no tensor structure
        axis, end = side_of_bid[bid]
        constrained[(comp, axis)].add(0 if end == 0 else nc[axis] - 1)

    mats = []
    for ax in range(d):
        p = patch.degrees[ax]
        M, K = _assemble_1d(
            patch.knot_vectors[ax], p, p + 2, float(ext[ax])
        )
        mats.append((M, K))

    alpha0 = np.full((fes.dim, d), mu_e)
    for c in range(min(fes.dim, d)):
        alpha0[c, c] = lam_e + 2.0 * mu_e
    # contact boundary springs on the face-normal component.
    # MIMI_TPU_FDM_SPRING_SCALE (default 1.0) is a tuning probe: the
    # spring models the mortar tangent ~ kappa * (M_f (x) e e^T); the
    # mortar double-averaging (M diag(1/A) M) softens oscillatory modes
    # vs that model, so the best GMRES count may sit off 1.0.
    import os

    s_scale = float(os.environ.get("MIMI_TPU_FDM_SPRING_SCALE", "1.0"))
    springs = {}  # (comp, axis) -> [(end_index, k_over_alpha)]
    for bid, penalty in contact_springs or []:
        if bid not in side_of_bid:
            return None
        axis, end = side_of_bid[bid]
        idx = 0 if end == 0 else nc[axis] - 1
        springs.setdefault((axis, axis), []).append(
            (idx, s_scale * float(penalty) / alpha0[axis, axis])
        )

    Ve = [[None] * d for _ in range(fes.dim)]
    lam = [[None] * d for _ in range(fes.dim)]
    for c in range(fes.dim):
        for ax in range(d):
            M, K = mats[ax]
            if (c, ax) in springs:
                K = K.copy()
                for idx, k_oa in springs[(c, ax)]:
                    K[idx, idx] += k_oa
            free = np.array(
                [
                    i
                    for i in range(nc[ax])
                    if i not in constrained[(c, ax)]
                ]
            )
            w, V = scipy.linalg.eigh(
                K[np.ix_(free, free)], M[np.ix_(free, free)]
            )
            emb = np.zeros((nc[ax], len(free)))
            emb[free, :] = V  # V^T M V = I (scipy type-1 normalization)
            Ve[c][ax] = emb
            lam[c][ax] = w

    alpha = alpha0
    return {
        "Ve": Ve,
        "lam": lam,
        "alpha": alpha,
        "nc": nc,
        "dim": fes.dim,
        "rho": float(material.density),
        "mu_v": max(float(material.viscosity), 0.0),
        # raw ingredients for the contact face-Schur correction
        # (build_contact_face_schur): 1D matrices, constraint sets and
        # the contact side list
        "mats1d": mats,
        "constrained": constrained,
        "contact_sides": [
            (side_of_bid[bid][0], side_of_bid[bid][1], float(penalty))
            for bid, penalty in (contact_springs or [])
            if bid in side_of_bid
        ],
    }


def build_fdm_data_multipatch(fes, dir_pairs, material, contact_springs=None):
    """Patch-wise additive-Schwarz FDM for MultiPatchFESpace (VERDICT r3
    weak #6: multi-patch iterative solves previously fell back to
    block-Jacobi, the O(1/h)-iteration regime the FDM was built to
    escape).

    Each patch is a tensor-product grid, so the single-patch separable
    surrogate applies patch-locally; the preconditioner is the classical
    (minimal-overlap) additive Schwarz sum

        P^{-1} = sum_p R_p^T  J_hat_p^{-1}  R_p

    over the patch dof sets (R_p = the patch's rows of the global
    numbering; interface dofs belong to every adjacent patch, so their
    corrections add).  Dirichlet faces constrain only the patches that
    own them; interfaces are left natural (the rho-weighted mass term
    keeps every local solve SPD).  Contact springs fold into the owning
    patch's face-normal 1D stiffness exactly as in the single-patch
    builder.
    """
    lam_e = float(material.lambda_)
    mu_e = float(material.mu)
    if lam_e <= 0 and mu_e <= 0:
        return None
    import os

    import scipy.linalg

    dim = fes.dim
    d = fes.para_dim
    rho = float(material.density)
    mu_v = max(float(material.viscosity), 0.0)
    s_scale = float(os.environ.get("MIMI_TPU_FDM_SPRING_SCALE", "1.0"))
    spring_of_bid = {
        bid: float(scene_coeff)
        for bid, scene_coeff in (contact_springs or [])
    }
    dir_set = set(dir_pairs)

    alpha0 = np.full((dim, d), mu_e)
    for c in range(min(dim, d)):
        alpha0[c, c] = lam_e + 2.0 * mu_e

    patches_out = []
    gdofs = []
    for p, patch in enumerate(fes.patches):
        nc = list(patch.n_ctrl())
        xs = np.asarray(patch.control_points)
        ext = xs.max(axis=0) - xs.min(axis=0)
        # faces of THIS patch by boundary attribute
        constrained = {
            (c, ax): set() for c in range(dim) for ax in range(d)
        }
        springs = {}
        for attr, pp, axis, end, _sign in fes._bsides:
            if pp != p:
                continue
            bid = attr - 1
            idx = 0 if end == 0 else nc[axis] - 1
            for c in range(dim):
                if (bid, c) in dir_set:
                    constrained[(c, axis)].add(idx)
            if bid in spring_of_bid:
                springs.setdefault((axis, axis), []).append(
                    (idx, s_scale * spring_of_bid[bid] / alpha0[axis, axis])
                )

        mats = []
        for ax in range(d):
            deg = patch.degrees[ax]
            M, K = _assemble_1d(
                patch.knot_vectors[ax], deg, deg + 2, float(ext[ax])
            )
            mats.append((M, K))

        Ve = [[None] * d for _ in range(dim)]
        lam = [[None] * d for _ in range(dim)]
        for c in range(dim):
            for ax in range(d):
                M, K = mats[ax]
                if (c, ax) in springs:
                    K = K.copy()
                    for idx, k_oa in springs[(c, ax)]:
                        K[idx, idx] += k_oa
                free = np.array(
                    [
                        i
                        for i in range(nc[ax])
                        if i not in constrained[(c, ax)]
                    ]
                )
                w, V = scipy.linalg.eigh(
                    K[np.ix_(free, free)], M[np.ix_(free, free)]
                )
                emb = np.zeros((nc[ax], len(free)))
                emb[free, :] = V
                Ve[c][ax] = emb
                lam[c][ax] = w

        patches_out.append(
            {
                "Ve": Ve,
                "lam": lam,
                "alpha": alpha0,
                "nc": nc,
                "dim": dim,
                "rho": rho,
                "mu_v": mu_v,
            }
        )
        gdofs.append(fes._gflat(p).astype(np.int32))

    return {
        "mp": patches_out,
        "gdofs": gdofs,
        "n_dof": int(fes.n_dof),
        "dim": dim,
    }


def make_fdm_apply_multipatch(fdm, fac0, fac1, dtype):
    """Jittable additive-Schwarz apply over the per-patch FDM inverses
    (build_fdm_data_multipatch): v -> sum_p R_p^T J_hat_p^{-1} R_p v."""
    n_dof = fdm["n_dof"]
    dim = fdm["dim"]
    applies = [
        make_fdm_apply(fp, fac0, fac1, dtype) for fp in fdm["mp"]
    ]
    gdofs = [jnp.asarray(g) for g in fdm["gdofs"]]

    def apply(v_flat):
        v = v_flat.reshape(n_dof, dim)
        out = jnp.zeros_like(v)
        for ap, g in zip(applies, gdofs):
            y = ap(v[g].reshape(-1)).reshape(-1, dim)
            out = out.at[g].add(y)
        return out.reshape(-1)

    return apply


def build_contact_face_schur(fdm, fac0, fac1):
    """Dense inverse of the contact face's normal-component diagonal
    block of the preconditioning surrogate — the additive correction
    the separable FDM cannot represent.

    Background (docs/ROADMAP.md round-3 finding): the consistent mortar
    tangent contributes  fac0 * kappa * (M_f diag(1/a) M_f) (x) n n^T
    on the contact face (pressure pass averages kappa*gap with weights
    a_i = int N_i dA; pass 2 integrates it back).  In the FDM eigenbasis
    (V^T M V = I) that operator's mode weights vary by orders of
    magnitude across tangential face modes — mortar double-averaging
    softens oscillatory modes — while the separable boundary spring
    weights every mode equally.  Measured consequence: contact GMRES
    sits at ~30 its/solve (vs ~8 body-force) INSENSITIVE to the spring
    scale.  This builder assembles the face-restricted block

        S_F = [rho M1M2 M3NN + sum_d coef_d (K in slot d) face-restricted]
              + fac0 * kappa * (M1 (x) M2) diag(1/a) (M1 (x) M2)

    for the face-normal displacement component (axis-aligned faces:
    component == face axis), with Dirichlet-constrained face dofs
    replaced by identity rows, and returns its dense inverse plus the
    face-extraction metadata.  Applied additively to the FDM inverse
    (overlapping Schwarz), one (n_face x n_face) MXU matmul per apply.

    The block assumes FULL face engagement (the a_i weights and active
    set of the engaged sweep); partial engagement just weakens the
    preconditioner toward the spring-only behavior.
    """
    import numpy.linalg

    out = []
    if "mp" in fdm:  # multi-patch Schwarz: no single face block (yet)
        return None
    nc = fdm["nc"]
    d = len(nc)
    if d != 3 or not fdm.get("contact_sides"):
        return None
    for axis, end, penalty in fdm["contact_sides"]:
        comp = axis  # face-normal component of an axis-aligned face
        t_axes = [ax for ax in range(3) if ax != axis]
        Ms = {ax: fdm["mats1d"][ax][0] for ax in range(3)}
        Ks = {ax: fdm["mats1d"][ax][1] for ax in range(3)}
        coef = [
            fac0 * float(fdm["alpha"][comp, ax]) + fac1 * fdm["mu_v"]
            for ax in range(3)
        ]
        idxN = 0 if end == 0 else nc[axis] - 1
        mNN = Ms[axis][idxN, idxN]
        kNN = Ks[axis][idxN, idxN]
        a1, a2 = t_axes  # a1 < a2; face grid is (n2, n1) row-major in
        # the volume reshape (nc[2], nc[1], nc[0]) with a2 slower
        M1, M2 = Ms[a1], Ms[a2]
        K1, K2 = Ks[a1], Ks[a2]
        n1, n2 = nc[a1], nc[a2]
        kron = np.kron  # (n2*n1, n2*n1) with a2-major ordering
        A_ff = (
            fdm["rho"] * mNN * kron(M2, M1)
            + coef[a1] * mNN * kron(M2, K1)
            + coef[a2] * mNN * kron(K2, M1)
            + coef[axis] * kNN * kron(M2, M1)
        )
        # mortar double-average: a_i = int N_i dA = rowsum(M1) (x) rowsum(M2)
        a_w = np.kron(M2.sum(axis=1), M1.sum(axis=1))
        Mf = kron(M2, M1)
        S = A_ff + fac0 * float(penalty) * (Mf * (1.0 / a_w)[None, :]) @ Mf
        # Dirichlet-constrained dofs of this (comp): identity rows/cols.
        # A face dof (i1, i2) is constrained when i1/i2 hits a
        # constrained end of its axis, or the face itself lies in a
        # constrained plane of `axis` (then the whole face would be
        # fixed — skip the correction).
        c_ax = fdm["constrained"]
        if idxN in c_ax.get((comp, axis), set()):
            continue
        mask = np.zeros((n2, n1), dtype=bool)
        for i in c_ax.get((comp, a1), set()):
            mask[:, i] = True
        for i in c_ax.get((comp, a2), set()):
            mask[i, :] = True
        fixed = mask.reshape(-1)
        S[fixed, :] = 0.0
        S[:, fixed] = 0.0
        S[fixed, fixed] = 1.0
        S_inv = numpy.linalg.inv(S)
        # zero the identity rows back out: the correction must not
        # touch constrained dofs
        S_inv[fixed, :] = 0.0
        S_inv[:, fixed] = 0.0
        out.append(
            {
                "axis": axis,
                "end": end,
                "comp": comp,
                "S_inv": S_inv,
            }
        )
    return out or None


def make_fdm_schur_apply(fdm, schur, fac0, fac1, dtype):
    """FDM inverse + additive contact face-block correction
    (build_contact_face_schur): v -> fdm_apply(v) + E S_F^{-1} E^T v."""
    base = make_fdm_apply(fdm, fac0, fac1, dtype)
    nc = fdm["nc"]
    dim = fdm["dim"]
    n_dof = int(np.prod(nc))
    blocks = [
        (
            b["axis"],
            b["end"],
            b["comp"],
            jnp.asarray(b["S_inv"], dtype),
        )
        for b in schur
    ]

    def apply(v_flat):
        y = base(v_flat)
        v = v_flat.reshape(n_dof, dim)
        corr = jnp.zeros((n_dof, dim), v.dtype)
        for axis, end, comp, S_inv in blocks:
            g = v[:, comp].reshape(nc[2], nc[1], nc[0])
            sl = [slice(None)] * 3
            sl[2 - axis] = 0 if end == 0 else nc[axis] - 1
            face = g[tuple(sl)]  # (n_a2, n_a1) a2-major
            z = (S_inv @ face.reshape(-1)).reshape(face.shape)
            gz = jnp.zeros_like(g).at[tuple(sl)].set(z)
            corr = corr.at[:, comp].add(gz.reshape(-1))
        return y + corr.reshape(-1)

    return apply


def make_fdm_apply(fdm, fac0, fac1, dtype):
    """Jittable v_flat -> J_hat^{-1} v_flat from build_fdm_data output."""
    if "mp" in fdm:  # multi-patch additive Schwarz
        return make_fdm_apply_multipatch(fdm, fac0, fac1, dtype)
    dim = fdm["dim"]
    nc = fdm["nc"]
    d = len(nc)
    rho = fdm["rho"]
    mu_v = fdm["mu_v"]
    Ve = [
        [jnp.asarray(fdm["Ve"][c][ax], dtype) for ax in range(d)]
        for c in range(dim)
    ]
    D = []
    for c in range(dim):
        coef = [
            fac0 * float(fdm["alpha"][c, ax]) + fac1 * mu_v
            for ax in range(d)
        ]
        if d == 3:
            l0, l1, l2 = (jnp.asarray(fdm["lam"][c][ax]) for ax in range(3))
            Dc = (
                rho
                + coef[0] * l0[None, None, :]
                + coef[1] * l1[None, :, None]
                + coef[2] * l2[:, None, None]
            )
        else:
            l0, l1 = (jnp.asarray(fdm["lam"][c][ax]) for ax in range(2))
            Dc = rho + coef[0] * l0[None, :] + coef[1] * l1[:, None]
        D.append(jnp.asarray(1.0 / Dc, dtype))

    n_dof = int(np.prod(nc))

    if d == 3:

        def apply(v_flat):
            v = v_flat.reshape(n_dof, dim)
            outs = []
            for c in range(dim):
                g = v[:, c].reshape(nc[2], nc[1], nc[0])
                t = jnp.einsum("abi,ik->abk", g, Ve[c][0])
                t = jnp.einsum("aji,jk->aki", t, Ve[c][1])
                t = jnp.einsum("jbi,jk->kbi", t, Ve[c][2])
                t = t * D[c]
                t = jnp.einsum("kbi,jk->jbi", t, Ve[c][2])
                t = jnp.einsum("aki,jk->aji", t, Ve[c][1])
                t = jnp.einsum("abk,ik->abi", t, Ve[c][0])
                outs.append(t.reshape(-1))
            return jnp.stack(outs, -1).reshape(-1)

    else:

        def apply(v_flat):
            v = v_flat.reshape(n_dof, dim)
            outs = []
            for c in range(dim):
                g = v[:, c].reshape(nc[1], nc[0])
                t = jnp.einsum("ai,ik->ak", g, Ve[c][0])
                t = jnp.einsum("ji,jk->ki", t, Ve[c][1])
                t = t * D[c]
                t = jnp.einsum("ki,jk->ji", t, Ve[c][1])
                t = jnp.einsum("ak,ik->ai", t, Ve[c][0])
                outs.append(t.reshape(-1))
            return jnp.stack(outs, -1).reshape(-1)

    return apply
