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
    """
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
    }


def make_fdm_apply(fdm, fac0, fac1, dtype):
    """Jittable v_flat -> J_hat^{-1} v_flat from build_fdm_data output."""
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
