"""Linear solvers for the Newton step.

Two TPU-native paths replacing the reference's UMFPACK LU
(py_nonlinear_solid.cpp:330-343):

 - dense LU (`jnp.linalg.solve`) on the assembled (n_vdof, n_vdof) matrix:
   exact like UMFPACK, MXU-friendly, right for the reference-scale configs;
 - matrix-free preconditioned CG for large meshes, where the operator apply
   is the fused element-kernel JVP and only the diagonal is assembled.

`pcg` is fully jittable with a fixed iteration cap and tolerance masking,
so it composes into sharded/jitted full steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pcg(A_apply, b, diag_precond, rel_tol=1e-8, abs_tol=1e-12, max_iter=200):
    """Preconditioned conjugate gradients on flat arrays, x0 = 0.

    Stops (by masking further updates) when (z, r) <= max(rel^2 (z0, r0),
    abs^2) — mfem CGSolver semantics.  Runs as lax.while_loop.
    """
    inv_d = 1.0 / diag_precond

    r = b
    z = inv_d * r
    d = z
    nom0 = jnp.dot(z, r)
    stop = jnp.maximum(nom0 * rel_tol * rel_tol, abs_tol * abs_tol)
    x = jnp.zeros_like(b)

    def cond(state):
        x, r, d, nom, it, done = state
        return (~done) & (it < max_iter)

    def body(state):
        x, r, d, nom, it, done = state
        w = A_apply(d)
        den = jnp.dot(d, w)
        alpha = nom / den
        x = x + alpha * d
        r = r - alpha * w
        z = inv_d * r
        betanom = jnp.dot(z, r)
        done_new = betanom <= stop
        beta = betanom / nom
        d = z + beta * d
        return x, r, d, betanom, it + 1, done_new

    x, r, d, nom, it, done = jax.lax.while_loop(
        cond, body, (x, r, d, nom0, jnp.array(0), nom0 <= stop)
    )
    return x


def gmres(
    A_apply,
    b,
    M_apply=None,
    rel_tol=1e-8,
    abs_tol=1e-12,
    restart=30,
    max_iter=200,
    return_info=False,
):
    """Left-preconditioned restarted GMRES, x0 = 0, fully jittable.

    With return_info=True also returns {"iters", "res"} — the total
    Arnoldi iterations actually run (early exit deducted) and the final
    preconditioned residual norm.

    Unlike jax.scipy.sparse.linalg.gmres this does NOT go through
    lax.custom_linear_solve, so the operator is never transposed — it
    composes with pallas_call operators (which have no transpose rule)
    and arbitrary preconditioner applies (block-Jacobi).  The reference
    uses mfem GMRES + diagonal smoother for its iterative option
    (py_nonlinear_solid.cpp:330-343); this is that solver's TPU-native
    analog with Givens-rotation least squares and modified Gram-Schmidt.

    Stops when the preconditioned residual norm falls under
    max(rel_tol*|M^{-1}b|, abs_tol).
    """
    if M_apply is None:
        M_apply = lambda v: v
    n = b.shape[0]
    m = int(restart)
    dtype = b.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)

    r0 = M_apply(b)
    norm_b = jnp.linalg.norm(r0)
    stop = jnp.maximum(rel_tol * norm_b, abs_tol)
    max_cycles = max(1, -(-int(max_iter) // m))

    def cycle(x):
        r = M_apply(b - A_apply(x))
        beta = jnp.linalg.norm(r)
        V = jnp.zeros((m + 1, n), dtype).at[0].set(
            r / jnp.maximum(beta, tiny)
        )
        R = jnp.zeros((m, m), dtype)  # rotated H, upper triangular
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        def cond(c):
            return (c["j"] < m) & (~c["done"])

        def body(c):
            j, V, R, cs, sn, g = (
                c["j"], c["V"], c["R"], c["cs"], c["sn"], c["g"],
            )
            w = M_apply(A_apply(V[j]))
            # modified-Gram-Schmidt against V[0..j] (masked full dots)
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h = (V @ w) * mask
            w = w - h @ V
            h2 = jnp.linalg.norm(w)
            V = V.at[j + 1].set(w / jnp.maximum(h2, tiny))
            # apply stored Givens rotations to the new column
            def rot(i, hc):
                hi = cs[i] * hc[i] + sn[i] * hc[i + 1]
                hi1 = -sn[i] * hc[i] + cs[i] * hc[i + 1]
                return hc.at[i].set(hi).at[i + 1].set(hi1)

            hcol = h.at[j + 1].set(h2)
            hcol = jax.lax.fori_loop(0, j, rot, hcol)
            # new rotation zeroing hcol[j+1]
            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            c_new = hcol[j] / jnp.maximum(denom, tiny)
            s_new = hcol[j + 1] / jnp.maximum(denom, tiny)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            hcol = hcol.at[j].set(
                c_new * hcol[j] + s_new * hcol[j + 1]
            ).at[j + 1].set(0.0)
            R = R.at[:, j].set(hcol[:m])
            g_j1 = -s_new * g[j]
            g = g.at[j + 1].set(g_j1).at[j].set(c_new * g[j])
            res = jnp.abs(g_j1)
            return {
                "j": j + 1,
                "V": V,
                "R": R,
                "cs": cs,
                "sn": sn,
                "g": g,
                "done": res <= stop,
                "res": res,
            }

        init = {
            "j": jnp.int32(0),
            "V": V,
            "R": R,
            "cs": cs,
            "sn": sn,
            "g": g,
            "done": beta <= stop,
            "res": beta,
        }
        fin = jax.lax.while_loop(cond, body, init)
        j_used = fin["j"]
        idx = jnp.arange(m)
        # pad unused columns with identity + zero rhs so y vanishes there
        R_pad = fin["R"] + jnp.diag((idx >= j_used).astype(dtype))
        g_pad = jnp.where(idx < j_used, fin["g"][:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(R_pad, g_pad, lower=False)
        x = x + y @ fin["V"][:m]
        return x, fin["res"], j_used

    def outer_cond(c):
        x, res, k, it = c
        return (res > stop) & (k < max_cycles)

    def outer_body(c):
        x, res, k, it = c
        x, res, j_used = cycle(x)
        return x, res, k + 1, it + j_used

    x0 = jnp.zeros_like(b)
    x, res, k, iters = jax.lax.while_loop(
        outer_cond, outer_body, (x0, norm_b, jnp.int32(0), jnp.int32(0))
    )
    if return_info:
        return x, {"iters": iters, "res": res}
    return x


def block_jacobi_inverse(blocks, free):
    """Closed-form inverse of per-node (dim x dim) diagonal blocks, with
    Dirichlet rows replaced by identity.  blocks: (n_dof, dim, dim);
    free: (n_dof, dim) 1.0/0.0.  Returns inv_blocks (n_dof, dim, dim).

    The reference's iterative option preconditions with a scalar diagonal
    smoother; for contact-stiff tangents (penalty up to 1e11,
    examples/nl_contact.py:86) the per-control-point block captures the
    strong local coupling the scalar diagonal misses.
    """
    dim = blocks.shape[-1]
    eye = jnp.eye(dim, dtype=blocks.dtype)
    # mask Dirichlet rows/cols to identity before inverting
    f = free[..., None]
    B = blocks * f * free[:, None, :] + eye * (1.0 - f)
    if dim == 2:
        det = B[:, 0, 0] * B[:, 1, 1] - B[:, 0, 1] * B[:, 1, 0]
        inv = (
            jnp.stack(
                [
                    jnp.stack([B[:, 1, 1], -B[:, 0, 1]], -1),
                    jnp.stack([-B[:, 1, 0], B[:, 0, 0]], -1),
                ],
                -2,
            )
            / det[:, None, None]
        )
    elif dim == 3:
        a, b_, c = B[:, 0, 0], B[:, 0, 1], B[:, 0, 2]
        d, e, f_ = B[:, 1, 0], B[:, 1, 1], B[:, 1, 2]
        g, h, i = B[:, 2, 0], B[:, 2, 1], B[:, 2, 2]
        A00 = e * i - f_ * h
        A01 = c * h - b_ * i
        A02 = b_ * f_ - c * e
        A10 = f_ * g - d * i
        A11 = a * i - c * g
        A12 = c * d - a * f_
        A20 = d * h - e * g
        A21 = b_ * g - a * h
        A22 = a * e - b_ * d
        det = a * A00 + b_ * A10 + c * A20
        inv = (
            jnp.stack(
                [
                    jnp.stack([A00, A01, A02], -1),
                    jnp.stack([A10, A11, A12], -1),
                    jnp.stack([A20, A21, A22], -1),
                ],
                -2,
            )
            / det[:, None, None]
        )
    else:
        inv = 1.0 / B
    return inv


def block_jacobi_apply(inv_blocks, v_flat):
    """v -> diag-block^{-1} v on the flat (n_dof*dim,) layout."""
    n_dof, dim, _ = inv_blocks.shape
    v = v_flat.reshape(n_dof, dim)
    return jnp.einsum("ncd,nd->nc", inv_blocks, v).reshape(-1)
