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
