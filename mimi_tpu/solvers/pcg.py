"""Jacobi-preconditioned conjugate gradients with mfem's CGSolver stopping
semantics.

Used for the first-step explicit acceleration solve a = M^{-1} z, where the
reference runs mfem CG + DSmoother to (rel 1e-8, abs 1e-12)
(/root/reference/src/mimi/operators/nonlinear_solid.hpp:38-42, .cpp:39-50).
Reproducing the same iteration (rather than solving exactly) keeps the
time-discrete trajectory maximally close to the reference's, which matters
because plasticity amplifies iterate-level differences over steps.

Convergence test parity with mfem::CGSolver::Mult: monitor nom = (z, r) with
z = D^{-1} r, stop when nom <= max(rel_tol^2 * nom0, abs_tol^2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def jacobi_pcg(A_apply, diag, b, rel_tol=1e-8, abs_tol=1e-12, max_iter=1000):
    """Flat arrays; A_apply: x -> A x. Returns solution x (x0 = 0)."""
    inv_d = 1.0 / diag

    r = b
    z = inv_d * r
    d = z
    nom0 = nom = jnp.dot(z, r)
    r0 = jnp.maximum(nom0 * rel_tol * rel_tol, abs_tol * abs_tol)
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
        done_new = betanom <= r0
        beta = betanom / nom
        d_new = jnp.where(done_new, d, z + beta * d)
        return x, r, d_new, betanom, it + 1, done_new

    done0 = nom <= r0
    x, r, d, nom, it, done = jax.lax.while_loop(
        cond, body, (x, r, d, nom, jnp.array(0), done0)
    )
    return x
