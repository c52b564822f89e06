"""Differentiable symmetric matrix log/exp with eigenvalue-degeneracy-safe
JVPs (Daleckii-Krein / Loewner divided differences).

jnp.linalg.eigh's default JVP produces NaNs for repeated eigenvalues, which
happens at every unstrained quadrature point (C = I) — exactly where the
J2Log model starts.  We therefore provide custom JVPs: for f(A) = Q f(L) Q^T
with A = Q L Q^T symmetric,
    df(A)[dA] = Q ( f^[1](L) o (Q^T dA Q) ) Q^T
where f^[1] is the divided-difference matrix, with the diagonal limit f'(l).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _divided_difference(lam, f, fprime):
    """Matrix f^[1]: (f(li)-f(lj))/(li-lj), diagonal/near-degenerate -> f'."""
    li = lam[:, None]
    lj = lam[None, :]
    diff = li - lj
    near = jnp.abs(diff) < 1.0e-12 * (1.0 + jnp.abs(li) + jnp.abs(lj))
    safe = jnp.where(near, 1.0, diff)
    mid = 0.5 * (li + lj)
    return jnp.where(near, fprime(mid), (f(li) - f(lj)) / safe)


def _make_sym_fun(f, fprime):
    @jax.custom_jvp
    def fun(A):
        lam, Q = jnp.linalg.eigh(A)
        return (Q * f(lam)) @ Q.T

    @fun.defjvp
    def fun_jvp(primals, tangents):
        (A,) = primals
        (dA,) = tangents
        lam, Q = jnp.linalg.eigh(A)
        out = (Q * f(lam)) @ Q.T
        dA_sym = 0.5 * (dA + dA.T)
        M = Q.T @ dA_sym @ Q
        D = _divided_difference(lam, f, fprime)
        dout = Q @ (D * M) @ Q.T
        return out, dout

    return fun


logm_sym = _make_sym_fun(jnp.log, lambda x: 1.0 / x)
expm_sym = _make_sym_fun(jnp.exp, jnp.exp)
