"""Small tensor helpers used by material models (jittable, per-quad-point;
vmapped over the quadrature batch by the assembly kernels).

Math parity with /root/reference/src/mimi/materials/material_utils.hpp.
Eigendecompositions of symmetric 2x2/3x3 matrices use jnp.linalg.eigh
(batched, XLA-lowered) — used by the J2Log (Hencky) model.
"""

from __future__ import annotations

import jax.numpy as jnp


def dev(A, factor=1.0):
    """factor * deviator(A)."""
    d = A.shape[-1]
    tr = jnp.trace(A) / d
    return factor * (A - tr * jnp.eye(d, dtype=A.dtype))


def sym(A):
    return 0.5 * (A + A.swapaxes(-1, -2))


def elastic_strain(F, plastic_strain):
    """sym(F) - I - eps_p (small-strain measure; material_utils.hpp:61-84)."""
    d = F.shape[-1]
    return sym(F) - jnp.eye(d, dtype=F.dtype) - plastic_strain


def fro_norm(A):
    return jnp.sqrt(jnp.sum(A * A))


def log_strain(F_e):
    """E = 0.5 * log(F_e^T F_e) via symmetric eigendecomposition."""
    C = F_e.T @ F_e
    lam, Q = jnp.linalg.eigh(C)
    return 0.5 * (Q * jnp.log(lam)) @ Q.T


def exp_sym(A):
    """Matrix exponential of a symmetric matrix via eigendecomposition."""
    lam, Q = jnp.linalg.eigh(A)
    return (Q * jnp.exp(lam)) @ Q.T
