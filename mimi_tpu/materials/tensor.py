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


def det_small(A):
    """Closed-form determinant for 2x2/3x3 (jnp.linalg.det lowers to a
    generic pivoted LU on TPU — catastrophically slow for tiny batched
    matrices on the critical path)."""
    d = A.shape[-1]
    if d == 2:
        return A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    if d == 3:
        return (
            A[..., 0, 0]
            * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
            - A[..., 0, 1]
            * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
            + A[..., 0, 2]
            * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
        )
    return jnp.linalg.det(A)


def inv_small(A):
    """Closed-form (adjugate) inverse for 2x2/3x3."""
    d = A.shape[-1]
    if d == 2:
        det = det_small(A)
        row0 = jnp.stack([A[..., 1, 1], -A[..., 0, 1]], axis=-1)
        row1 = jnp.stack([-A[..., 1, 0], A[..., 0, 0]], axis=-1)
        return jnp.stack([row0, row1], axis=-2) / det[..., None, None]
    if d == 3:
        det = det_small(A)
        c = lambda i1, j1, i2, j2: (
            A[..., i1, j1] * A[..., i2, j2] - A[..., i1, j2] * A[..., i2, j1]
        )
        adj = jnp.stack(
            [
                jnp.stack([c(1, 1, 2, 2), c(0, 2, 2, 1), c(0, 1, 1, 2)], -1),
                jnp.stack([c(1, 2, 2, 0), c(0, 0, 2, 2), c(0, 2, 1, 0)], -1),
                jnp.stack([c(1, 0, 2, 1), c(0, 1, 2, 0), c(0, 0, 1, 1)], -1),
            ],
            axis=-2,
        )
        return adj / det[..., None, None]
    return jnp.linalg.inv(A)
