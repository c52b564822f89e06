"""Structure-of-arrays (batch-last) small-tensor algebra for the TPU hot
path.

Why this exists: XLA-TPU tiles the minor-most two dimensions of every
materialized buffer to (8, 128) for f32.  The naive batched layout
(n_el, n_q, dim, dim) therefore pads each 3x3 matrix to 8x128 — a ~114x
memory/bandwidth blow-up — which round-1 measurements showed makes every
assembly/matvec ~20-50x slower than the hardware bound (and OOMed the 32k
-element tangent at 34 GB).  The fix is the classic structure-of-arrays
layout: small tensor indices LEADING, the large quadrature batch (..., e,
q) TRAILING, so every materialized intermediate is a densely tiled (e, q)
plane and the d/d2 loops unroll into fused VPU code.

A "tensor" here is a jnp array of shape (d, d, *batch), a "vector"
(d, *batch), a "scalar" (*batch).  All ops unroll the small dims in
Python; everything stays elementwise over the batch, which XLA fuses.

This is the TPU-native replacement for the reference's per-quad
DenseMatrix work-data loop (/root/reference/src/mimi/integrators/
integrator_utils.hpp:14-115) and the layout contract for the materials'
`pk1_soa` fast path.
"""

from __future__ import annotations

import jax.numpy as jnp


def stack2(rows):
    """[[scalar]] -> (d, d, *batch)."""
    return jnp.stack([jnp.stack(r, 0) for r in rows], 0)


def transpose(A):
    return jnp.swapaxes(A, 0, 1)


def add_diag(A, c):
    """A + c*I without materializing an identity tensor: Mosaic's layout
    pass crashes on constant-zero planes (however built) once AD
    multiplies tangents into them, so diagonal shifts are expressed as
    Python-level branches instead of eye() arithmetic."""
    d = A.shape[0]
    return stack2(
        [
            [A[i, j] + c if i == j else A[i, j] for j in range(d)]
            for i in range(d)
        ]
    )


def trace(A):
    d = A.shape[0]
    out = A[0, 0]
    for i in range(1, d):
        out = out + A[i, i]
    return out


def sym(A):
    # slice-wise rather than 0.5*(A + swapaxes(A)): the leading-dim
    # transpose composed with downstream slicing crashes Mosaic's
    # layout inference under AD
    d = A.shape[0]
    return stack2(
        [
            [0.5 * (A[i, j] + A[j, i]) for j in range(d)]
            for i in range(d)
        ]
    )


def matmul(A, B):
    """C[i,j] = sum_k A[i,k] B[k,j]."""
    d = A.shape[0]
    return stack2(
        [
            [
                sum(A[i, k] * B[k, j] for k in range(d))
                for j in range(B.shape[1])
            ]
            for i in range(d)
        ]
    )


def matmul_nt(A, B):
    """A @ B^T."""
    d = A.shape[0]
    return stack2(
        [
            [
                sum(A[i, k] * B[j, k] for k in range(A.shape[1]))
                for j in range(B.shape[0])
            ]
            for i in range(d)
        ]
    )


def matmul_tn(A, B):
    """A^T @ B."""
    return stack2(
        [
            [
                sum(A[k, i] * B[k, j] for k in range(A.shape[0]))
                for j in range(B.shape[1])
            ]
            for i in range(A.shape[1])
        ]
    )


def dev(A, factor=1.0):
    """factor * deviator(A)."""
    d = A.shape[0]
    tr_over_d = trace(A) / d
    return stack2(
        [
            [
                factor * (A[i, j] - tr_over_d)
                if i == j
                else factor * A[i, j]
                for j in range(d)
            ]
            for i in range(d)
        ]
    )


def fro_norm(A):
    d = A.shape[0]
    s = sum(A[i, j] * A[i, j] for i in range(d) for j in range(d))
    return jnp.sqrt(s)


def ddot(A, B):
    """Full contraction sum_ij A[i,j] B[i,j]."""
    d = A.shape[0]
    return sum(A[i, j] * B[i, j] for i in range(d) for j in range(d))


def det(A):
    d = A.shape[0]
    if d == 2:
        return A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    if d == 3:
        return (
            A[0, 0] * (A[1, 1] * A[2, 2] - A[1, 2] * A[2, 1])
            - A[0, 1] * (A[1, 0] * A[2, 2] - A[1, 2] * A[2, 0])
            + A[0, 2] * (A[1, 0] * A[2, 1] - A[1, 1] * A[2, 0])
        )
    raise NotImplementedError(d)


def inv(A):
    """Closed-form (adjugate) inverse, 2x2/3x3."""
    d = A.shape[0]
    detA = det(A)
    if d == 2:
        return stack2(
            [
                [A[1, 1] / detA, -A[0, 1] / detA],
                [-A[1, 0] / detA, A[0, 0] / detA],
            ]
        )
    if d == 3:
        c = lambda i1, j1, i2, j2: (
            A[i1, j1] * A[i2, j2] - A[i1, j2] * A[i2, j1]
        )
        inv_det = 1.0 / detA
        return stack2(
            [
                [
                    c(1, 1, 2, 2) * inv_det,
                    c(0, 2, 2, 1) * inv_det,
                    c(0, 1, 1, 2) * inv_det,
                ],
                [
                    c(1, 2, 2, 0) * inv_det,
                    c(0, 0, 2, 2) * inv_det,
                    c(0, 2, 1, 0) * inv_det,
                ],
                [
                    c(1, 0, 2, 1) * inv_det,
                    c(0, 1, 2, 0) * inv_det,
                    c(0, 0, 1, 1) * inv_det,
                ],
            ]
        )
    raise NotImplementedError(d)


def scale_add(a, A, b, B):
    """a*A + b*B elementwise (scalars a, b broadcastable)."""
    return a * A + b * B


def to_soa(A):
    """(*batch, d, d) -> (d, d, *batch)."""
    return jnp.moveaxis(A, (-2, -1), (0, 1))


def from_soa(A):
    """(d, d, *batch) -> (*batch, d, d)."""
    return jnp.moveaxis(A, (0, 1), (-2, -1))


def state_to_soa(state):
    """Per-quad layout -> SoA layout for a material-state pytree over an
    (n_el, n_q) batch: tensor leaves (e, q, d, d) -> (d, d, q, e), scalar
    leaves (e, q) -> (q, e).

    The (q, e) batch order puts elements on TPU lanes (n_el is large and
    128-divisible in practice) and quadrature points on sublanes (n_q is
    a multiple of 8), so SoA planes tile with zero padding and
    per-element scalars broadcast along sublanes — the layout both the
    XLA SoA engine and the Pallas sweep kernels consume.
    """
    import jax

    def conv(a):
        if a.ndim == 4:
            return jnp.transpose(a, (2, 3, 1, 0))
        return jnp.swapaxes(a, 0, 1)

    return jax.tree.map(conv, state)


def state_from_soa(state):
    import jax

    def conv(a):
        if a.ndim == 4:
            return jnp.transpose(a, (3, 2, 0, 1))
        return jnp.swapaxes(a, 0, 1)

    return jax.tree.map(conv, state)
