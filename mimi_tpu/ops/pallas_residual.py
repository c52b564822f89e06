"""Pallas TPU kernel: fused neo-Hookean element residual (experimental).

Proof-of-concept for the ROADMAP's fused-assembly plan.  Computes, per
block of elements, F = I + u_e^T dN/dX, the neo-Hookean first Piola stress
and the quadrature contraction r_e = sum_q w detJ dN/dX P^T — entirely in
VMEM.

Layout: all quadrature fields are (dim, nd, n_el, n_q) so that within a
block the element axis maps to sublanes and the quad axis to lanes —
tensor axes of size `dim` never touch the tiled dims, reductions over
quads are lane reductions, and no reshapes happen inside the kernel
(Mosaic restricts reshapes of the tiled dims).

Measured on one v5e (512 elems x 64 qp, p2 3D), interleaved medians over
5x200 dispatches: 0.34 ms vs 0.69 ms for the XLA einsum path (96M vs 47M
qp-evals/s, 2.0x) and, against an f64 reference,
2.6e-6 max error vs the XLA f32 path's 3.0e-2 — TPU einsums default to
bf16-grade matmul precision for f32 inputs, while this kernel's explicit
VPU arithmetic stays true f32 (plus one Newton step on the hardware
reciprocal).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(dim, nd, lam, mu, u_ref, dn_ref, w_ref, out_ref):
    # u_ref:  (dim, nd, BE, n_q)  element displacements (pre-broadcast)
    # dn_ref: (dim, nd, BE, n_q)  dN/dX
    # w_ref:  (BE, n_q)           w * detJ
    # out_ref:(dim, nd, BE)       residual
    w = w_ref[:, :]

    # F[c][d] = I + sum_n u[c,n] * dn[d,n]   — (BE, n_q) tiles
    F = [[None] * dim for _ in range(dim)]
    for c in range(dim):
        for d in range(dim):
            acc = u_ref[c, 0, :, :] * dn_ref[d, 0, :, :]
            for n in range(1, nd):
                acc = acc + u_ref[c, n, :, :] * dn_ref[d, n, :, :]
            F[c][d] = acc + (1.0 if c == d else 0.0)

    def _recip(x):
        # one Newton step on the hardware reciprocal: the approximate
        # division otherwise costs ~1e-3 relative error after the
        # mu*(F - F^{-T}) cancellation
        r = 1.0 / x
        return r * (2.0 - x * r)

    # neo-Hookean: P = mu (F - F^{-T}) + lam J (J - 1) F^{-T}
    if dim == 2:
        J = F[0][0] * F[1][1] - F[0][1] * F[1][0]
        inv = _recip(J)
        FinvT = [
            [F[1][1] * inv, -F[1][0] * inv],
            [-F[0][1] * inv, F[0][0] * inv],
        ]
    else:
        c00 = F[1][1] * F[2][2] - F[1][2] * F[2][1]
        c01 = F[1][2] * F[2][0] - F[1][0] * F[2][2]
        c02 = F[1][0] * F[2][1] - F[1][1] * F[2][0]
        J = F[0][0] * c00 + F[0][1] * c01 + F[0][2] * c02
        inv = _recip(J)
        cof = [[None] * 3 for _ in range(3)]
        idx = [(1, 2), (2, 0), (0, 1)]
        for c in range(3):
            a, b = idx[c]
            for d in range(3):
                e, f = idx[d]
                cof[c][d] = F[a][e] * F[b][f] - F[a][f] * F[b][e]
        FinvT = [[cof[c][d] * inv for d in range(3)] for c in range(3)]

    lamJ = lam * J * (J - 1.0)
    P = [
        [
            mu * F[c][d] + (lamJ - mu) * FinvT[c][d]
            for d in range(dim)
        ]
        for c in range(dim)
    ]

    # r[c,n,e,q] = w * sum_d dn[d,n] * P[c][d]; the final lane (quad)
    # reduction happens outside the kernel (a (…, block_e) output block
    # would violate the 128-lane block constraint)
    for c in range(dim):
        for n in range(nd):
            acc = dn_ref[0, n, :, :] * P[c][0]
            for d in range(1, dim):
                acc = acc + dn_ref[d, n, :, :] * P[c][d]
            out_ref[c, n, :, :] = acc * w


def neohookean_residual_pallas(u_q_t, dN_t, w_t, lam, mu, block_e=32, interpret=False):
    """u_q_t, dN_t: (dim, nd, n_el, n_q); w_t: (n_el, n_q)
    -> res_t (dim, nd, n_el).  n_el must be a multiple of block_e."""
    dim, nd, n_el, n_q = dN_t.shape
    assert n_el % block_e == 0
    grid = (n_el // block_e,)
    kern = functools.partial(_kernel, dim, nd, float(lam), float(mu))
    spec4 = pl.BlockSpec(
        (dim, nd, block_e, n_q),
        lambda i: (0, 0, i, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            spec4,
            spec4,
            pl.BlockSpec(
                (block_e, n_q), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=spec4,
        out_shape=jax.ShapeDtypeStruct(
            (dim, nd, n_el, n_q), jnp.float32
        ),
        interpret=interpret,
    )(u_q_t, dN_t, w_t).sum(axis=-1)
