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

The tangent-apply (GMRES/PCG matvec) kernel is larger still: 0.30 ms vs
1.5-1.75 ms for the XLA jvp-of-residual path (109M vs 19-21M qp-evals/s,
5.2x), at 3.5e-5 relative error vs an f64 finite-difference truth where
the XLA f32 jvp shows ~0.19 — derivative arithmetic amplifies the
bf16-grade einsum error badly.  Wired into make_step's iterative solver
it cuts the full neo-Hookean step from 165 ms to 106 ms at 512 elements.
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

    # neo-Hookean: P = mu (F - F^{-T}) + lam J (J - 1) F^{-T}; the
    # Newton-refined reciprocal inside _deformation_and_inverse matters
    # here — the approximate hardware division otherwise costs ~1e-3
    # relative error after the mu*(F - F^{-T}) cancellation
    F, J, FinvT = _deformation_and_inverse(dim, nd, u_ref, dn_ref)

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


def _deformation_and_inverse(dim, nd, u_ref, dn_ref):
    """Shared tile computation: F = I + u dN, J, F^{-T} (adjugate over a
    Newton-refined reciprocal)."""
    F = [[None] * dim for _ in range(dim)]
    for c in range(dim):
        for d in range(dim):
            acc = u_ref[c, 0, :, :] * dn_ref[d, 0, :, :]
            for n in range(1, nd):
                acc = acc + u_ref[c, n, :, :] * dn_ref[d, n, :, :]
            F[c][d] = acc + (1.0 if c == d else 0.0)

    def _recip(x):
        r = 1.0 / x
        return r * (2.0 - x * r)

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
    return F, J, FinvT


def _tangent_kernel(dim, nd, lam, mu, u_ref, wv_ref, dn_ref, w_ref, out_ref):
    # Directional tangent dP = dP/dF : dF for neo-Hookean
    # P = mu F + (lam J (J-1) - mu) F^{-T}:
    #   dP = mu dF + lam (2J-1) J t F^{-T}
    #        - (lam J (J-1) - mu) F^{-T} dF^T F^{-T},
    # with t = tr(F^{-1} dF).
    # u_ref/wv_ref: (dim, nd, BE, n_q) displacement / matvec direction
    # out_ref[c,n] = wdet * sum_d dn[d,n] dP[c][d]  (quads reduced outside)
    w = w_ref[:, :]
    F, J, FinvT = _deformation_and_inverse(dim, nd, u_ref, dn_ref)

    dF = [[None] * dim for _ in range(dim)]
    for c in range(dim):
        for d in range(dim):
            acc = wv_ref[c, 0, :, :] * dn_ref[d, 0, :, :]
            for n in range(1, nd):
                acc = acc + wv_ref[c, n, :, :] * dn_ref[d, n, :, :]
            dF[c][d] = acc

    t = FinvT[0][0] * dF[0][0]
    for c in range(dim):
        for d in range(dim):
            if c or d:
                t = t + FinvT[c][d] * dF[c][d]

    # G = dF^T F^{-T}; M = F^{-T} G
    G = [
        [
            sum(dF[b][a] * FinvT[b][d] for b in range(dim))
            for d in range(dim)
        ]
        for a in range(dim)
    ]
    M = [
        [
            sum(FinvT[c][a] * G[a][d] for a in range(dim))
            for d in range(dim)
        ]
        for c in range(dim)
    ]

    coef_t = lam * (2.0 * J - 1.0) * J * t
    coef_m = lam * J * (J - 1.0) - mu
    dP = [
        [
            mu * dF[c][d] + coef_t * FinvT[c][d] - coef_m * M[c][d]
            for d in range(dim)
        ]
        for c in range(dim)
    ]

    for c in range(dim):
        for n in range(nd):
            acc = dn_ref[0, n, :, :] * dP[c][0]
            for d in range(1, dim):
                acc = acc + dn_ref[d, n, :, :] * dP[c][d]
            out_ref[c, n, :, :] = acc * w


def neohookean_tangent_apply_pallas(
    u_q_t, w_q_t, dN_t, w_t, lam, mu, block_e=32, interpret=False
):
    """Fused GMRES-matvec kernel: y_el = sum_q wdet dN (dP/dF : dF(w)).

    u_q_t, w_q_t, dN_t: (dim, nd, n_el, n_q) — current displacement,
    matvec direction (both pre-broadcast over quads) and dN/dX; w_t:
    (n_el, n_q).  Returns (dim, nd, n_el)."""
    dim, nd, n_el, n_q = dN_t.shape
    assert n_el % block_e == 0
    grid = (n_el // block_e,)
    kern = functools.partial(_tangent_kernel, dim, nd, float(lam), float(mu))
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
    )(u_q_t, w_q_t, dN_t, w_t).sum(axis=-1)


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
