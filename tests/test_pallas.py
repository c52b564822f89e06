"""Pallas fused-residual kernel vs f64 reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import mimi_tpu as mimi
from mimi_tpu.ops.pallas_residual import neohookean_residual_pallas

import os

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_pallas_neohookean_residual_interpret():
    from mimi_tpu.parallel import sharding as sh

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1
    mat.viscosity = -1
    mat.set_young_poisson(2100, 0.3)
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1,
        1,
        mat,
        [(1, 0), (1, 1), (1, 2)],
        {1: -3.0},
        dtype=jnp.float32,
        pad_multiple=8,
    )
    n_el, n_q = prob.w_detJ.shape
    dim, nd = prob.dim, prob.conn.shape[1]
    rng = np.random.default_rng(0)
    u = 0.02 * rng.standard_normal((prob.n_dof, dim))

    # f64 reference
    conn = np.asarray(prob.conn)
    dN64 = np.asarray(prob.dN_dX, np.float64)
    w64 = np.asarray(prob.w_detJ, np.float64)
    F = np.eye(dim) + np.einsum("enc,eqnd->eqcd", u[conn], dN64)
    J = np.linalg.det(F)
    B = np.einsum("eqcd,eqkd->eqck", F, F)
    I = np.eye(dim)
    sig = (mat.mu / J)[..., None, None] * (B - I) + (
        mat.lambda_ * (J - 1)
    )[..., None, None] * I
    P = J[..., None, None] * np.einsum(
        "eqcd,eqdk->eqck", sig, np.linalg.inv(F).transpose(0, 1, 3, 2)
    )
    r64 = np.einsum("eq,eqnd,eqcd->enc", w64, dN64, P)

    dN_t = jnp.transpose(prob.dN_dX, (3, 2, 0, 1))
    u_el = jnp.asarray(u, jnp.float32)[prob.conn]
    u_q = jnp.broadcast_to(
        jnp.transpose(u_el, (2, 1, 0))[..., None], (dim, nd, n_el, n_q)
    )
    r_pal = neohookean_residual_pallas(
        u_q, dN_t, prob.w_detJ, mat.lambda_, mat.mu, block_e=8,
        interpret=True,
    )
    r_pal = np.transpose(np.asarray(r_pal), (2, 1, 0))
    err = np.abs(r_pal - r64).max()
    assert err < 1e-4 * max(1.0, np.abs(r64).max()), err


def test_make_step_pallas_residual_matches_xla():
    """residual_impl='pallas' (interpret mode on CPU) reproduces the XLA
    step trajectory."""
    from mimi_tpu.parallel import sharding as sh

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1
    mat.viscosity = -1
    mat.set_young_poisson(2100, 0.3)
    kw = dict(
        rho_inf=0.5,
        dtype=jnp.float32,
        pad_multiple=8,
    )
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1,
        1,
        mat,
        [(1, 0), (1, 1), (1, 2)],
        {1: -3.0},
        **kw,
    )
    carry0 = sh.initial_carry(prob, dt=0.05)
    step_x = sh.make_step(prob, 0.05, newton_iters=3)
    step_p = sh.make_step(prob, 0.05, newton_iters=3, residual_impl="pallas")
    cx, cp = carry0, carry0
    for _ in range(2):
        cx = step_x(cx)
        cp = step_p(cp)
    scale = float(jnp.abs(cx["u"]).max())
    err = float(jnp.abs(cx["u"] - cp["u"]).max())
    assert err < 1e-5 * max(scale, 1.0), (err, scale)

    with pytest.raises(ValueError):
        sh.make_step(prob, 0.05, residual_impl="bogus")
    j2 = mimi.J2Linear()
    j2.density = 1
    j2.viscosity = -1
    j2.set_young_poisson(2100, 0.3)
    prob_j2 = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"),
        1,
        1,
        j2,
        [(1, 0), (1, 1), (1, 2)],
        {1: -3.0},
        **kw,
    )
    with pytest.raises(ValueError):
        sh.make_step(prob_j2, 0.05, residual_impl="pallas")
