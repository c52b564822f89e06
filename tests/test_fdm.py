"""Unit tests for the tensor-product FDM preconditioner and exact-span
refinement (round-2 additions; see solvers/fdm.py, nurbs/patch.py)."""

import os

import numpy as np
import jax.numpy as jnp

import mimi_tpu as mimi  # noqa: F401  (x64 config side effect)
from mimi_tpu.nurbs.mesh_io import read_mfem_nurbs_mesh
from mimi_tpu.nurbs.topology import build_patch_from_mesh
from mimi_tpu.fem.space import FESpace
from mimi_tpu.solvers.fdm import build_fdm_data, make_fdm_apply
from mimi_tpu.materials import CompressibleOgdenNeoHookean

DATA = os.path.join(os.path.dirname(__file__), "data")


def _fes(spans=4):
    mesh = read_mfem_nurbs_mesh(os.path.join(DATA, "cube-nurbs.mesh"))
    patch, topo, _ = build_patch_from_mesh(mesh)
    patch.elevate_degrees(1)
    patch.refine_to(spans)
    return FESpace(patch, topo)


def _mat():
    m = CompressibleOgdenNeoHookean()
    m.density = 2.0
    m.set_young_poisson(1000.0, 0.3)
    return m


def test_refine_to_exact_span_counts():
    fes = _fes(5)
    assert fes.patch.n_spans() == [5, 5, 5]
    # p=2 clamped: n_ctrl = spans + p
    assert fes.patch.n_ctrl() == [7, 7, 7]
    t = fes.domain_tables(-1)
    assert t.conn.shape[0] == 125
    assert np.isclose(t.w_detJ.sum(), 1.0)  # unit cube volume


def test_fdm_apply_matches_dense_reconstruction():
    """The jitted apply must equal the dense V D^{-1} V^T built by
    explicit Kronecker products — catches einsum-axis/embedding bugs
    in the transform plumbing."""
    fes = _fes(3)
    mat = _mat()
    fdm = build_fdm_data(fes, [(0, 0), (0, 1), (0, 2)], mat)
    assert fdm is not None
    fac0, fac1 = 0.37, 0.0
    apply_ = make_fdm_apply(fdm, fac0, fac1, jnp.float64)
    n_dof = int(np.prod(fdm["nc"]))
    dim = fdm["dim"]
    rng = np.random.default_rng(0)
    v = rng.standard_normal((n_dof, dim))
    out = np.asarray(apply_(jnp.asarray(v.reshape(-1)))).reshape(
        n_dof, dim
    )
    for c in range(dim):
        Ve = [np.asarray(fdm["Ve"][c][ax]) for ax in range(3)]
        lam = [np.asarray(fdm["lam"][c][ax]) for ax in range(3)]
        coef = [
            fac0 * float(fdm["alpha"][c, ax]) + fac1 * fdm["mu_v"]
            for ax in range(3)
        ]
        # grid flattens i-fastest: kron order (axis2, axis1, axis0)
        V = np.kron(np.kron(Ve[2], Ve[1]), Ve[0])
        d = (
            fdm["rho"]
            + coef[0] * lam[0][None, None, :]
            + coef[1] * lam[1][None, :, None]
            + coef[2] * lam[2][:, None, None]
        ).reshape(-1)
        A = V @ np.diag(1.0 / d) @ V.T
        ref = A @ v[:, c]
        err = np.abs(out[:, c] - ref).max() / np.abs(ref).max()
        assert err < 1e-10, (c, err)


def test_fdm_contact_spring_stiffens_normal_axis():
    fes = _fes(3)
    mat = _mat()
    base = build_fdm_data(fes, [(0, 0), (0, 1), (0, 2)], mat)
    # attr 2 (bid 1) is the z=1 face of the cube fixture: spring acts on
    # component z, axis z
    sprung = build_fdm_data(
        fes, [(0, 0), (0, 1), (0, 2)], mat, contact_springs=[(1, 1e6)]
    )
    lam_b = np.asarray(base["lam"][2][2])
    lam_s = np.asarray(sprung["lam"][2][2])
    assert lam_s.max() > 10.0 * lam_b.max()  # penalty dominates
    # other axes/components untouched
    for c in range(3):
        for ax in range(3):
            if (c, ax) == (2, 2):
                continue
            assert np.allclose(
                np.asarray(base["lam"][c][ax]),
                np.asarray(sprung["lam"][c][ax]),
            )
    # apply stays finite and resolves the stiff mode
    apply_ = make_fdm_apply(sprung, 0.1, 0.0, jnp.float64)
    n = int(np.prod(sprung["nc"])) * 3
    out = np.asarray(apply_(jnp.ones(n)))
    assert np.isfinite(out).all()
