"""Multi-patch NURBS meshes (VERDICT round-1 gap #1).

The reference loads any MFEM NURBS mesh — multi-patch included
(/root/reference/src/mimi/py/py_solid.cpp:70-95 rejects only non-NURBS
meshes).  Validation strategy: the two-patch fixture covers [0,2] x [0,1]
split at x=1 with shared interface dofs; the single-patch reference mesh
is the same domain with an interior knot at the split, so after identical
refinement the discrete spaces coincide span-for-span and the solutions
must agree at every control point (matched by reference coordinates —
the dof orders differ).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import mimi_tpu as mimi
from mimi_tpu.nurbs.mesh_io import read_mfem_nurbs_mesh
from mimi_tpu.fem.multipatch import MultiPatchFESpace
from mimi_tpu.parallel import sharding as sh

DATA = os.path.join(os.path.dirname(__file__), "data")
MP = os.path.join(DATA, "two-patch-square.mesh")
SP = os.path.join(DATA, "two-patch-square-ref.mesh")


def test_multipatch_space_counts():
    mesh = read_mfem_nurbs_mesh(MP)
    assert len(mesh.elements) == 2
    fes = MultiPatchFESpace(mesh, elevate=1, subdivide=2)
    # each patch: p=2, 4x4 spans, 6x6 control points; interface column
    # (6 dofs) shared once
    assert fes.n_dof == 2 * 36 - 6
    t = fes.domain_tables(-1)
    assert t.conn.shape[0] == 2 * 16  # elements concatenate patch-wise
    assert t.conn.max() == fes.n_dof - 1
    # interface dofs appear in elements of BOTH patches: exactly the one
    # shared control-point column (6 dofs)
    iface = np.intersect1d(t.conn[:16].ravel(), t.conn[16:].ravel())
    assert len(iface) == 6

    # conservation: sum of w_detJ = domain area (2.0)
    assert np.isclose(t.w_detJ.sum(), 2.0)

    # boundary attributes: left/right 1 side-element column each,
    # bottom/top one per patch
    bt = fes.boundary_tables(-1)
    for attr, n_expect in ((1, 4), (2, 4), (3, 8), (4, 8)):
        assert (bt.attr == attr).sum() == n_expect


def test_multipatch_matches_single_patch_solve():
    """Same discrete space, same physics: control-point trajectories of
    the 2-patch and knot-split single-patch runs must coincide."""

    def run(path):
        mat = mimi.CompressibleOgdenNeoHookean()
        mat.density = 1.0
        mat.viscosity = -1.0
        mat.set_young_poisson(2100.0, 0.3)
        prob = sh.build_problem(
            path,
            elevate=1,
            subdivide=2,
            material=mat,
            dirichlet=[(0, 0), (0, 1)],  # clamp x=0 (attr 1)
            body_force={1: -5.0},
            rho_inf=0.5,
        )
        step = sh.make_step(prob, dt=0.05, newton_iters=20, solver="dense")
        carry = sh.initial_carry(prob)
        for _ in range(5):
            carry = step(carry)
        return prob, np.asarray(carry["u"])

    prob_mp, u_mp = run(MP)
    prob_sp, u_sp = run(SP)
    assert u_mp.shape[0] == u_sp.shape[0]
    assert np.abs(u_mp).max() > 1e-4  # beam actually sags

    # match dofs by (rounded) reference coordinates — raw-float lexsort
    # tie order is not reproducible across the two refinement paths
    x_mp = prob_mp.x_ref
    x_sp = prob_sp.x_ref
    o_mp = np.lexsort((np.round(x_mp[:, 0], 9), np.round(x_mp[:, 1], 9)))
    o_sp = np.lexsort((np.round(x_sp[:, 0], 9), np.round(x_sp[:, 1], 9)))
    assert np.allclose(x_mp[o_mp], x_sp[o_sp], atol=1e-12)
    assert np.allclose(u_mp[o_mp], u_sp[o_sp], atol=1e-9), np.abs(
        u_mp[o_mp] - u_sp[o_sp]
    ).max()


def test_multipatch_interface_continuity():
    """Displacement field is single-valued across the interface by
    construction (shared dofs): check the interface column exists and
    carries identical conn entries from both patches."""
    mesh = read_mfem_nurbs_mesh(MP)
    fes = MultiPatchFESpace(mesh, elevate=1, subdivide=1)
    x = fes.x_ref
    on_iface = np.isclose(x[:, 0], 1.0)
    # 2 patches x (p+2+1...) -> one shared column of control points
    assert on_iface.sum() == fes.patches[0].n_ctrl()[1]
