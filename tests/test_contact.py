"""Contact tests: closest-point queries, mortar pressure physics, and an
nl_contact-style trajectory (examples/nl_contact.py workflow).

The reference validates contact only through its examples; since the C++
reference cannot be built here, these tests assert the physics invariants
(gap sign conventions, repulsion direction, penetration ~ pressure/penalty,
displacement tracking the rigid tool) plus exercise the full residual+grad
assembly path with Newton.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import mimi_tpu as mimi
from mimi_tpu.splines import Bezier

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_closest_point_and_gap_sign():
    line = Bezier([1], [[-1.0, 1.0], [2.0, 1.0]])
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(line)
    scene.plant_kd_tree(1000, 1)
    bq = scene.make_batched_query()
    data = scene.scene_data()
    qs = jnp.asarray([[0.5, 0.9], [0.5, 1.05], [0.2, 1.0]])
    res = bq(qs, data)
    # foot points on the line
    assert np.allclose(np.asarray(res["physical"])[:, 1], 1.0, atol=1e-10)
    # normal (0,-1): tangent +x convention (nearest_distance.hpp:139-184)
    assert np.allclose(np.asarray(res["normal"]), [[0, -1]] * 3, atol=1e-10)
    # gap: positive below (separated), negative above (penetrating)
    g = np.asarray(res["normal_gap"])
    assert g[0] > 0 and g[1] < 0 and abs(g[2]) < 1e-9
    assert np.isclose(g[0], 0.1) and np.isclose(g[1], -0.05)


def test_closest_point_curved():
    # quarter-ish arc Bezier; check foot point is a true projection:
    # residual tangent . (S(u)-q) == 0 at the solution
    curve = Bezier(
        [2], [[0.0, 1.0], [1.0, 1.0], [1.0, 0.0]]
    )
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(curve)
    scene.plant_kd_tree(500, 1)
    bq = scene.make_batched_query()
    data = scene.scene_data()
    qs = jnp.asarray([[0.2, 0.2], [0.9, 0.9], [0.0, 0.0]])
    res = bq(qs, data)
    ev = scene._get_fns()["eval"]
    import jax

    d1 = jax.vmap(
        lambda u: jax.jacfwd(ev)(u, data[0]["cps"])[:, 0]
    )(res["parametric"])
    pmq = np.asarray(res["physical"]) - np.asarray(qs)
    ortho = np.abs(np.einsum("qd,qd->q", np.asarray(d1), pmq))
    # interior projections should be orthogonal
    u_par = np.asarray(res["parametric"])[:, 0]
    for k in range(len(qs)):
        if 1e-6 < u_par[k] < 1 - 1e-6:
            assert ortho[k] < 1e-8


def _press_setup(penalty=5e7):
    """Soft unit-ish square pressed from above by a rigid flat tool."""
    nl = mimi.NonlinearSolid()
    nl.read_mesh(os.path.join(DATA, "square-nurbs.mesh"))
    nl.elevate_degrees(1)
    nl.subdivide(2)

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1e3
    mat.viscosity = 100.0
    mat.set_young_poisson(1e6, 0.3)
    nl.set_material(mat)

    # square-nurbs corners: (0,0),(2,0),(1,1),(-1,2); attr 2 (bid 1) is the
    # edge from (1,1) to (-1,2) with outward normal (1,2)/sqrt(5).  Tool:
    # rigid line parallel to that edge, offset ~0.02 outward, oriented so
    # its normal (dy,-dx convention) points toward the solid.
    tool = Bezier([1], [[-1.885, 2.464], [1.903, 0.570]])
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(tool)
    scene.plant_kd_tree(2000, 1)
    scene.coefficient = penalty

    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(0, 0).dirichlet(0, 1)
    bc.current.contact(1, scene)
    nl.boundary_condition = bc
    nl.setup(1)
    nl.configure_newton("nonlinear_solid", 1e-10, 1e-8, 60, False)
    nl.time_step_size = 0.01
    return nl, scene, tool


def test_contact_press():
    nl, scene, tool = _press_setup()
    u = nl.solution_view("displacement", "x").reshape(-1, 2)
    n_steps = 10
    # push along the inward normal -(1,2)/sqrt(5), 0.005/step (first steps
    # close the 0.02 offset gap, then real indentation)
    push = 0.005 * np.array([1.0, 2.0]) / np.sqrt(5.0)
    for i in range(n_steps):
        tool.cps[:] -= push
        scene.plant_kd_tree(2000, 1)
        nl.step_time2()
    blk = nl._system.contact_blocks[0]
    # contact engaged with a physically meaningful force:
    f = blk.last_force
    assert blk.last_pressure < 0.0  # integral of (negative) pressure
    # force points along the inward normal -(1,2)/sqrt(5)
    assert f[0] < 0.0 and f[1] < 0.0
    # penetration stays at penalty scale: |gap| ~ |pressure|/penalty
    gn = blk.gap_norm(nl._system.u, scene.scene_data())
    assert gn < 1e-2, gn
    # solid actually deformed, but did not blow up
    assert 1e-4 < np.abs(u).max() < 0.5
    # Newton converged at the final step
    assert nl._system.newton.converged


def test_contact_force_balance():
    """Total contact force equals the assembled traction-residual sum
    (action equals reaction within the discretization)."""
    nl, scene, tool = _press_setup()
    for i in range(8):
        tool.cps[:] -= 0.005 * np.array([1.0, 2.0]) / np.sqrt(5.0)
        scene.plant_kd_tree(2000, 1)
        nl.step_time2()
    blk = nl._system.contact_blocks[0]
    # traction residual (what contact adds to the residual) must sum to
    # -force by construction of the recorded diagnostics
    tr = blk.last_traction_residual
    assert tr is not None
    assert np.allclose(-tr.sum(axis=0), -blk.last_force, rtol=1e-8)


def test_contact_3d_surface():
    """3D contact: cube pressed from above by a rigid bilinear surface
    (exercises the para_dim-2 closest-point and surface-normal paths)."""
    nl = mimi.NonlinearSolid()
    nl.read_mesh(os.path.join(DATA, "cube-nurbs.mesh"))
    nl.elevate_degrees(1)
    nl.subdivide(1)

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1e3
    mat.viscosity = 100.0
    mat.set_young_poisson(1e6, 0.3)
    nl.set_material(mat)

    # attr 2 (bid 1) is the top face z=1 (file: "2 3 4 5 6 7").  Tool:
    # rigid plane above it; orientation so d1 x d2 points down (toward
    # the solid): xi1 along +y, xi2 along +x gives n = -z.
    tool = Bezier(
        [1, 1],
        [
            [-0.5, -0.5, 1.02],  # (xi1, xi2) = (0, 0)
            [-0.5, 1.5, 1.02],   # (1, 0): +y fast
            [1.5, -0.5, 1.02],   # (0, 1): +x slow
            [1.5, 1.5, 1.02],
        ],
    )
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(tool)
    scene.plant_kd_tree(50, 1)
    scene.coefficient = 5e7

    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(0, 0).dirichlet(0, 1).dirichlet(0, 2)  # bottom
    bc.current.contact(1, scene)
    nl.boundary_condition = bc
    nl.setup(1)
    nl.configure_newton("nonlinear_solid", 1e-10, 1e-8, 40, False)
    nl.time_step_size = 0.01

    for i in range(6):
        tool.cps[:, 2] -= 0.01
        scene.plant_kd_tree(50, 1)
        nl.step_time2()

    blk = nl._system.contact_blocks[0]
    assert blk.last_pressure < 0.0
    # force presses the cube down
    assert blk.last_force[2] < 0.0
    gn = blk.gap_norm(nl._system.u, scene.scene_data())
    assert gn < 2e-2, gn
    u = np.asarray(nl._system.u)
    assert np.isfinite(u).all()
    assert 1e-5 < np.abs(u).max() < 0.5


def test_multi_spline_scene():
    """Scene with two splines returns per-query minimum-distance results
    (exceeds the reference, which asserts exactly one spline)."""
    import jax.numpy as jnp

    lo = Bezier([1], [[-1.0, 0.0], [2.0, 0.0]])    # line y=0
    hi = Bezier([1], [[2.0, 1.0], [-1.0, 1.0]])    # line y=1 (flipped)
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(lo)
    scene.add_spline(hi)
    scene.plant_kd_tree(200, 1)
    bq = scene.make_batched_query()
    data = scene.scene_data()
    qs = jnp.asarray([[0.5, 0.2], [0.5, 0.9], [0.5, 0.5]])
    res = bq(qs, data)
    phys = np.asarray(res["physical"])
    # nearest body wins
    assert np.isclose(phys[0, 1], 0.0)
    assert np.isclose(phys[1, 1], 1.0)
    assert np.isclose(float(res["distance"][0]), 0.2)
    assert np.isclose(float(res["distance"][1]), 0.1)


def test_contact_press_regression():
    """Self-golden: the rigid-press trajectory must stay stable across
    framework changes (committed from a verified run; the C++ reference
    cannot be built in this environment, so contact trajectories are
    pinned against our own verified baseline).

    Tolerance note: on the deeper press steps the reference-semantics
    frozen-pressure Newton does not converge within its 60-iteration
    budget and returns the best iterate — the pinned trajectory there
    carries ~3e-7 of solver-noise sensitivity (measured when the
    round-3 SoA projection replaced the round-2 pointwise one: steps
    0-3 bit-identical, stagnating steps moved by up to 3.1e-7).  1e-6
    still catches any real physics change (those move the trajectory
    by >1e-4).  Golden re-recorded with the round-3 projection."""
    ref = np.load(os.path.join(DATA, "ref", "contact_press_traj.npy"))
    nl, scene, tool = _press_setup()
    u = nl.solution_view("displacement", "x")
    push = 0.005 * np.array([1.0, 2.0]) / np.sqrt(5.0)
    for i in range(10):
        tool.cps[:] -= push
        scene.plant_kd_tree(2000, 1)
        nl.step_time2()
        assert np.allclose(u, ref[i], atol=1e-6), (
            f"step {i}: {np.abs(u-ref[i]).max()}"
        )
