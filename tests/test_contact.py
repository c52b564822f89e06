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


@pytest.mark.slow
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


def test_contact_patch_uniform_pressure():
    """Contact patch test (VERDICT r4 #8): a flat face penetrating a
    flat rigid plane by a UNIFORM depth must produce (a) a uniform
    mortar nodal pressure kappa*g at every marked node and (b) the
    exact consistent load vector of that constant pressure,
    res_i = +(kappa*delta) * (int N_i dA) * n — the mortar two-pass
    operator transmits a constant pressure exactly, to roundoff
    (anchor: mortar_contact.cpp:148-261; no solve involved).
    Sign convention: contact enters the Newton residual on the
    internal-force side, res = -f_contact (the recorded traction is
    -res, mortar.py record())."""
    nl = mimi.NonlinearSolid()
    nl.read_mesh(os.path.join(DATA, "cube-nurbs.mesh"))
    nl.elevate_degrees(1)
    nl.subdivide(2)
    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1e3
    mat.viscosity = -1.0
    mat.set_young_poisson(1e6, 0.3)
    nl.set_material(mat)
    kappa = 5e7
    tool = Bezier(
        [1, 1],
        [
            [-0.5, -0.5, 1.02],
            [-0.5, 1.5, 1.02],
            [1.5, -0.5, 1.02],
            [1.5, 1.5, 1.02],
        ],
    )
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(tool)
    scene.plant_kd_tree(50, 1)
    scene.coefficient = kappa
    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(0, 0).dirichlet(0, 1).dirichlet(0, 2)
    bc.current.contact(1, scene)  # top face z=1
    nl.boundary_condition = bc
    nl.setup(1)

    sysm = nl._system
    blk = sysm.contact_blocks[0]
    # manufactured state: rigid translation +z by 0.05 -> the top face
    # (z=1) sits 0.03 above the tool plane (z=1.02): uniform gap -0.03
    delta = 0.03
    u = np.zeros_like(np.asarray(sysm.u))
    u[:, 2] = 0.02 + delta
    res, aux = blk.add_residual(
        jnp.asarray(u), u.shape[0], scene.scene_data(), kappa
    )
    res = np.asarray(res)

    # (a) uniform nodal pressure kappa*gap = -kappa*delta
    p_nodal = np.asarray(aux["nodal_pressure"])
    assert np.allclose(p_nodal, -kappa * delta, rtol=1e-9), (
        p_nodal.min(), p_nodal.max()
    )

    # (b) consistent constant-pressure load vector: w_i = int N_i dA
    # from the block's own quadrature tables (translation-invariant
    # metric), face normal +z
    w = np.zeros(u.shape[0])
    Nw = np.asarray(blk.N) * np.asarray(blk.wq)[:, :, None]
    np.add.at(w, np.asarray(blk.conn).ravel(), Nw.sum(axis=1).ravel())
    expected = np.zeros_like(res)
    expected[:, 2] = kappa * delta * w
    scale = kappa * delta * np.abs(w).max()
    assert np.allclose(res, expected, atol=1e-9 * scale), (
        np.abs(res - expected).max() / scale
    )
    # integral diagnostics agree: area 1, total force -kappa*delta*A
    assert np.isclose(float(aux["area"]), 1.0, rtol=1e-9)
    assert np.isclose(
        float(aux["force"][2]), -kappa * delta, rtol=1e-9
    )
    assert np.isclose(float(aux["pressure"]), -kappa * delta, rtol=1e-9)


def _max_penetration(blk, u, scene):
    """Max penetration depth over the marked face's quad points."""
    cur = np.asarray(u)[np.asarray(blk.conn)] + np.asarray(blk.x_ref_el)
    qpts = np.einsum("eqn,end->eqd", np.asarray(blk.N), cur)
    res = blk._batched_query(
        jnp.asarray(qpts.reshape(-1, blk.dim)), scene.scene_data()
    )
    g = np.asarray(res["normal_gap"])
    return float(np.maximum(-g, 0.0).max())


def _settled_press(penalty, subdivide=2, steps=8, holds=12):
    """Press the rigid tool `steps` x 0.005, then HOLD it for `holds`
    steps so the dynamics settle toward the quasi-static contact state
    (light density: the rho_inf=0.5 generalized-alpha dissipation damps
    the unresolved wave content), solved tightly through the compiled
    core's consistent-tangent iterative path.  Returns (max geometric
    penetration at the settled u, max |nodal mortar pressure|)."""
    from mimi_tpu.parallel import sharding as sh

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1.0
    mat.viscosity = 100.0
    mat.set_young_poisson(1e6, 0.3)
    tool = Bezier([1], [[-1.885, 2.464], [1.903, 0.570]])
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(tool)
    scene.plant_kd_tree(2000, 1)
    scene.coefficient = penalty
    prob = sh.build_problem(
        os.path.join(DATA, "square-nurbs.mesh"), 1, subdivide, mat,
        [(0, 0), (0, 1)], {}, rho_inf=0.5,
        contact=[(1, scene)],
    )
    step = sh.make_step(
        prob, 0.01, rel_tol=1e-10, abs_tol=1e-8,
        solver="iterative", newton_iters=30,
        contact_tangent="consistent", precond="fdm", cg_iters=150,
    )
    carry = sh.initial_carry(prob)
    push = 0.005 * np.array([1.0, 2.0]) / np.sqrt(5.0)
    for i in range(steps + holds):
        if i < steps:
            tool.cps[:] -= push
            scene.plant_kd_tree(2000, 1)
        carry = step(carry, contact_scenes=[scene.scene_data()])
        assert bool(carry["newton"]["converged"]), (
            i, float(carry["newton"]["norm"])
        )
    # settled enough: residual ringing well below the press velocity
    # scale (0.5/s tool speed), not growing
    assert np.abs(np.asarray(carry["v"])).max() < 0.5
    # geometric penetration at the final state
    conn = np.asarray(prob.contact[0]["conn"])
    x_el = np.asarray(prob.contact[0]["x_ref_el"])
    N = np.asarray(prob.contact[0]["N"])
    cur = np.asarray(carry["u"])[conn] + x_el
    qpts = np.einsum("eqn,end->eqd", N, cur)
    q = prob.contact_static[0]["query"](
        jnp.asarray(qpts.reshape(-1, prob.dim)), scene.scene_data()
    )
    g = np.asarray(q["normal_gap"])
    pen = float(np.maximum(-g, 0.0).max())
    p_max = float(np.abs(carry["contact"][0]["nodal_pressure"]).max())
    return pen, p_max


@pytest.mark.slow
def test_contact_penetration_penalty_rate():
    """Penalty-contact invariant (VERDICT r4 #8): the settled
    quasi-static penetration is the p/kappa penalty scale — it matches
    max|nodal pressure|/kappa and quadrupling kappa divides it by ~4
    (the transmitted pressure changes only marginally because the
    press is displacement-controlled)."""
    pen1, p1 = _settled_press(5e7)
    pen4, p4 = _settled_press(2e8)
    assert pen1 > 0 and pen4 > 0
    ratio = pen1 / pen4
    assert 2.5 < ratio < 5.5, (pen1, pen4, ratio)
    # penetration magnitude is the p/kappa scale itself
    assert 0.3 < pen1 / (p1 / 5e7) < 3.0, (pen1, p1 / 5e7)
    assert 0.3 < pen4 / (p4 / 2e8) < 3.0, (pen4, p4 / 2e8)


@pytest.mark.slow
def test_contact_penetration_h_refinement():
    """h-refinement study: the penalty-regime penetration ~ p/kappa is
    mesh-width-independent — refining the face does not change the
    penetration scale (it tracks p/kappa at every h)."""
    for subdiv in (1, 2, 3):
        pen, p_max = _settled_press(5e7, subdivide=subdiv)
        assert pen > 0
        assert 0.3 < pen / (p_max / 5e7) < 3.0, (
            subdiv, pen, p_max / 5e7
        )
