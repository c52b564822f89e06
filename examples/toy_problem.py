"""Two-scene contact with prescribed path-following Dirichlet writes
through the live solution view (port of the reference's
examples/toy_problem.py, headless and with mimi_tpu splines; the original
outline geometry is simplified to two rigid line tools)."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

import mimi_tpu as mimi
from mimi_tpu.splines import Bezier

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "data",
)

le = mimi.NonlinearSolid()
le.read_mesh(os.path.join(DATA, "es.mesh"))

le.elevate_degrees(1)
le.subdivide(2)

mat = mimi.CompressibleOgdenNeoHookean()
mat.density = 4000
mat.viscosity = 100
mat.set_young_poisson(1e7, 0.3)
le.set_material(mat)

s, to_m, to_s = mimi.to_splinepy(le)
o_cps = s.cps.copy()

# two rigid tools above and below the strip (es.mesh spans
# x in [-1.5, 0.5045], y in [-0.305, 0.181])
upper = Bezier([1], [[-2.0, 0.30], [1.0, 0.30]])
lower = Bezier([1], [[1.0, -0.43], [-2.0, -0.43]])

scene0 = mimi.NearestDistanceToSplines()
scene0.add_spline(upper)
scene0.plant_kd_tree(1001, 4)
scene0.coefficient = 1e10
scene1 = mimi.NearestDistanceToSplines()
scene1.add_spline(lower)
scene1.plant_kd_tree(1001, 4)
scene1.coefficient = 1e10

bc = mimi.BoundaryConditions()
bc.initial.dirichlet(2, 0).dirichlet(2, 1)
bc.current.contact(1, scene0)  # top face vs upper tool
bc.current.contact(0, scene1)  # bottom face vs lower tool
le.boundary_condition = bc

le.setup(4)
le.configure_newton("nonlinear_solid", 1e-10, 1e-8, 100, False)

le.time_step_size = 0.0005

u = le.solution_view("displacement", "x").reshape(-1, le.mesh_dim())
x_ref = le.solution_view("displacement", "x_ref").reshape(-1, le.mesh_dim())

# prescribed path on the right-edge control points, written directly
# through the live solution view (the reference's FSI-style steering)
mi = s.multi_index
b3 = to_s[mi[-1, :]]


def move(i):
    # push the right edge rightward and slightly down along a path
    target = x_ref[b3] + [0.0005 * i, -0.0002 * i]
    u[b3] = target - x_ref[b3]


n_steps = int(os.environ.get("MIMI_STEPS", "100"))
for i in range(n_steps):
    move(i)
    le.step_time2()
    if i % 20 == 0:
        print(
            f"step {i:4d}  |u|max={np.abs(u).max():.5f}  "
            f"A0={le._system.contact_blocks[0].last_area:.4f}  "
            f"A1={le._system.contact_blocks[1].last_area:.4f}"
        )

print("done")
