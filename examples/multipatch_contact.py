"""Multi-patch contact press: a rigid flat tool pressing the top
boundary of a TWO-PATCH NURBS block, with the contact surface spanning
the patch interface.

Demonstrates the multi-patch session surface (round 4): read a
multi-patch MFEM NURBS mesh, refine it, solve penalty contact across
the interface, record contact observables, and write the deformed mesh
back out with save_mesh (the reference writes any mesh through mfem's
generic printer, /root/reference/src/mimi/py/py_solid.cpp:97-107).

Headless; runs on CPU in under a minute.
"""

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

# two side-by-side patches tiling [0,2] x [0,1]; the shared edge is a
# conforming interface at x = 1
nl = mimi.NonlinearSolid()
nl.read_mesh(os.path.join(DATA, "two-patch-square.mesh"))
nl.elevate_degrees(1)
nl.subdivide(2)
print(
    f"mesh: {nl.n_elements()} elements over 2 patches, "
    f"degrees {nl.mesh_degrees()}"
)

mat = mimi.CompressibleOgdenNeoHookean()
mat.density = 1e3
mat.viscosity = 100.0
mat.set_young_poisson(1e6, 0.3)
nl.set_material(mat)

rc = mimi.RuntimeCommunication()
rc.set_real("ode_coefficient", 0.5)
nl.runtime_communication = rc

# rigid flat tool hovering just above the top boundary (y = 1); it
# descends 0.005/step and presses BOTH patches at once
tool = Bezier([1], [[-0.5, 1.02], [2.5, 1.02]])
scene = mimi.NearestDistanceToSplines()
scene.add_spline(tool)
scene.plant_kd_tree(200, 1)
scene.coefficient = 5e7

bc = mimi.BoundaryConditions()
bc.initial.dirichlet(2, 0).dirichlet(2, 1)  # fix the bottom edge
bc.current.contact(3, scene)  # top boundary (both patches)
nl.boundary_condition = bc

nl.setup(1)
nl.time_step_size = 0.01

u = nl.solution_view("displacement", "x").reshape(-1, 2)
push = np.array([0.0, 0.005])
for i in range(12):
    tool.cps[:] -= push
    scene.plant_kd_tree(200, 1)
    nl.step_time2()
    blk = nl._system.contact_blocks[0]
    if i % 2 == 1:
        print(
            f"step {i:3d}  |u|max={np.abs(u).max():.5f}  "
            f"area={blk.last_area:.4f}  Fy={blk.last_force[1]:.4e}"
        )

assert np.isfinite(u).all() and np.abs(u).max() > 1e-4

# write the mesh back out (control points carry the current geometry)
out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "multipatch_out.mesh")
nl.save_mesh(out)
print(f"done; deformed multi-patch mesh written to {out}")
