"""Penalty contact of a hyperelastic block against a moving rigid Bezier
tool (port of the reference's examples/nl_contact.py, headless; the rigid
tool comes from mimi_tpu.splines instead of splinepy)."""

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

# init, read mesh
nl = mimi.NonlinearSolid()
nl.read_mesh(os.path.join(DATA, "square-nurbs.mesh"))

# refine
nl.elevate_degrees(1)
nl.subdivide(3)

# mat
mat = mimi.CompressibleOgdenNeoHookean()
mat.density = 7e4
mat.viscosity = -1
mat.set_young_poisson(1e10, 0.3)
nl.set_material(mat)

# create spline partner
s, to_m, to_s = mimi.to_splinepy(nl)
o_cps = s.cps.copy()

# rigid tool
curv = Bezier(
    [3],
    [
        [-2.5, 1.3],
        [0.3, 0.7],
        [0.7, 0.7],
        [1.5, 1.3],
    ],
)
curv.cps[:] += [0.05, 1]

scene = mimi.NearestDistanceToSplines()
scene.add_spline(curv)
scene.plant_kd_tree(100000, 4)
scene.coefficient = 1e11

bc = mimi.BoundaryConditions()
bc.initial.dirichlet(0, 0).dirichlet(0, 1)
bc.current.contact(1, scene)
nl.boundary_condition = bc

rc = mimi.RuntimeCommunication()
rc.set_fname(os.environ.get("MIMI_OUT", "nl_contact_out.npz"))
rc.append_should_save("x", 20)
rc.append_should_save("contact_history", 1)
nl.runtime_communication = rc

nl.setup(4)

nl.configure_newton("nonlinear_solid", 1e-10, 1e-8, 100, False)

# set step size
nl.time_step_size = 0.001

u = nl.solution_view("displacement", "x").reshape(-1, nl.mesh_dim())


def move(i):
    if i < 100:
        curv.cps[:] -= [0, 0.005]
    else:
        curv.cps[:] -= [0.005, 0]
    scene.plant_kd_tree(10000, 4)


n_steps = int(os.environ.get("MIMI_STEPS", "200"))
for i in range(n_steps):
    move(i)
    nl.step_time2()
    if i % 10 == 0:
        blk = nl._system.contact_blocks[0]
        print(
            f"step {i:4d}  |u|max={np.abs(u).max():8.5f}  "
            f"area={blk.last_area:7.4f}  "
            f"F=({blk.last_force[0]:+.3e}, {blk.last_force[1]:+.3e})"
        )

rc.save_real_history("area")
rc.save_real_history("force_x")
rc.save_real_history("force_y")
print("done; trajectory + contact history in", rc.fname)
