"""Port of the reference's structural mesh tests
(/root/reference/tests/test_mesh_refinement.py:4-94) against mimi_tpu."""

import os

import mimi_tpu as mimi

DATA = os.path.join(os.path.dirname(__file__), "data")


def _p(name):
    return os.path.join(DATA, name)


def test_read_2d_mesh():
    s = mimi.Solid()
    s.read_mesh(_p("square-nurbs.mesh"))

    assert s.mesh_dim() == 2
    assert s.n_vertices() == 4
    assert s.n_elements() == 1
    assert s.n_boundary_elements() == 4
    assert s.n_subelements() == 4
    assert s.mesh_degrees() == [1, 1]

    s.read_mesh(_p("square-nurbs-3.mesh"))

    assert s.mesh_dim() == 2
    assert s.n_vertices() == 16
    assert s.n_elements() == 1
    assert s.n_boundary_elements() == 4
    assert s.n_subelements() == 4
    assert s.mesh_degrees() == [3, 3]


def test_read_3d_mesh():
    s = mimi.Solid()
    s.read_mesh(_p("cube-nurbs.mesh"))

    assert s.mesh_dim() == 3
    assert s.n_vertices() == 8
    assert s.n_elements() == 1
    assert s.n_boundary_elements() == 6
    assert s.n_subelements() == 6
    assert s.mesh_degrees() == [1, 1, 1]

    s.read_mesh(_p("cube-nurbs-3.mesh"))

    assert s.mesh_dim() == 3
    assert s.n_vertices() == 64
    assert s.n_elements() == 1
    assert s.n_boundary_elements() == 6
    assert s.n_subelements() == 6
    assert s.mesh_degrees() == [3, 3, 3]


def test_subdivide():
    s = mimi.Solid()
    s.read_mesh(_p("square-nurbs.mesh"))

    s.subdivide(1)

    assert s.mesh_dim() == 2
    assert s.n_vertices() == 9
    assert s.n_elements() == 4
    assert s.n_boundary_elements() == 8
    assert s.n_subelements() == 12
    assert s.mesh_degrees() == [1, 1]

    s.read_mesh(_p("cube-nurbs.mesh"))

    s.subdivide(1)

    assert s.mesh_dim() == 3
    assert s.n_vertices() == 27
    assert s.n_elements() == 8
    assert s.n_boundary_elements() == 24
    assert s.n_subelements() == 36
    assert s.mesh_degrees() == [1, 1, 1]


def test_elevate_degrees():
    s0 = mimi.Solid()
    s1 = mimi.Solid()

    s0.read_mesh(_p("square-nurbs.mesh"))
    s1.read_mesh(_p("square-nurbs-3.mesh"))

    def elevate_and_compare(first, second):
        first.elevate_degrees(2)

        assert first.mesh_dim() == second.mesh_dim()
        assert first.n_vertices() == second.n_vertices()
        assert first.n_elements() == second.n_elements()
        assert first.n_boundary_elements() == second.n_boundary_elements()
        assert first.n_subelements() == second.n_subelements()
        assert first.mesh_degrees() == second.mesh_degrees()

    elevate_and_compare(s0, s1)

    s0.read_mesh(_p("cube-nurbs.mesh"))
    s1.read_mesh(_p("cube-nurbs-3.mesh"))

    elevate_and_compare(s0, s1)


def test_save_mesh_roundtrip(tmp_path):
    """save_mesh writes the refined mesh back in MFEM NURBS v1.0 format;
    reading it reproduces counts, degrees and geometry."""
    import numpy as np

    s = mimi.Solid()
    s.read_mesh(_p("balken.mesh"))
    s.elevate_degrees(1)
    s.subdivide(1)
    out = str(tmp_path / "out.mesh")
    s.save_mesh(out)

    s2 = mimi.Solid()
    s2.read_mesh(out)
    assert s2.mesh_degrees() == s.mesh_degrees()
    assert s2.n_vertices() == s.n_vertices()
    assert s2.n_elements() == s.n_elements()
    assert np.allclose(
        s2._patch.control_points, s._patch.control_points
    )
    assert np.allclose(s2._patch.weights, s._patch.weights)
