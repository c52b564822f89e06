"""Native C++ setup engine vs numpy reference implementation."""

import os

import numpy as np
import pytest

from mimi_tpu.fem import native
from mimi_tpu.fem import space as sp
from mimi_tpu.nurbs.mesh_io import read_mfem_nurbs_mesh
from mimi_tpu.nurbs.topology import build_patch_from_mesh

DATA = os.path.join(os.path.dirname(__file__), "data")


def _tabs_for(patch, fes):
    tabs = []
    for k in range(patch.para_dim):
        order = 2 * patch.degrees[k] + 3
        tabs.append(
            sp._dim_tables(
                patch.knot_vectors[k], patch.degrees[k], order // 2 + 1
            )
        )
    return tabs


@pytest.mark.parametrize(
    "mesh,refine", [("balken.mesh", 2), ("cube-nurbs.mesh", 1)]
)
def test_native_matches_numpy(mesh, refine):
    lib = native.load_library()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    m = read_mfem_nurbs_mesh(os.path.join(DATA, mesh))
    patch, topo, _ = build_patch_from_mesh(m)
    patch.elevate_degrees(2)
    for _ in range(refine):
        patch.uniform_refine()
    fes = sp.FESpace(patch, topo)
    tabs = _tabs_for(patch, fes)

    ref = sp._tensor_basis(tabs, fes.weights_grid)
    w_flat = fes.weights_grid.transpose(
        *range(fes.para_dim - 1, -1, -1)
    ).reshape(-1)
    nat = native.tensor_tables_native(tabs, w_flat, fes.n_ctrl)
    assert nat is not None
    for a, b, name in zip(nat, ref, ["conn", "N", "dN", "WQ"]):
        if a.dtype.kind == "f":
            assert np.allclose(a, b, atol=1e-13), name
        else:
            assert np.array_equal(a, b), name


def test_native_dim_tables():
    lib = native.load_library()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    from mimi_tpu.nurbs import knots as kn

    kv = np.array([0, 0, 0, 0.25, 0.5, 0.5, 0.75, 1, 1, 1], dtype=float)
    p = 2
    bps = kn.unique_spans(kv, p)
    xg, wg = np.polynomial.legendre.leggauss(4)
    ref = sp._dim_tables(kv, p, 4)
    nat = native.dim_tables_native(kv, p, bps, xg, wg)
    for a, b in zip(nat, ref):
        assert np.allclose(a, b, atol=1e-14)


def test_native_threads():
    lib = native.load_library()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    assert lib.omp_thread_count() >= 1
