"""Sum-factorization spike for the GMRES matvec sweep (VERDICT r4 #4):
measure, don't estimate.

Parity: interpret-mode (CPU) comparison of make_matvec_sweep_sf vs the
dense-table make_matvec_sweep on a small cube problem, same random
tangent planes.

Timing: at the 48^3 north-star scale on TPU, dense vs sum-factorized,
f32 and bf16 streams, cauchy 37-plane storage (the J2 engine of
record).  Results go to docs/ROADMAP.md (ship if >20% step win;
record the measured rejection otherwise).

Usage: python scripts/spike_sumfactor.py [parity|time] [spans]
"""

import os
import sys
import time

os.environ.setdefault("MIMI_TPU_X64", "0")
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

mode = sys.argv[1] if len(sys.argv) > 1 else "parity"

import numpy as np
import jax

if mode == "parity":
    jax.config.update("jax_platforms", "cpu")

jax.config.update(
    "jax_compilation_cache_dir", os.path.join(HERE, ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp

from mimi_tpu.nurbs.mesh_io import read_mfem_nurbs_mesh
from mimi_tpu.nurbs.topology import build_patch_from_mesh
from mimi_tpu.fem.space import FESpace
from mimi_tpu.ops import sweeps as sw


def build(spans):
    mesh = read_mfem_nurbs_mesh(
        os.path.join(HERE, "tests", "data", "cube-nurbs.mesh")
    )
    patch, topo, _ = build_patch_from_mesh(mesh)
    patch.elevate_degrees(1)
    patch.refine_to(spans)
    fes = FESpace(patch, topo)
    dt = fes.domain_tables()
    return patch, fes, dt


def timeit(fn, *args, n=20, warm=3):
    out = None
    for _ in range(warm):
        out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jax.tree.leaves(out)[0].sum())
    return (time.perf_counter() - t0) / n


def main():
    spans = int(sys.argv[2]) if len(sys.argv) > 2 else (
        4 if mode == "parity" else 48
    )
    patch, fes, dtab = build(spans)
    dN = np.asarray(dtab.dN_dX)  # (n_el, n_q, nd, dim)
    N = np.asarray(dtab.N)
    wdet = np.asarray(dtab.w_detJ)
    conn = np.asarray(dtab.conn)
    n_el, n_q, nd, dim = dN.shape
    pp1 = patch.degrees[0] + 1
    n_g = round(n_q ** (1 / 3))
    print(f"n_el={n_el} n_q={n_q} nd={nd} (p+1={pp1}, n_g={n_g})")

    interp = mode == "parity"
    block_e = sw.pick_block_e(n_el, 128)
    lay = sw.cauchy_plane_layout(dim)
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    dN_t = jnp.asarray(np.transpose(dN, (2, 3, 1, 0)).copy(), f32)
    N_t = jnp.asarray(np.transpose(N, (2, 1, 0)).copy(), f32)
    wdet_t = jnp.asarray(np.ascontiguousarray(wdet.T), f32)
    w_el = jnp.asarray(rng.standard_normal((dim, nd, n_el)), f32)
    Cc = jnp.asarray(
        rng.standard_normal((lay["n_plane"], n_q, n_el)), f32
    )

    tables, jinv = sw.build_sf_tables(
        patch, fes.x_ref, conn, n_g, dtype=np.float32
    )
    tables = [jnp.asarray(t) for t in tables]
    jinv = jnp.asarray(jinv)

    kw = dict(
        dim=dim, nd=nd, n_q=n_q, n_el=n_el, rho=1e3, fac0=0.01,
        fac1_mu_v=0.37, has_visc=True, block_e=block_e,
        interpret=interp, c_storage="cauchy",
    )
    mv = sw.make_matvec_sweep(**kw)
    mv_sf = sw.make_matvec_sweep_sf(**kw, n_g=n_g, pp1=pp1)

    if mode == "parity":
        y_d = np.asarray(mv(w_el, dN_t, N_t, wdet_t, Cc))
        y_s = np.asarray(
            mv_sf(w_el, *tables, jinv, wdet_t, Cc)
        )
        err = np.abs(y_d - y_s).max()
        scale = np.abs(y_d).max()
        print(f"parity: max abs {err:.3e} (scale {scale:.3e}, "
              f"rel {err / scale:.3e})")
        assert err <= 1e-4 * scale, "SF kernel disagrees"
        print("ok")
        return

    jmv = jax.jit(mv)
    jmv_sf = jax.jit(mv_sf)
    t_d32 = timeit(jmv, w_el, dN_t, N_t, wdet_t, Cc)
    t_s32 = timeit(jmv_sf, w_el, *tables, jinv, wdet_t, Cc)
    bf = jnp.bfloat16
    t_d16 = timeit(
        jmv, w_el, dN_t.astype(bf), N_t.astype(bf), wdet_t,
        Cc.astype(bf),
    )
    t_s16 = timeit(
        jmv_sf, w_el, *[t.astype(bf) for t in tables],
        jinv.astype(bf), wdet_t, Cc.astype(bf),
    )
    print(f"dense  f32 {t_d32*1e3:7.2f} ms   bf16 {t_d16*1e3:7.2f} ms")
    print(f"sumfac f32 {t_s32*1e3:7.2f} ms   bf16 {t_s16*1e3:7.2f} ms")
    # parity at scale too (one apply, f32)
    y_d = jmv(w_el, dN_t, N_t, wdet_t, Cc)
    y_s = jmv_sf(w_el, *tables, jinv, wdet_t, Cc)
    err = float(jnp.abs(y_d - y_s).max())
    print(f"on-device parity max abs {err:.3e}")


if __name__ == "__main__":
    main()
