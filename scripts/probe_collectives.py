"""Quantify the multi-chip collective volume of the compiled step
(VERDICT r4 next #9).

The element-batch sharding replicates dof vectors and lets XLA
all-reduce every scatter-add over the mesh axis (parallel/sharding.py
module docstring).  This probe compiles the FULL generalized-alpha J2
step on an n-device mesh (virtual CPU devices — collective counts and
payload shapes are partition-determined, not platform-determined; only
their wall cost is), dumps the optimized HLO, and reports every
collective op grouped by enclosing computation, with payload bytes.
Per-step ICI volume then follows from the measured iteration counts
(GMRES its/solve x Newton its/step, bench.py extras) and scales
linearly in n_dof to the 48^3 north-star mesh.

Usage: python scripts/probe_collectives.py [n_devices]
"""

import glob
import os
import re
import sys
import tempfile

n_dev = int(sys.argv[1]) if len(sys.argv) > 1 else 8
dump_dir = tempfile.mkdtemp(prefix="hlodump-")
flags = os.environ.get("XLA_FLAGS", "")
os.environ["XLA_FLAGS"] = (
    flags
    + f" --xla_force_host_platform_device_count={n_dev}"
    + f" --xla_dump_to={dump_dir}"
    + " --xla_dump_hlo_pass_re=^$"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh

from mimi_tpu.parallel import sharding as sh


def _jc_material():
    import mimi_tpu as mimi

    mat = mimi.J2()
    mat.density = 1.0
    mat.viscosity = 10.0
    mat.melting_temperature = 1500.0
    mat.initial_temperature = 20.0
    mat.specific_heat = 450.0
    mat.heat_fraction = 0.9
    mat.set_young_poisson(2100.0, 0.3)
    h = mimi.JohnsonCookTemperatureAndRateDependentHardening()
    h.A, h.B, h.n, h.m = 70.0, 140.0, 0.2835, 1.3558
    h.eps0_dot = 0.004
    h.reference_temperature = 20.0
    mat.hardening = h
    return mat


DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
    "u32": 4, "pred": 1, "s64": 8, "u64": 8, "s8": 1, "u8": 1,
}


def _op_bytes(shapes: str) -> int:
    total = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shapes):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    devs = jax.devices("cpu")[:n_dev]
    mesh = Mesh(np.array(devs), ("e",))
    prob = sh.build_problem(
        os.path.join(HERE, "tests", "data", "balken.mesh"),
        elevate=2,
        subdivide=1,
        material=_jc_material(),
        dirichlet=[(2, 0), (2, 1)],
        body_force={1: -20.0},
        rho_inf=0.5,
        pad_multiple=n_dev,
    )
    prob = sh.shard_problem(prob, mesh)
    step = sh.make_step(
        prob, dt=0.5, newton_iters=4, solver="cg", cg_iters=40,
        residual_impl="soa", precond="fdm",
    )
    carry = sh.initial_carry(prob)
    carry = step(carry)  # compile (dumps optimized HLO)
    jax.block_until_ready(carry["u"])

    n_dof, dim = prob.n_dof, prob.dim
    bytes_per_dof_vec = n_dof * dim * 8  # f64 on CPU
    print(
        f"# devices={n_dev} n_dof={n_dof} dim={dim} "
        f"dof-vector={bytes_per_dof_vec / 1e3:.1f} kB (f64)"
    )

    # the step module is the largest dumped after-optimizations text
    cands = glob.glob(os.path.join(dump_dir, "*after_optimizations.txt"))
    if not cands:
        cands = glob.glob(os.path.join(dump_dir, "*.txt"))
    path = max(cands, key=os.path.getsize)
    print(f"# module: {os.path.basename(path)}")

    counts, btot, current = {}, {}, "?"
    coll_re = re.compile(
        r"(all-reduce|all-gather|reduce-scatter|collective-permute"
        r"|all-to-all)(-start)?\("
    )
    for line in open(path):
        if line.startswith(("%", "ENTRY")) and "{" in line:
            m = re.match(r"(?:ENTRY\s+)?%?([\w\.\-]+)", line)
            if m:
                current = m.group(1)
        m = coll_re.search(line)
        if m and "=" in line and m.group(2) != "-done":
            op = m.group(1)
            if "-done(" in line:
                continue
            shapes = line.split("=", 1)[1].split(m.group(0))[0]
            key = (current, op)
            counts[key] = counts.get(key, 0) + 1
            btot[key] = btot.get(key, 0) + _op_bytes(shapes)
    if not counts:
        print("# no collectives found")
        return
    print(f"{'computation':52s} {'op':18s} {'n':>3s} {'bytes':>12s}")
    for (comp, op), c in sorted(counts.items()):
        print(f"{comp[:52]:52s} {op:18s} {c:3d} {btot[(comp, op)]:12d}")
    total = sum(btot.values())
    print(f"# static sum over unique ops: {total / 1e6:.3f} MB "
          f"({total / bytes_per_dof_vec:.1f} dof-vectors)")


if __name__ == "__main__":
    main()
