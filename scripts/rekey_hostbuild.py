"""Re-key the bench host-build cache pickles after a source change that
did NOT alter the built data.

bench.py keys its multi-GB 48^3 host-build pickles on a hash of the
build-relevant sources + builder params (bench._hostbuild_path).  A
commit that touches a hashed file without changing any pickled output
(e.g. adding a method to a material class, a new spline helper) leaves
the cached DATA valid but unreachable under its old name.  This script
renames each known tag's newest stale file to the current key.

ONLY run it when you know the change did not affect the build outputs
(tables, fdm dict, state0, contact scene data) — it asserts nothing
about content.  When in doubt, delete the pickles and re-warm with
`MIMI_BENCH_BUDGET_S=9999 python bench.py`.
"""

import glob
import os
import re
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("MIMI_TPU_PLATFORM", "cpu")

import bench  # noqa: E402


def _key_for(tag):
    m = re.match(r"body-s(\d+)-r(\d+|None)$", tag)
    if m:
        subdiv = int(m.group(1))
        spans = None if m.group(2) == "None" else int(m.group(2))
        mat = bench._jc_material()
        kwargs = dict(
            elevate=1,
            subdivide=subdiv,
            material=mat,
            dirichlet=[(1, 0), (1, 1), (1, 2)],
            body_force={1: -3.0},
            rho_inf=0.5,
            dtype="f32",
            refine_spans=spans,
        )
        return bench._params_key("cube-nurbs.mesh", kwargs)
    m = re.match(r"contact-r(\d+)$", tag)
    if m:
        return bench._contact_cfg(int(m.group(1)))[3]
    return None


def main():
    files = glob.glob(os.path.join(HERE, ".jax_cache", "hostbuild-*.pkl"))
    tags = {}
    for f in files:
        m = re.match(r"hostbuild-(.+)-([0-9a-f]{16})\.pkl$",
                     os.path.basename(f))
        if m:
            tags.setdefault(m.group(1), []).append(f)
    for tag, fs in sorted(tags.items()):
        key = _key_for(tag)
        if key is None:
            print(f"{tag}: unknown tag, skipped")
            continue
        new = bench._hostbuild_path(tag, key)
        if os.path.exists(new):
            stale = [f for f in fs if f != new]
            for f in stale:
                os.remove(f)
                print(f"{tag}: current key exists; removed stale "
                      f"{os.path.basename(f)}")
            if not stale:
                print(f"{tag}: already current")
            continue
        fs.sort(key=os.path.getmtime)
        src = fs[-1]  # newest candidate
        os.rename(src, new)
        print(f"{tag}: {os.path.basename(src)} -> {os.path.basename(new)}")
        for f in fs[:-1]:
            os.remove(f)
            print(f"{tag}: removed older {os.path.basename(f)}")


if __name__ == "__main__":
    main()
