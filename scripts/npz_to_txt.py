"""Convert dynamic-history npz exports (x_0, x_1, ...) into per-step
whitespace text files — the golden-file format of the regression tests
(parity with the reference's scripts/npz_to_txt.py)."""

import os
import sys

import numpy as np


def main():
    if len(sys.argv) < 3:
        print("usage: npz_to_txt.py <in.npz> <out_dir> [prefix=x_]")
        raise SystemExit(1)
    fname, out_dir = sys.argv[1], sys.argv[2]
    prefix = sys.argv[3] if len(sys.argv) > 3 else "x_"
    os.makedirs(out_dir, exist_ok=True)
    data = np.load(fname)
    n = 0
    for key in data.files:
        if not key.startswith(prefix):
            continue
        suffix = key[len(prefix):]
        if not suffix.isdigit():
            continue
        arr = np.asarray(data[key]).ravel()
        out = os.path.join(out_dir, f"{prefix}{suffix}.txt")
        with open(out, "w") as f:
            f.write(" ".join(repr(float(v)) for v in arr) + "\n")
        n += 1
    print(f"wrote {n} files to {out_dir}")


if __name__ == "__main__":
    main()
