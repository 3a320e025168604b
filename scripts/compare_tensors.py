#!/usr/bin/env python3
"""Diff two binary tensor dumps (the reference's scripts/compare_tensors.py,
same 32-byte-header format -- dumps from either repo are interchangeable).

    compare_tensors.py <a.bin> <b.bin>            # diff two dump files
    compare_tensors.py <dir_a> <dir_b>            # diff all matching names

Prints max/mean/median abs diff, max/mean rel diff, correlation, exact-match
fraction, and a log10 histogram of abs diffs (reference
docs/STREAMING-v2.md:185-199).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nemotron_tpu.utils.dump import compare, read_dump  # noqa: E402


def histo(a: np.ndarray, b: np.ndarray) -> str:
    a = a.astype(np.float64).reshape(-1)
    b = b.astype(np.float64).reshape(-1)
    n = min(a.size, b.size)
    d = np.abs(a[:n] - b[:n])
    d = d[d > 0]
    if d.size == 0:
        return "  all elements exact"
    logs = np.log10(d)
    lo, hi = int(np.floor(logs.min())), int(np.ceil(logs.max()))
    lines = []
    for e in range(lo, max(hi, lo + 1)):
        count = int(((logs >= e) & (logs < e + 1)).sum())
        if count:
            bar = "#" * max(1, int(50 * count / d.size))
            lines.append(f"  1e{e:+03d}..1e{e+1:+03d}: {count:>10d} {bar}")
    return "\n".join(lines)


def diff_files(pa: str, pb: str) -> int:
    a, b = read_dump(pa), read_dump(pb)
    print(f"{pa}: shape {a.shape}")
    print(f"{pb}: shape {b.shape}")
    if a.shape != b.shape:
        print(f"  SHAPE MISMATCH; comparing first {min(a.size, b.size)} elements")
    s = compare(a, b)
    print(f"  max_abs {s['max_abs']:.3e}  mean_abs {s['mean_abs']:.3e}  "
          f"median_abs {s['median_abs']:.3e}  p99_abs {s['p99_abs']:.3e}")
    print(f"  max_rel {s['max_rel']:.3e}  mean_rel {s['mean_rel']:.3e}  "
          f"corr {s['corr']:.6f}  exact {s['exact_frac']*100:.1f}%")
    print(histo(a, b))
    return 0


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__, file=sys.stderr)
        return 1
    a, b = argv[1], argv[2]
    if os.path.isdir(a) and os.path.isdir(b):
        names = sorted(set(os.listdir(a)) & set(os.listdir(b)))
        names = [n for n in names if n.endswith(".bin")]
        if not names:
            print("no matching .bin dumps", file=sys.stderr)
            return 1
        for n in names:
            print(f"=== {n} ===")
            diff_files(os.path.join(a, n), os.path.join(b, n))
        only_a = set(os.listdir(a)) - set(os.listdir(b))
        only_b = set(os.listdir(b)) - set(os.listdir(a))
        if only_a:
            print(f"only in {a}: {sorted(only_a)}")
        if only_b:
            print(f"only in {b}: {sorted(only_b)}")
        return 0
    return diff_files(a, b)


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
