"""k-NN microbenchmarks, the analog of the reference's google-benchmark suite
(reference: kdtree/src/cpp/benchmarks/benchmark_build.cpp:128-148 sweeps tree
build over 2^20..2^24 points and 4 selection policies;
benchmark_insertion.cpp:253-274 measures leaf-scan throughput).

Here: cell-list build across occupancies (the selection-policy analog is the
occupancy/leafsize trade), and query throughput across k and engine paths.

Usage: python benchmarks/bench_knn.py [--quick]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def bench_build(sizes, occupancies):
    from nbodyhpc_tpu.core.cells import build_cell_list
    from nbodyhpc_tpu.utils.philox import random_points

    print("== build (cell list) ==")
    for n in sizes:
        pts = random_points(int(n), seed=1)
        for occ in occupancies:
            t0 = time.perf_counter()
            build_cell_list(pts, occupancy=occ)
            dt = time.perf_counter() - t0
            print(f"  n={int(n):>9} occ={occ:>4}: {dt:.3f}s "
                  f"({n/dt/1e6:.2f} Mpts/s)")


def bench_query(n, nq, ks):
    from nbodyhpc_tpu.kdtree import KDTree
    from nbodyhpc_tpu.ops import knn
    from nbodyhpc_tpu.utils.philox import random_points

    print("== query ==")
    pts = random_points(int(n), seed=2)
    tree = KDTree(pts)
    q = pts[: int(nq)]
    for k in ks:
        for path in ("auto", "never"):
            knn.cell_knn_query(tree._tree, tree._dev, q[:4096], k,
                               use_kernel=path)  # warm
            t0 = time.perf_counter()
            knn.cell_knn_query(tree._tree, tree._dev, q, k, use_kernel=path)
            dt = time.perf_counter() - t0
            print(f"  k={k:>3} path={path:>5}: {dt:.3f}s "
                  f"({len(q)/dt:.0f} q/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        bench_build([1e5], [8.0])
        bench_query(1e5, 2e4, [8])
    else:
        bench_build([2**20, 2**22, 2**24], [4.0, 8.0, 16.0, 32.0])
        bench_query(1e7, 5e5, [1, 8, 16])


if __name__ == "__main__":
    main()
