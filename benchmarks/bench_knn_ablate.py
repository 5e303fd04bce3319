"""Ablation: what bounds the kNN candidate kernel — DMA issues, per-run
gated VPU work, or the fused top-k?

PERF.md §2's roofline note found the per-block cost (~322 us, round-2
kernel) consistent with BOTH ~240 DMA issues (~1 us each) and the G-fold
masked distance work; this script separates them with synthetic run tables
whose knobs move ONE cost at a time (the committed form of the /tmp
ablation VERDICT round 2 asked for). Variants, all on a 512-block macro of
the production fused kernel (`_run_knn_topk`):

  base      ZSEG, 18 active runs/piece x 210 lanes on all 12 piece slots
            (the measured self-query shape at 1e7 points, PERF.md §2)
  dma0      identical tables with every length zeroed: pl.when skips the
            DMA issue AND that run's roll/select/valid work (the gated
            scratch form of _run_distances) — dma0 is the kernel's fixed
            floor (distance adds over NCAND lanes + top-k passes + grid
            overhead); base - dma0 = DMA cost + per-run gated VPU work.
  dma_half  9 active runs (half the issues, half the gated work): if the
            kernel is bound by per-run costs the time falls ~linearly
            with the run count; if by the fixed floor it doesn't move.
  kpad1     base tables, kpad=1 instead of 16: isolates the per-pass cost
            of the in-VMEM extract-min top-k (15 missing passes).
  fullz     FULLZ geometry at its production operating point: 3 of 12
            piece slots populated (blocks are query-bound there), 5 runs
            x 1800 lanes each — ~15 big DMAs per block vs base's ~216
            small ones, NCAND 12288 vs 9216.

Reference analog: kdtree/src/cpp/benchmarks/benchmark_insertion.cpp
frames inserter throughput against memcpy/reduce baselines; this frames
the kernel against its own component costs. Run ON THE REAL CHIP (the
interpret path has completely different cost structure):

    python benchmarks/bench_knn_ablate.py

Results are recorded in benchmarks/RESULTS.md and drive the geometry
choice in ops/knn_pallas.py (fewer/larger DMAs vs less VPU work).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from nbodyhpc_tpu.ops.knn_pallas import FULLZ, ZSEG, _run_knn_topk, \
        fullz_geom

    npad = 1 << 20  # ~1e6-point tree working set (fits HBM comfortably)
    nblocks = 512
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.random((4, npad), np.float32))

    def make_runs(geom, active, runlen, npieces=None):
        NR = geom.NR
        G_ = geom.G
        npieces = G_ if npieces is None else npieces
        starts = (
            rng.integers(0, (npad - geom.RFETCH) // 128,
                         size=(nblocks, G_, NR)).astype(np.int32) * 128
        )
        lens = np.zeros((nblocks, G_, NR), np.int32)
        lens[:, :npieces, :active] = runlen
        shifts = rng.integers(0, 128, size=(nblocks, G_, NR)).astype(
            np.int32
        )
        runs = np.zeros((nblocks, G_, 128), np.int32)
        runs[:, :, :NR] = starts
        runs[:, :, NR : 2 * NR] = lens
        runs[:, :, 2 * NR : 3 * NR] = shifts
        return jnp.asarray(runs)

    qblk = np.zeros((nblocks, 128, 4), np.float32)
    qblk[:, :, :3] = rng.random((nblocks, 128, 3))
    qblk[:, :, 3] = rng.integers(0, 3, size=(nblocks, 128))
    qblk = jnp.asarray(qblk)

    def timed(runs, kpad, geom, kseg=0):
        def once():
            t0 = time.time()
            dk, _ = _run_knn_topk(
                runs, qblk, xyz, nblocks=nblocks, kpad=kpad,
                periodic=False, box=(0.0, 0.0, 0.0), interpret=False,
                geom=geom, kseg=kseg,
            )
            float(jnp.sum(dk[:, :, 0]))  # host sync (axon: never b.u.r.)
            return time.time() - t0

        once()  # compile / cache-deserialize
        return min(once() for _ in range(3))

    # fz1024 = the round-5 production rung for the 1e7 uniform tree
    # (tree_plan: NR=9, RCAP=1024, NCAND 9216; ~3 slots x ~857 lanes per
    # neighbor-x slice); _seg variants ablate the two-level top-k depth
    fz1024 = fullz_geom(1024)
    variants = {
        "base": (make_runs(ZSEG, 18, 210), 16, ZSEG, 0),
        "dma0": (make_runs(ZSEG, 18, 0), 16, ZSEG, 0),
        "dma_half": (make_runs(ZSEG, 9, 210), 16, ZSEG, 0),
        "kpad1": (make_runs(ZSEG, 18, 210), 1, ZSEG, 0),
        "fullz": (make_runs(FULLZ, 5, 1800, npieces=3), 16, FULLZ, 0),
        "fz1024": (make_runs(fz1024, 9, 857, npieces=3), 16, fz1024, 0),
        "fz1024_seg6": (make_runs(fz1024, 9, 857, npieces=3), 16, fz1024, 6),
        "fz1024_seg4": (make_runs(fz1024, 9, 857, npieces=3), 16, fz1024, 4),
        "base_seg6": (make_runs(ZSEG, 18, 210), 16, ZSEG, 6),
    }
    out = {}
    for name, (runs, kpad, geom, kseg) in variants.items():
        s = timed(runs, kpad, geom, kseg)
        out[name] = round(s / nblocks * 1e6, 1)  # us/block
        print(f"{name:12s} {out[name]:8.1f} us/block", flush=True)

    dma = out["base"] - out["dma0"]
    topk_pass = (out["base"] - out["kpad1"]) / 15.0
    print(json.dumps({
        "metric": "knn_kernel_ablation",
        "us_per_block": out,
        "dma_plus_gated_us": round(dma, 1),
        "topk_us_per_pass": round(topk_pass, 2),
        "unit": "us/block (512-block macro, best of 3)",
    }))


if __name__ == "__main__":
    main()
