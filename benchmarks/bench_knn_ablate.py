"""Ablation: what bounds the kNN candidate kernel — DMA issues, distance
VPU work, or the fused top-k?

PERF.md §2's roofline note found the per-block cost (~322 us) consistent
with BOTH ~240 DMA issues (~1 us each) and the G-fold masked distance
work; this script separates them with synthetic run tables whose knobs
move ONE cost at a time (the committed form of the /tmp ablation VERDICT
round 2 asked for). Variants, all on a 512-block macro of the production
fused kernel (`_run_knn_topk`):

  base      18 active runs/piece x 210 lanes (the measured self-query
            shape at 1e7 points, PERF.md §2) — the production operating
            point
  dma0      identical tables with every length zeroed: pl.when skips all
            DMA issues AND waits; rolls/selects/distances/top-k unchanged
            (lnrow=0 just turns the post-select to inf). base - dma0 =
            the full DMA cost (issue + wait + transfer).
  dma-half  9 active runs (half the issues, half the valid lanes): if the
            kernel is issue-bound the time falls ~linearly with the run
            count even though per-lane VPU work is unchanged.
  kpad1     base tables, kpad=1 instead of 16: the per-pass cost of the
            in-VMEM extract-min top-k (15 missing passes).

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

    from nbodyhpc_tpu.ops.knn_pallas import (
        G,
        NRUNS,
        RFETCH,
        _run_knn_topk,
    )

    npad = 1 << 20  # ~1e6-point tree working set (fits HBM comfortably)
    nblocks = 512
    rng = np.random.default_rng(7)
    xyz = jnp.asarray(rng.random((4, npad), np.float32))

    def make_runs(active, runlen):
        starts = (
            rng.integers(0, (npad - RFETCH) // 128,
                         size=(nblocks, G, NRUNS)).astype(np.int32) * 128
        )
        lens = np.zeros((nblocks, G, NRUNS), np.int32)
        lens[:, :, :active] = runlen
        shifts = rng.integers(0, 128, size=(nblocks, G, NRUNS)).astype(
            np.int32
        )
        runs = np.zeros((nblocks, G, 128), np.int32)
        runs[:, :, :NRUNS] = starts
        runs[:, :, NRUNS : 2 * NRUNS] = lens
        runs[:, :, 2 * NRUNS : 3 * NRUNS] = shifts
        return jnp.asarray(runs)

    qblk = np.zeros((nblocks, 128, 4), np.float32)
    qblk[:, :, :3] = rng.random((nblocks, 128, 3))
    qblk[:, :, 3] = rng.integers(0, G, size=(nblocks, 128))
    qblk = jnp.asarray(qblk)

    def timed(runs, kpad):
        def once():
            t0 = time.time()
            dk, _ = _run_knn_topk(
                runs, qblk, xyz, nblocks=nblocks, kpad=kpad,
                periodic=False, box=(0.0, 0.0, 0.0), interpret=False,
            )
            float(jnp.sum(dk[:, :, 0]))  # host sync (axon: never b.u.r.)
            return time.time() - t0

        once()  # compile / cache-deserialize
        return min(once() for _ in range(3))

    variants = {
        "base": (make_runs(18, 210), 16),
        "dma0": (make_runs(18, 0), 16),
        "dma_half": (make_runs(9, 210), 16),
        "kpad1": (make_runs(18, 210), 1),
    }
    out = {}
    for name, (runs, kpad) in variants.items():
        s = timed(runs, kpad)
        out[name] = round(s / nblocks * 1e6, 1)  # us/block
        print(f"{name:9s} {out[name]:8.1f} us/block", flush=True)

    dma = out["base"] - out["dma0"]
    topk_pass = (out["base"] - out["kpad1"]) / 15.0
    print(json.dumps({
        "metric": "knn_kernel_ablation",
        "us_per_block": out,
        "dma_us": round(dma, 1),
        "topk_us_per_pass": round(topk_pass, 2),
        "unit": "us/block (512-block macro, best of 3)",
    }))


if __name__ == "__main__":
    main()
