"""Hardware roofline baselines for the primitives the engines are built on.

The reference frames its leaf-insert microbenchmarks against memcpy and
reduce-distance rooflines (kdtree/src/cpp/benchmarks/
benchmark_insertion.cpp:253-274) so a kernel number can be read as a
fraction of what the hardware allows. This is the TPU analog: it measures,
on the real chip, the primitives PERF.md's stage splits are scored
against —

- HBM copy bandwidth (the memcpy roofline; bounds the splat align/unpack
  stages and any candidate-stream repack),
- elementwise FMA + reduce throughput (the VPU roofline; bounds the
  deposit subcell loop and the kNN distance evaluation),
- multi-operand ``lax.sort`` rate (the fused (class, tile) partition and
  every per-batch tile sort ride this),
- ``lax.top_k`` row rate (the kNN selection stage is per-ROW bound),
- XLA gather per-element cost (the measurement behind the "no gather on
  hot paths" design rule — CLAUDE.md / PERF.md).

Timing discipline: under the axon remote TPU, ``block_until_ready`` does
not reliably block — every measurement syncs via a scalar host transfer
(``float(jnp.sum(...))``) — and a single dispatch pays a tunnel
round-trip measured in tens of milliseconds, so every case runs ITERS
iterations inside ONE jitted ``lax.fori_loop`` (with a carried data
dependency so XLA cannot dead-code or overlap them away) and divides by
ITERS. Each case runs a warmup call first so compile time never lands in
the measurement.

Usage: python benchmarks/bench_roofline.py [--quick]
Committed results: benchmarks/RESULTS.md.
"""
from __future__ import annotations

import argparse
import time


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.ravel(x)[:1]))


def _make_loop(body, iters):
    """One jitted dispatch running ``body`` ``iters`` times with a carried
    dependency (the loop counter is never branched on — CLAUDE.md jax
    0.9.0 fori_loop miscompile rule)."""
    import jax
    from jax import lax

    def run(*args):
        def step(_, carry):
            return body(carry)

        return lax.fori_loop(0, iters, step, args)

    return jax.jit(run)


def _time(fn, *args, reps=3):
    """Best-of-reps wall time of fn(*args) with a host-transfer sync."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        while isinstance(out, tuple):
            out = out[0]
        _sync(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="smaller arrays (CPU-feasible smoke run)")
    ap.add_argument("--iters", type=int, default=10,
                    help="loop iterations inside each timed dispatch")
    args = ap.parse_args()
    iters = args.iters

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.random as jr

    n = 2**22 if args.quick else 2**28  # 16 MiB / 1 GiB of f32
    rows = 2**12 if args.quick else 2**15  # 512 MiB candidate block max
    ncand = 2**12  # kNN candidate width per row (NRUNS*RCAP scale)
    print(f"backend={jax.default_backend()} n={n} rows={rows} iters={iters}")

    x = jr.normal(jr.key(0), (n,), jnp.float32)
    y = jr.normal(jr.key(1), (n,), jnp.float32)
    _sync(x), _sync(y)

    # 1. HBM copy (memcpy roofline): read n + write n floats per iter.
    #    The +1.0 carried dependency forbids copy elision across iters.
    cp = _make_loop(lambda c: (c[0] + 1.0,), iters)
    cp(x)
    dt = _time(cp, x) / iters
    print(f"hbm_copy: {8 * n / dt / 1e9:.1f} GB/s (r+w)")

    # 2. FMA + reduce (VPU roofline): read 2n, 2 flops/elem per iter;
    #    the scalar result is folded back into operand a as the carry
    red = _make_loop(
        lambda c: (c[0] + jnp.sum(c[0] * c[1], dtype=jnp.float32) * 1e-30,
                   c[1]),
        iters,
    )
    red(x, y)
    dt = _time(red, x, y) / iters
    print(f"fma_reduce: {8 * n / dt / 1e9:.1f} GB/s read, "
          f"{2 * n / dt / 1e9:.1f} Gflop/s")

    # 3. select+add chain (the deposit kernel's inner op mix: compare,
    #    select, accumulate — PERF.md ablation scores the subcell loop at
    #    ~3 VPU ops per inside-sphere test). 8 chained per iter.
    def selacc(c):
        a, b = c
        for _ in range(8):
            a = a + jnp.where(a < b, a, b)
        return a * 0.25, b  # keep magnitudes bounded across iters

    sa = _make_loop(selacc, iters)
    sa(x, y)
    dt = _time(sa, x, y) / iters
    print(f"select_add: {8 * 3 * n / dt / 1e9:.1f} Gop/s (cmp+sel+add)")

    # 4. multi-operand sort by i32 key, 3 f32 payloads (the fused
    #    partition / per-batch tile sort shape). The carried keys are
    #    re-decorrelated each iter (sorted input would flatter the rate).
    m = n // 4
    keys = jr.randint(jr.key(2), (m,), 0, 1 << 20, jnp.int32)

    def sortit(c):
        k, a, b, d = c
        out = jax.lax.sort((k, a, b, d), num_keys=1)
        k2 = out[0] * 1103515245 + 12345  # LCG rehash: unsorted again
        return (jnp.abs(k2) % (1 << 20), out[1], out[2], out[3])

    srt = _make_loop(sortit, iters)
    srt(keys, x[:m], y[:m], x[m : 2 * m])
    dt = _time(srt, keys, x[:m], y[:m], x[m : 2 * m]) / iters
    print(f"sort_mo4: {m / dt / 1e6:.1f} Mkeys/s "
          f"(i32 key + 3 f32 payloads)")

    # 5. top_k over candidate rows (the kNN selection stage); the row sums
    #    of the previous top-k perturb the next input as the carry
    d2 = jr.normal(jr.key(3), (rows, ncand), jnp.float32)

    def topkit(c):
        a = c[0]
        neg = jax.lax.top_k(-a, 16)[0]
        return (a + jnp.sum(neg, axis=1, keepdims=True) * 1e-30,)

    tk = _make_loop(topkit, iters)
    tk(d2)
    dt = _time(tk, d2) / iters
    print(f"top_k16: {dt / rows * 1e6:.2f} us/row over {ncand} candidates")

    # 6. gather per-element cost (why hot paths avoid it); indices are
    #    rehashed from the gathered values each iter
    ng = n // 16
    idx = jr.randint(jr.key(4), (ng,), 0, n, jnp.int32)

    def gatherit(c):
        a, i = c
        g = a[i]
        i2 = (i * 1103515245 + 12345) % n
        return a + jnp.sum(g) * 1e-30, jnp.abs(i2)

    ga = _make_loop(gatherit, iters)
    ga(x, idx)
    dt = _time(ga, x, idx) / iters
    print(f"gather: {dt / ng * 1e9:.2f} ns/element")


if __name__ == "__main__":
    main()
