"""Headline benchmark: variable-radius sphere-splat rasterization on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Baseline (BASELINE.md): the reference Vulkan rasterizer deposits a CAMELS
snapshot of 1.68e7 particles into a 1024^3 grid (16 samples/voxel) in ~2.5 s
on an RTX 6000 => 6.7e6 particles/s. vs_baseline is our particles/s over that
reference throughput on the equivalent workload (variable radii, periodic
box, 1024^3 grid, subsample 4).

The radius distribution is an UNCLIPPED lognormal around the mean
interparticle spacing (the CAMELS-like regime the reference README describes,
rasterization/README.md:27-31): the tail runs through the 16^3 Pallas bucket
((3, 7] px) and into the dense large-radius pass (> 7 px), so every radius
class the framework serves is inside the timed region — no radius gaming.

mass_ratio: the deposition semantics themselves (subcell-center counting /
exact sphere volume, reference triangle.frag:25-45 + triangle.vert:41-45)
deposit slightly under w per particle at small radii — measured 0.9983 for
the ORACLE alone on this exact distribution (PERF.md), so a headline
mass_ratio ~0.998 is deposition quantization shared with the reference, not
dropped particles. mass_ratio_expected reports the quantization predicted by
the un-gridded footprint integral on a device-evaluated sample, making the
attribution part of the bench artifact.

Secondary k-NN metric (BENCH_KNN=0 skips): the PERF.md §2 workload — 1e7-
point tree build + 5e5 self-queries k=16 end-to-end through the public
KDTree API (reference harness: kdtree/src/cpp/main.cpp:130-174; measured
proxy baseline on this host: scipy cKDTree 8,862 q/s, build 52 s — PERF.md).
End-to-end numbers ride the axon tunnel, whose bandwidth swings 2-4x day to
day, so the artifact includes its own control: ``tunnel_h2d_mbs`` times a raw
50 MB upload immediately before the kNN runs. Never interpret knn_qps_e2e
without it.
"""
import json
import os
import sys
import time

REF_PARTICLES_PER_S = 1.68e7 / 2.5

_T0 = time.time()


def _stamp(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools

    import jax.numpy as jnp
    import numpy as np

    from nbodyhpc_tpu.ops import splat_pallas
    from nbodyhpc_tpu.ops.ghosts import augment_points_periodic
    from nbodyhpc_tpu.ops.splat import footprint_values, required_halfwidth

    n = int(float(os.environ.get("BENCH_N", 1e8)))
    grid = int(os.environ.get("BENCH_GRID", 1024))
    ppu = float(grid)  # unit box

    rng = np.random.Generator(np.random.Philox(12345))
    # CAMELS-like: positions uniform-ish, radii lognormal around the mean
    # interparticle spacing (~ grid / n^(1/3) pixels), UNclipped above —
    # the tail exercises the G16 bucket and the dense > 7 px pass.
    # Generated in float32 end to end: Generator.lognormal runs the whole
    # pipeline in float64 (~3x the time and memory at 1e8 on this 1-core
    # host, where prep wall time is what bounds the driver's bench run).
    _stamp(f"generating {n:.0e} particles")
    pos = rng.random((n, 3), dtype=np.float32)
    w = np.ones(n, np.float32)
    spacing_px = grid / n ** (1.0 / 3.0)
    rpx = rng.standard_normal(n, dtype=np.float32)
    rpx *= np.float32(0.35)
    np.exp(rpx, out=rpx)
    rpx *= np.float32(spacing_px)
    np.maximum(rpx, np.float32(0.1), out=rpx)
    r = (rpx / ppu).astype(np.float32)
    r_max = float(rpx.max())
    pct_mid = float(np.mean((rpx > 3.0) & (rpx <= 7.0)) * 100.0)
    pct_huge = float(np.mean(rpx > 7.0) * 100.0)

    # periodic ghost augmentation + upload happen OUTSIDE the timed region,
    # matching the reference's methodology: its 2.5 s headline excludes the
    # CPU vertex pre-processing (sort + periodic augmentation),
    # rasterization/README.md:27-31. The timed region is the device render;
    # the density stays in HBM (production disposition).
    _stamp("periodic ghost augmentation")
    gp, gw, gr = augment_points_periodic(pos, w, r, (1.0, 1.0, 1.0))
    # host-side radius-class sort (base <= 3 px < mid <= 7 px < huge) before
    # upload: splat_volume detects class-sorted inputs and skips its device
    # partition sort, whose second full-array copy alive alongside a bucket
    # pass's grid-scale tile buffers OOMs a 16 GB chip at 1e8 -> 1024^3.
    # Host prep, like augmentation, sits outside the timed region (the
    # reference's 2.5 s also excludes its CPU z-sort).
    _stamp("host radius-class sort")
    grpx = gr * np.float32(ppu)
    cls = (grpx > splat_pallas.G8.RMAX).astype(np.int8)
    cls += grpx > splat_pallas.G16.RMAX
    order = np.argsort(cls, kind="stable")
    gp, gw, gr = gp[order], gw[order], gr[order]
    del grpx, cls, order
    _stamp(f"uploading {(gp.nbytes + gw.nbytes + gr.nbytes) / 2**20:.0f} MiB")
    gpj = jnp.asarray(gp)
    gwj = jnp.asarray(gw)
    grj = jnp.asarray(gr)

    def render(p, ww, rr):
        vol = splat_pallas.splat_volume(p, ww, rr, ppu, (grid, grid, grid))
        return float(jnp.sum(vol))

    # warm up / compile on a small slice, then one full pass so the
    # full-shape programs are compiled (persistent cache) before timing
    _stamp("warmup: small-slice render (compiles)")
    render(gpj[:131072], gwj[:131072], grj[:131072])
    _stamp("warmup: full render")
    render(gpj, gwj, grj)

    _stamp("timed render")
    t0 = time.time()
    total = render(gpj, gwj, grj)
    elapsed = time.time() - t0
    _stamp(f"timed render done: {elapsed:.2f}s")

    # mass-quantization audit: expected deposited-mass ratio from the
    # footprint evaluator on an un-gridded sample (centered windows, no
    # clipping), chunked to bound the (C, F, F, F) transient
    ns, cs = 8192, 512
    hw = required_halfwidth(float(rpx[:ns].max()))

    @functools.partial(jax.jit, static_argnames=("hw",))
    def _chunk_mass(ppx, ww, rr, hw):
        _, vals = footprint_values(ppx, ww, rr, hw, 4)
        return jnp.sum(vals, dtype=jnp.float32)

    dep = sum(
        float(
            _chunk_mass(
                jnp.asarray(pos[i : i + cs] * ppu),
                jnp.asarray(w[i : i + cs]),
                jnp.asarray(rpx[i : i + cs]),
                hw,
            )
        )
        for i in range(0, ns, cs)
    )
    mass_ratio_expected = dep / float(w[:ns].sum())

    mass_ratio = total / float(w.sum())
    pps = n / elapsed
    result = {
        "metric": f"splat_{n:.0e}_particles_{grid}^3_periodic",
        "value": round(pps / 1e6, 3),
        "unit": "Mparticles/s",
        "vs_baseline": round(pps / REF_PARTICLES_PER_S, 3),
        "elapsed_s": round(elapsed, 2),
        "mass_ratio": round(mass_ratio, 6),
        "mass_ratio_expected": round(mass_ratio_expected, 6),
        "r_max_px": round(r_max, 2),
        "pct_mid_bucket": round(pct_mid, 3),
        "pct_dense_tail": round(pct_huge, 4),
    }

    if os.environ.get("BENCH_KNN", "1") != "0":
        del gpj, gwj, grj  # free HBM before the kNN workload
        _stamp("kNN workload")
        result.update(_bench_knn(jax, jnp, np))
    _stamp("done")

    print(json.dumps(result))


def _bench_knn(jax, jnp, np):
    """PERF.md §2 workload through the public API, with a raw-upload tunnel
    control so the e2e number is interpretable (see module docstring)."""
    import time

    from nbodyhpc_tpu.kdtree import KDTree

    nk = int(float(os.environ.get("BENCH_KNN_N", 1e7)))
    nq = int(float(os.environ.get("BENCH_KNN_Q", 5e5)))
    rng = np.random.Generator(np.random.Philox(99))
    pts = rng.random((nk, 3), dtype=np.float32)

    # tunnel control: raw 50 MB H2D, timed by a host readback
    ctrl = rng.random((13_107_200,), dtype=np.float32)  # 50 MiB
    t0 = time.time()
    float(jnp.sum(jnp.asarray(ctrl)))
    h2d_mbs = 50.0 / max(time.time() - t0, 1e-9)

    t0 = time.time()
    tree = KDTree(pts, boxsize=1.0)
    build_s = time.time() - t0

    q = pts[:nq]
    # warm the compile cache on a small batch so the timed run measures the
    # pipeline, not XLA compilation (persistent cache carries across rounds)
    tree.query(q[:8192], k=16)
    t0 = time.time()
    d, i = tree.query(q, k=16)
    query_s = time.time() - t0
    assert d.shape == (nq, 16) and float(np.max(d[:, 0])) < 1.0
    return {
        "knn_qps_e2e": round(nq / query_s, 1),
        "knn_build_s": round(build_s, 2),
        "knn_vs_proxy": round(nq / query_s / 8862.0, 3),
        "tunnel_h2d_mbs": round(h2d_mbs, 1),
    }


if __name__ == "__main__":
    main()
