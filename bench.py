"""Headline benchmark: variable-radius sphere-splat rasterization on one chip.

Prints the headline JSON line IMMEDIATELY after the timed render, then (budget
permitting) a second superset line with the k-NN fields. The driver records the
tail of stdout, so the last complete line wins; if the k-NN section is skipped
or dies, the splat-only line is already on the wire.

Wall-clock discipline (round 3): the driver kills the bench at ~600 s. Round
2's artifact was rc=124 with `parsed: null` because pre-timed-region overhead
(cold compiles + tunnel weather) ate the whole budget before the first JSON
byte. This version (a) takes a budget from env `BENCH_BUDGET_S` (default 540),
(b) drops the small-slice warmup render entirely (it compiled 131072-particle
programs the full render never reuses — 124 s of pure waste in r02), (c) emits
the headline line the moment it exists, (d) arms a watchdog that cleanly
exits 0 at the budget once the headline is out, and (e) only enters the k-NN
section when enough budget remains.

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

mass audit: the deposition semantics themselves (subcell-center counting /
exact sphere volume, reference triangle.frag:25-45 + triangle.vert:41-45)
deposit slightly under w per particle at small radii — measured 0.9983 for
the ORACLE alone on this exact distribution (PERF.md). The bench computes
mass_ratio_expected from the un-gridded footprint integral on a
device-evaluated sample and HARD-FAILS if the rendered mass_ratio deviates
from it by more than the sampling tolerance — asserting the physics, not just
finiteness (reference analog: rasterizer main.cpp:124-131 mass ratio report).

Secondary k-NN metric (BENCH_KNN=0 skips): the PERF.md §2 workload — 1e7-
point tree build + 5e5 self-queries k=16, both device-resident and
end-to-end through the public KDTree API (reference harness:
kdtree/src/cpp/main.cpp:130-174; measured reference-binary baseline on
this host's 1-core Xeon: 165,959 qps periodic, build 0.86 s — BASELINE.md,
measured 2026-08-18). Self-queries assert d(p, p) == 0 exactly, like the
reference harness (main.cpp:51-93). End-to-end numbers ride the axon tunnel,
whose bandwidth swings 2-4x day to day, so the artifact includes its own
control: ``tunnel_h2d_mbs`` times a raw 50 MB upload immediately before
the kNN runs. Never interpret knn_qps_e2e without it; ``knn_vs_ref``
scores the device-resident disposition against the reference binary.
"""
import json
import os
import sys
import threading
import time

REF_PARTICLES_PER_S = 1.68e7 / 2.5

_T0 = time.time()
# Default budget: round-3's driver run proves the driver tolerates >= 1600 s
# (BENCH_r03 emitted its headline at +1586 s and recorded rc=0); a 540 s
# self-budget under 2026-08-20-class tunnel weather (360 s for a nominal-8 s
# generation probe) would watchdog-exit before ANY line hit the wire. Early
# emission (kNN-first + provisional lines) covers the case where the driver's
# own timeout is tighter: the parsed tail already holds a complete line.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1200))


def _remaining():
    return BUDGET_S - (time.time() - _T0)


def _stamp(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit(result):
    """One complete JSON line per call. Contract with the driver: it parses
    the LAST complete line on stdout, so later (superset / upgraded) lines
    supersede earlier ones; provisional lines carry their own distinct
    ``metric`` names so a first-match consumer can never confuse them with
    the final headline."""
    print(json.dumps(result), flush=True)


_WATCHDOG_ARMED = False


def _arm_watchdog():
    """Exit 0 cleanly at the budget — the headline line is already printed.

    A blocked jax call (remote Mosaic compile riding tunnel weather) cannot
    be interrupted from Python; os._exit from a daemon timer is the only
    reliable way to beat the driver's SIGKILL and keep rc == 0. Idempotent:
    the first caller (provisional kNN line, degraded splat line, ...) arms
    it; later calls are no-ops.
    """
    global _WATCHDOG_ARMED
    if _WATCHDOG_ARMED:
        return
    _WATCHDOG_ARMED = True

    def _bail():
        _stamp(f"watchdog: budget {BUDGET_S:.0f}s exhausted, exiting with headline")
        os._exit(0)

    t = threading.Timer(max(_remaining() - 5.0, 1.0), _bail)
    t.daemon = True
    t.start()


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import functools

    import jax.numpy as jnp
    import numpy as np

    from nbodyhpc_tpu.ops import splat_pallas
    from nbodyhpc_tpu.ops.ghosts import augment_points_periodic_device
    from nbodyhpc_tpu.ops.splat import footprint_values, required_halfwidth

    n_ask = int(float(os.environ.get("BENCH_N", 1e8)))
    grid = int(os.environ.get("BENCH_GRID", 1024))
    ppu = float(grid)  # unit box

    # CAMELS-like: positions uniform-ish, radii lognormal around the mean
    # interparticle spacing (~ grid / n^(1/3) pixels), UNclipped above —
    # the tail exercises the G16 bucket and the dense > 7 px pass.
    # The workload is generated ON DEVICE: host-side numpy generation +
    # augmentation + a 1.5 GiB tunnel upload cost ~30 min of wall clock on
    # this 1-core host (and the upload swings 10x with tunnel weather),
    # all outside the timed region but able to starve the driver's bench
    # run. Distribution is unchanged (uniform positions, lognormal radii).
    import jax.random as jr

    def _gen(n):
        """Device workload at size n (distribution fixed by the FULL-size
        spacing so a degraded run measures the same radius population the
        1e8 headline does — only fewer draws, never easier radii)."""
        spacing_px = grid / n_ask ** (1.0 / 3.0)
        kp, kr = jr.split(jr.key(12345))
        pos = jr.uniform(kp, (n, 3), jnp.float32)
        rpx_d = jnp.maximum(
            jnp.exp(jr.normal(kr, (n,), jnp.float32) * 0.35) * spacing_px, 0.1
        )
        return pos, rpx_d

    # Tunnel-weather gate: device generation is a handful of cached
    # programs (~8 s nominal) but has been measured at 216-1075 s on
    # IDENTICAL code when the axon tunnel degrades — enough to starve the
    # whole driver budget before the first JSON byte. Stage it: generate a
    # 1/5-size probe first and time it; if the probe alone ate a chunk of
    # the budget, keep the probe AS the workload (same radius
    # distribution, honestly labeled by the metric name and
    # ``"degraded_n": true``) instead of dying unparsed at full size.
    # Degraded floor n/2 (was n/5): the weather that triggers degradation is
    # RTT/program-load dominated and nearly size-INDEPENDENT (measured
    # 2026-08-20 night: probe 360 s, warmup 1505 s at 2e7 — vs 185 s at 1e8
    # the same morning), so shrinking n saves almost no overhead while the
    # fixed per-window/per-group costs amortize 5x worse (2e7 measured
    # 0.67-0.82x vs 1.67x full-size). n/2 keeps the escape hatch at ~2.5x
    # better amortization for ~30 s more device compute.
    n_floor = int(float(os.environ.get("BENCH_N_FLOOR", n_ask // 2)))
    degraded = False
    if n_floor < n_ask:
        _stamp(f"weather probe: generating {n_floor:.0e} particles on device")
        pos, rpx_d = _gen(n_floor)
        float(jnp.max(rpx_d[:1]))  # drain: time the real round trip
        probe_s = time.time() - _T0
        degraded = (
            probe_s > max(45.0, BUDGET_S * 0.12)
            # pre-warm hook: compile/cache the degraded path's programs
            # (their shapes differ from the full-size run's) ahead of a
            # driver run that might take this branch under bad weather
            or os.environ.get("BENCH_FORCE_DEGRADED") == "1"
        )
        if degraded:
            n = n_floor
            _stamp(
                f"probe took {probe_s:.0f}s — tunnel weather; keeping the "
                f"{n_floor:.0e} workload (degraded_n)"
            )
        else:
            del pos, rpx_d
    if not degraded:
        n = n_ask
        _stamp(f"generating {n:.0e} particles on device")
        pos, rpx_d = _gen(n)
    r = rpx_d / np.float32(ppu)
    w = jnp.ones(n, jnp.float32)
    r_max, pct_mid, pct_huge = (
        float(v)
        for v in jax.jit(
            lambda rp: (
                jnp.max(rp),
                jnp.mean((rp > 3.0) & (rp <= 7.0)) * 100.0,
                jnp.mean(rp > 7.0) * 100.0,
            )
        )(rpx_d)
    )
    # host samples for the post-render mass-quantization audit (tiny D2H)
    ns = 8192
    pos_smp = np.asarray(pos[:ns])
    rpx_smp = np.asarray(rpx_d[:ns])

    # periodic ghost augmentation + radius-class partition happen OUTSIDE
    # the timed region, matching the reference's methodology: its 2.5 s
    # headline excludes the CPU vertex pre-processing (sort + periodic
    # augmentation), rasterization/README.md:27-31. The timed region is the
    # device render; the density stays in HBM (production disposition).
    _stamp("periodic ghost augmentation (device)")
    # pad_ok: inert capacity-padding rows (weight 0, radius 0) ride through
    # the partition sort and deposit zero mass — skipping the exact trim
    # keeps every ghost-aug program shape recurring across runs/rounds
    gpj, gwj, grj = augment_points_periodic_device(
        pos, w, r, (1.0, 1.0, 1.0), pad_ok=True
    )
    del pos, w, r, rpx_d  # free HBM before the partition sort
    # fused (radius class, tile) partition sort up front — the TPU analog
    # of the reference's CPU vertex pre-processing (z-sort + periodic
    # augmentation, vertex_utilities.cpp:7-43), excluded from its 2.5 s
    # headline (rasterization/README.md:27-31). The timed render then
    # streams pre-grouped slices with no sorts at all; a second full-array
    # copy alive alongside grid-scale tile buffers would also shrink the
    # slab windows at 1e8 -> 1024^3
    _stamp("device fused (class, tile) partition sort")
    gshape = (grid, grid, grid)
    # donate=True: the augmented copies' ~2 GB is handed into the sort
    # instead of sitting dead alongside its working set (OOM at 1e8)
    part = splat_pallas.prepartition(gpj, gwj, grj, ppu, gshape, donate=True)
    del gpj, gwj, grj  # invalidated by the donation
    float(jnp.sum(part.w[:1]))  # drain the sort transients

    def render(p):
        vol = splat_pallas.splat_volume(p, None, None, ppu, gshape)
        return float(jnp.sum(vol))

    # kNN-FIRST disposition (round 4): round 3's artifact lost its kNN
    # evidence because the splat warmup (unbounded compile risk under
    # tunnel weather) ran first and ate the whole budget. When weather
    # already consumed a big slice of the budget by this point, run the
    # CHEAP, cache-friendly kNN section before any splat program is
    # compiled, and put a provisional kNN-headline line on the wire so
    # even a hung splat compile leaves a parsed artifact (the watchdog
    # then exits 0 with it). When the splat headline lands later it
    # supersedes this line (the driver reads the LAST complete line).
    knn_results = {}
    knn_done = False
    if os.environ.get("BENCH_KNN", "1") != "0" and (
        degraded
        or _remaining() < BUDGET_S * 0.5
        or os.environ.get("BENCH_KNN_FIRST") == "1"
    ):
        _stamp(f"kNN FIRST: {_remaining():.0f}s left before splat "
               "programs — securing the kNN metrics now")

        def _emit_provisional(res):
            _stamp("kNN warm pass done — provisional line on the wire")
            # distinct metric name: the warm pass includes one-time program
            # loads and can read 80x low; a consumer that takes the FIRST
            # match for the final metric name must never see this number
            # (the driver takes the LAST complete line — see _emit).
            _emit({
                "metric":
                    "knn_1e7_tree_5e5_selfqueries_k16_device_warmpass",
                "value": round(res["knn_qps_device"] / 1e3, 1),
                "unit": "kqueries/s",
                "vs_baseline": res["knn_vs_ref"],
                "provisional_splat_pending": True,
                **res,
            })
            _arm_watchdog()

        try:
            knn_results = _bench_knn_device(
                jax, jnp, np, on_first=_emit_provisional
            )
            _emit({
                "metric": "knn_1e7_tree_5e5_selfqueries_k16_device",
                "value": round(knn_results["knn_qps_device"] / 1e3, 1),
                "unit": "kqueries/s",
                "vs_baseline": knn_results["knn_vs_ref"],
                "provisional_splat_pending": True,
                **knn_results,
            })
            knn_done = True
            _arm_watchdog()
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            _stamp(f"kNN-first workload FAILED: {type(e).__name__}: {e}")

    # One full-shape warmup pass: compiles (or deserializes from the
    # persistent cache) every program the timed render runs. A small-slice
    # warmup is useless here — splat_volume streams fixed 8e6 batches, so a
    # small input compiles programs the full render never reuses (it cost
    # 124 s of the r02 budget for nothing).
    #
    # Degradation ladder (tunnel weather can eat the whole budget before
    # this point — generation alone has cost 2-216 s across runs of
    # identical code): the warmup gamble is taken only when the remaining
    # budget covers the MEASURED warm-cache warmup (~200 s, PERF.md §2b)
    # plus the timed render and audit; otherwise SKIP the warmup pass and
    # time the first render directly. That number still carries the
    # one-time per-process program loads (pessimistic but real, and the
    # mass gate still certifies it); `"warm": false` in the JSON marks the
    # disposition. An unparsed rc=124 artifact is the only dishonest
    # outcome.
    warmup_est = float(os.environ.get("BENCH_WARMUP_EST_S", 250))
    warm = _remaining() > warmup_est + 150
    if warm:
        _stamp(f"warmup: full render (budget left {_remaining():.0f}s)")
        tw0 = time.time()
        total_w = render(part)
        warmup_s = time.time() - tw0
        _stamp(f"warmup render done: {warmup_s:.2f}s")
        # Provisional splat line the moment a full-size render EXISTS:
        # round 4 died between here and the timed render with no splat
        # evidence at all. Distinct metric name (program loads ride this
        # number); the timed headline below supersedes it (last line
        # wins). mass_ratio is reported raw; the footprint-integral audit
        # gates only the final headline.
        _emit({
            "metric": f"splat_{n:.0e}_particles_{grid}^3_periodic_warmup",
            "value": round(n / warmup_s / 1e6, 3),
            "unit": "Mparticles/s",
            "vs_baseline": round(n / warmup_s / REF_PARTICLES_PER_S, 3),
            "elapsed_s": round(warmup_s, 2),
            "mass_ratio": round(total_w / float(n), 6),
            "warm": False,
            "degraded_n": degraded,
            "provisional_warmup": True,
            **knn_results,
        })
        _arm_watchdog()
    else:
        _stamp(f"warmup SKIPPED: only {_remaining():.0f}s left — timing the "
               "first render (includes one-time program loads)")

    _stamp("timed render")
    t0 = time.time()
    total = render(part)
    elapsed = time.time() - t0
    _stamp(f"timed render done: {elapsed:.2f}s")

    # mass-quantization audit: expected deposited-mass ratio from the
    # footprint evaluator on an un-gridded sample (centered windows, no
    # clipping), chunked to bound the (C, F, F, F) transient
    cs = 512
    hw = required_halfwidth(float(rpx_smp.max()))

    @functools.partial(jax.jit, static_argnames=("hw",))
    def _chunk_mass(ppx, ww, rr, hw):
        _, vals = footprint_values(ppx, ww, rr, hw, 4)
        return jnp.sum(vals, dtype=jnp.float32)

    dep = sum(
        float(
            _chunk_mass(
                jnp.asarray(pos_smp[i : i + cs] * np.float32(ppu)),
                jnp.ones(cs, jnp.float32),
                jnp.asarray(rpx_smp[i : i + cs]),
                hw,
            )
        )
        for i in range(0, ns, cs)
    )
    mass_ratio_expected = dep / float(ns)

    mass_ratio = total / float(n)  # unit weights: input mass == n
    # Physics gate (reference main.cpp:124-131): the rendered mass ratio
    # must match the footprint-integral prediction. 8192 samples of a
    # lognormal-radius population predict the population ratio to ~1e-3;
    # real mass loss (dropped particles, clipped windows) is >> that.
    mass_err = abs(mass_ratio - mass_ratio_expected)
    if not (np.isfinite(total) and mass_err < 3e-3):
        raise AssertionError(
            f"mass conservation violated: rendered ratio {mass_ratio:.6f} vs "
            f"expected quantization {mass_ratio_expected:.6f} (|err| {mass_err:.2e})"
        )
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
        "warm": warm,
        "degraded_n": degraded,
    }
    result.update(knn_results)  # kNN-first metrics ride every later line
    # headline on the wire FIRST — nothing after this point can lose it
    _emit(result)
    _arm_watchdog()

    knn_min_s = float(os.environ.get("BENCH_KNN_MIN_S", 120))
    if os.environ.get("BENCH_KNN", "1") == "0":
        _stamp("kNN section disabled (BENCH_KNN=0)")
    elif not knn_done and _remaining() < knn_min_s:
        _stamp(f"kNN section SKIPPED: {_remaining():.0f}s left < {knn_min_s:.0f}s")
    else:
        del part  # free HBM before the kNN workload
        _stamp(f"kNN workload (budget left {_remaining():.0f}s)")
        # the kNN metrics are secondary: never let a failure there take
        # the headline splat line down with it. The device-resident
        # metrics land in their own superset line BEFORE the e2e-numpy
        # section (which rides the tunnel and can eat any budget), so a
        # late watchdog exit still carries them.
        if not knn_done:
            try:
                result.update(_bench_knn_device(jax, jnp, np))
                _emit(result)
            except Exception as e:  # noqa: BLE001 — recorded, not swallowed
                _stamp(f"kNN device workload FAILED: {type(e).__name__}: {e}")
                result["knn_error"] = f"{type(e).__name__}: {str(e)[:200]}"
                _emit(result)
        if _remaining() >= 60:
            try:
                result.update(_bench_knn_e2e(jax, jnp, np))
                _emit(result)
            except Exception as e:  # noqa: BLE001
                _stamp(f"kNN e2e workload FAILED: {type(e).__name__}: {e}")
                result["knn_e2e_error"] = f"{type(e).__name__}: {str(e)[:200]}"
                _emit(result)
        else:
            _stamp(f"kNN e2e section SKIPPED: {_remaining():.0f}s left")
    _stamp("done")


def _bench_knn_device(jax, jnp, np, on_first=None):
    """PERF.md §2 workload, device-resident disposition (production on real
    TPU hosts): points generated in HBM, tree built in place,
    ``query_device`` results stay on device (one checksum sync) — measures
    the framework, not the host link. ``on_first`` (optional callable) gets
    a provisional result dict as soon as the first full-size query pass
    completes, before the best-of-3 timing loop."""
    import time

    import jax.random as jr

    from nbodyhpc_tpu.kdtree import KDTree

    nk = int(float(os.environ.get("BENCH_KNN_N", 1e7)))
    nq = int(float(os.environ.get("BENCH_KNN_Q", 5e5)))

    # --- device-resident workload ---
    pts_d = jr.uniform(jr.key(99), (nk, 3), jnp.float32)
    float(jnp.sum(pts_d[:1]))  # materialize before timing
    # best-of-2 build: the first build of this shape class pays the
    # persistent-cache deserialization of the sort program (one-time per
    # process, not per-build); the second measures the steady-state
    # device build the reference's 0.85 s host build compares against
    build_dev_s = float("inf")
    for _ in range(2):
        t0 = time.time()
        tree_d = KDTree(pts_d, boxsize=1.0)
        float(jnp.sum(tree_d._dev[2][:1]))
        build_dev_s = min(build_dev_s, time.time() - t0)
        if _remaining() < 90:
            break
    qd = pts_d[:nq]
    # warm compiles with a FULL-SIZE run: macro decomposition compiles one
    # kernel program per pow2 macro size (512/256/128) and a small warmup
    # only covers the smallest — a cold driver run would then pay minutes
    # of Pallas compiles inside the timed region (measured: 4.8k q/s).
    # The warm pass is itself timed and reported through ``on_first`` as a
    # provisional number: under catastrophic tunnel weather the best-of-3
    # loop below may never finish inside the budget, and a
    # warm-pass-derived line on the wire beats an unparsed artifact.
    t0 = time.time()
    dd, ii = tree_d.query_device(qd, k=16)
    float(jnp.sum(dd[:1]))
    warmpass_s = time.time() - t0
    if on_first is not None:
        on_first({
            "knn_qps_device": round(nq / warmpass_s, 1),
            "knn_build_s_device": round(build_dev_s, 2),
            "knn_vs_ref": round(nq / warmpass_s / 165959.0, 3),
            "knn_warmpass_only": True,
        })
    # best-of-3: the per-chunk scalar syncs ride the axon tunnel, whose
    # LATENCY (not just bandwidth) spikes minute to minute and can double
    # a single pass (measured 2026-08-19: 128k vs 220k q/s on identical
    # code within the hour). Steady-state throughput is the metric; the
    # tunnel is not part of the framework under test (PERF.md §0).
    query_dev_s = float("inf")
    for _ in range(3):
        t0 = time.time()
        dd, ii = tree_d.query_device(qd, k=16)
        chk = float(jnp.sum(dd[:, -1]))  # one sync; results stay in HBM
        query_dev_s = min(query_dev_s, time.time() - t0)
        if _remaining() < 60:
            break
    assert np.isfinite(chk) and dd.shape == (nq, 16)
    # self-query exactness: d(p, p) == 0.0, bit-exact, like the reference
    # harness (kdtree/src/cpp/main.cpp:51-93)
    assert float(jnp.max(dd[:, 0])) == 0.0, "self-query nearest distance != 0"
    return {
        "knn_qps_device": round(nq / query_dev_s, 1),
        "knn_build_s_device": round(build_dev_s, 2),
        # reference kdtree_main on this host, periodic, 1 core (BASELINE.md)
        "knn_vs_ref": round(nq / query_dev_s / 165959.0, 3),
    }


def _bench_knn_e2e(jax, jnp, np):
    """PERF.md §2 workload end-to-end through the public numpy API (host
    arrays both ways) with a raw-upload tunnel control, because under axon
    every byte rides a tunnel whose bandwidth swings 50x day to day
    (measured 0.9-50 MB/s) and e2e numbers are garbage without the
    control."""
    import time

    from nbodyhpc_tpu.kdtree import KDTree

    nk = int(float(os.environ.get("BENCH_KNN_N", 1e7)))
    nq = int(float(os.environ.get("BENCH_KNN_Q", 5e5)))

    # --- end-to-end numpy workload with tunnel control ---
    rng = np.random.Generator(np.random.Philox(99))
    pts = rng.random((nk, 3), dtype=np.float32)
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
    assert d.shape == (nq, 16)
    assert float(np.max(d[:, 0])) == 0.0, "self-query nearest distance != 0"
    return {
        "knn_qps_e2e": round(nq / query_s, 1),
        "knn_build_s": round(build_s, 2),
        "tunnel_h2d_mbs": round(h2d_mbs, 1),
    }


if __name__ == "__main__":
    main()
