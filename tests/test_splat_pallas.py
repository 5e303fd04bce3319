"""Pallas splat engine vs oracle — interpret mode on CPU.

The production engine is validated bit-exactly against the oracle on real TPU
hardware (see .claude/skills/verify/SKILL.md); this CPU test keeps the
pipeline (pair expansion, tile sort, chunk alignment, kernel semantics)
covered in CI via the Pallas interpreter on a small population."""
import numpy as np
import pytest

from nbodyhpc_tpu.ops import splat_pallas
from nbodyhpc_tpu.ops.splat import splat_volume_oracle


def test_deposit_align_kernel_smoke_g8():
    """Default-tier smoke (VERDICT r2 ask 7): one tiny interpret-mode
    ``splat_volume`` so a plain ``pytest -q`` exercises the deposit and
    align Pallas kernels (plus the combine/unpack fold) at least once.

    Radii sit in the G8 eligibility interval (2, 3] px, so the G6 bucket
    is empty and skipped eagerly — exactly one deposit program (G8) and
    the shared G6/G8 align/combine programs compile (~22 s on one CPU
    core, all trace/lower; execution is milliseconds). Exact oracle
    parity holds below the rpx >= 4 FMA-contraction quantum regime
    (see tests/test_splat_dense.py::_quantum_atol)."""
    rng = np.random.Generator(np.random.Philox(7))
    n, ppu = 12, 8.0
    grid = (16, 12, 16)
    box = np.array([g / ppu for g in grid], np.float32)
    pos = (rng.random((n, 3)).astype(np.float32) * box).astype(np.float32)
    w = rng.random(n).astype(np.float32) + 0.5
    r = ((2.1 + rng.random(n) * 0.8) / ppu).astype(np.float32)
    got = np.asarray(
        splat_pallas.splat_volume(pos, w, r, ppu, grid, interpret=True)
    )
    want = splat_volume_oracle(pos, w, r, ppu, grid)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_fused_batch_step_clamped_slice():
    """Default-tier pin of the ``_batch_step`` clamped-slice contract: a
    final batch whose row rung runs past the end of the partitioned array
    slides its slice start backward (re-reading already-deposited rows)
    and must mask those front rows out with key -1 / zero weight. Every
    row here is eligible (no trash tail), two classes, batch=512 with a
    300-row final class — rung 512 > 300 forces delta > 0 on the G8
    batch. Exact f32-round-off parity with the oracle. Uses jnp inputs so
    the device-resident fused path (prepartition + _batch_step) runs."""
    import jax.numpy as jnp

    rng = np.random.Generator(np.random.Philox(29))
    n, ppu = 700, 16.0
    grid = (16, 16, 16)
    pos = rng.random((n, 3)).astype(np.float32)
    w = np.ones(n, np.float32)
    rpx = np.concatenate([
        rng.uniform(0.6, 2.0, 400), rng.uniform(2.05, 2.95, 300),
    ]).astype(np.float32)
    r = (rpx / ppu).astype(np.float32)
    got = np.asarray(splat_pallas.splat_volume(
        jnp.asarray(pos), jnp.asarray(w), jnp.asarray(r), ppu, grid,
        batch=512, interpret=True))
    want = splat_volume_oracle(pos, w, r, ppu, grid)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=2e-6)


@pytest.mark.slow
def test_pallas_matches_oracle_interpret():
    rng = np.random.Generator(np.random.Philox(11))
    n = 40
    grid = (20, 12, 20)
    ppu = 8.0
    box = np.array([g / ppu for g in grid], np.float32)
    pos = (rng.random((n, 3)).astype(np.float32) * box).astype(np.float32)
    w = rng.random(n).astype(np.float32) + 0.5
    r = np.concatenate(
        [
            (rng.random(n // 2) * 0.4 / ppu).astype(np.float32),  # sub-pixel
            ((0.6 + rng.random(n - n // 2) * 2.0) / ppu).astype(np.float32),
        ]
    )
    got = np.asarray(
        splat_pallas.splat_volume(pos, w, r, ppu, grid, interpret=True)
    )
    want = splat_volume_oracle(pos, w, r, ppu, grid)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_multi_batch_accumulate_matches_single():
    """The accumulate (prefetch/flush) path across particle batches must
    reproduce the single-batch result."""
    rng = np.random.Generator(np.random.Philox(13))
    n = 600
    grid = (16, 16, 16)
    ppu = 16.0
    pos = rng.random((n, 3)).astype(np.float32)
    w = rng.random(n).astype(np.float32) + 0.5
    r = ((0.6 + rng.random(n) * 2.0) / ppu).astype(np.float32)
    one = np.asarray(splat_pallas.splat_volume(pos, w, r, ppu, grid, interpret=True))
    multi = np.asarray(
        splat_pallas.splat_volume(pos, w, r, ppu, grid, batch=128, interpret=True)
    )
    np.testing.assert_allclose(one, multi, rtol=1e-6, atol=1e-7)


def test_unpack_tiles_folds_multislab():
    """The slab-streaming combine must fold +x/+z/corner halo strips and
    the +y halo lanes into the correct neighbor tiles and drop nothing at
    slab 0.

    Regression: jax 0.9.0's fori_loop miscompiles boolean comparisons on
    the loop index (where(tx > 0, ...) evaluated true at tx=0), which
    double-deposited the first slab's +x spill onto itself; the combine now
    uses zero-padded halo buffers instead of an index-gated add."""
    rng = np.random.Generator(np.random.Philox(9))
    grid = (256, 250, 192)  # (2, 3, 3) tiles: every fold direction exercised
    gxp, gyp, gzp = splat_pallas._grid_pad(grid)
    TX, TY, TZ = splat_pallas.TX, splat_pallas.TY, splat_pallas.TZ
    YT = splat_pallas.YTILE
    H = splat_pallas.HALO
    ntx, nty, ntz = gxp // TX, gyp // YT, gzp // TZ
    ntiles = ntx * nty * ntz
    out = rng.random((ntiles, TX, TZ, TY), dtype=np.float32)
    hx = rng.random((ntiles, H, TZ, TY), dtype=np.float32)
    hz = rng.random((ntiles, TX, H, TY), dtype=np.float32)
    hc = rng.random((ntiles, H, H, TY), dtype=np.float32)

    got = np.asarray(splat_pallas._unpack_tiles(out, hx, hz, hc, grid))

    c6 = out.reshape(ntx, nty, ntz, TX, TZ, TY).copy()
    c6[1:, :, :, :H, :, :] += hx.reshape(ntx, nty, ntz, H, TZ, TY)[:-1]
    c6[:, :, 1:, :, :H, :] += hz.reshape(ntx, nty, ntz, TX, H, TY)[:, :, :-1]
    c6[1:, :, 1:, :H, :H, :] += hc.reshape(ntx, nty, ntz, H, H, TY)[:-1, :, :-1]
    c6[:, 1:, :, :, :, : TY - YT] += c6[:, :-1, :, :, :, YT:]
    ref = c6[..., :YT].transpose(0, 3, 1, 5, 2, 4).reshape(gxp, gyp, gzp)[
        : grid[0], : grid[1], : grid[2]
    ]
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_nondefault_subsample_matches_oracle():
    """subsample_factor != 4 parameterizes the kernel's unrolled subcell
    loops (reference: fragment-shader spec constant, triangle.frag SUBGRID)."""
    rng = np.random.Generator(np.random.Philox(19))
    n = 60
    grid = (24, 20, 16)
    ppu = 16.0
    box = np.array([g / ppu for g in grid], np.float32)
    pos = (rng.random((n, 3)).astype(np.float32) * box).astype(np.float32)
    w = rng.random(n).astype(np.float32) + 0.5
    r = ((0.3 + rng.random(n) * 2.5) / ppu).astype(np.float32)
    for s in (2, 3):
        got = np.asarray(
            splat_pallas.splat_volume(
                pos, w, r, ppu, grid, subsample=s, interpret=True
            )
        )
        want = splat_volume_oracle(pos, w, r, ppu, grid, subsample=s)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_render_points_2d_engine_matches_oracle():
    """The 2D plane is 3D slice 0 shifted half a pixel: the engine-backed
    render_points path must match the 2D oracle to float round-off
    (the half-pixel shift rounds once, so not bit-exact)."""
    from nbodyhpc_tpu.rasterizer import PointRenderer

    rng = np.random.Generator(np.random.Philox(17))
    n = 300
    ppu = 16.0
    pos = rng.random((n, 3)).astype(np.float32) * np.array(
        [2.0, 2.0, 0.6], np.float32
    ) - np.array([0.0, 0.0, 0.3], np.float32)  # z straddles the plane
    w = rng.random(n).astype(np.float32) + 0.5
    r = ((0.2 + rng.random(n) * 2.5) / ppu).astype(np.float32)
    fast = PointRenderer(None, 32, 32, engine="pallas")
    ref = PointRenderer(None, 32, 32, engine="oracle")
    got = fast.render_points(pos, w, r, ppu)
    want = ref.render_points(pos, w, r, ppu)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_radius_buckets_oracle_parity():
    """Mixed radii spanning every engine bucket — sub-pixel, the 8^3 kernel
    (<= 3 px), the 16^3 kernel ((3, 7] px), and the oracle tail (> 7 px) —
    must reproduce the oracle field; the buckets partition the radius axis
    exactly (splat_pallas.G8/G16 eligibility)."""
    rng = np.random.Generator(np.random.Philox(42))
    n = 160
    grid = (48, 44, 40)
    ppu = 48.0
    box = np.array([g / ppu for g in grid], np.float32)
    pos = (rng.random((n, 3)).astype(np.float32) * box).astype(np.float32)
    w = rng.random(n).astype(np.float32) + 0.25
    r = np.empty(n, np.float32)
    r[: n // 4] = rng.random(n // 4).astype(np.float32) * 0.4 + 0.05
    r[n // 4 : n // 2] = rng.random(n // 4).astype(np.float32) * 2.5 + 0.5
    r[n // 2 : 3 * n // 4] = rng.random(n // 4).astype(np.float32) * 4.0 + 3.0
    r[3 * n // 4 :] = rng.random(n - 3 * n // 4).astype(np.float32) * 2.0 + 7.0
    r /= ppu
    # boundary radii land exactly on the bucket edges
    r[0] = 3.0 / ppu
    r[1] = 7.0 / ppu
    got = np.asarray(
        splat_pallas.splat_volume(pos, w, r, ppu, grid, interpret=True)
    )
    want = splat_volume_oracle(pos, w, r, ppu, grid)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_pallas_multitile_oracle_parity():
    """End-to-end parity on a grid spanning >= 2 tiles in every axis, so
    halo folds and the y-crossing second pair are all on the deposit path."""
    rng = np.random.Generator(np.random.Philox(21))
    n = 220
    grid = (192, 160, 80)  # (2, 2, 2) tiles after padding
    ppu = 64.0
    box = np.array([g / ppu for g in grid], np.float32)
    pos = (rng.random((n, 3)).astype(np.float32) * box).astype(np.float32)
    # concentrate some particles near tile seams to hit every fold
    seams = np.array([[128.0, 128.0, 64.0]], np.float32) / ppu
    pos[: n // 4] = (
        seams + (rng.random((n // 4, 3)).astype(np.float32) - 0.5) * (6.0 / ppu)
    ).astype(np.float32)
    w = rng.random(n).astype(np.float32) + 0.5
    r = ((0.3 + rng.random(n) * 2.5) / ppu).astype(np.float32)
    got = np.asarray(
        splat_pallas.splat_volume(pos, w, r, ppu, grid, interpret=True)
    )
    want = splat_volume_oracle(pos, w, r, ppu, grid)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_slab_window_runs_match_oracle(monkeypatch):
    """Memory-bounded x-slab window runs (NBODYHPC_TPU_SPLAT_SLABS=1 forces
    one x-tile slab per run): particles clustered on the x = 128 window
    boundary exercise the carry-strip chaining (+x spill of window 0's last
    slab folds into window 1's first slab), mixed radii exercise every
    bucket inside the windowed pipeline, numpy AND device paths."""
    import jax.numpy as jnp

    monkeypatch.setenv("NBODYHPC_TPU_SPLAT_SLABS", "1")
    rng = np.random.Generator(np.random.Philox(77))
    n = 120
    grid = (256, 24, 24)  # ntx = 2 -> two window runs
    ppu = 32.0
    box = np.array([g / ppu for g in grid], np.float32)
    pos = (rng.random((n, 3)).astype(np.float32) * box).astype(np.float32)
    # half the particles hug the window seam from both sides
    pos[: n // 2, 0] = (
        128.0 + (rng.random(n // 2).astype(np.float32) - 0.5) * 24.0
    ) / ppu
    w = rng.random(n).astype(np.float32) + 0.5
    r = np.empty(n, np.float32)
    r[: n // 3] = rng.random(n // 3) * 2.5 + 0.2
    r[n // 3 : 2 * n // 3] = rng.random(n // 3) * 3.5 + 3.2
    r[2 * n // 3 :] = rng.random(n - 2 * n // 3) * 4.0 + 7.5
    r = (r / ppu).astype(np.float32)
    want = splat_volume_oracle(pos, w, r, ppu, grid)
    got_np = np.asarray(
        splat_pallas.splat_volume(pos, w, r, ppu, grid, interpret=True)
    )
    np.testing.assert_allclose(got_np, want, rtol=1e-6, atol=1e-7)
    got_dev = np.asarray(
        splat_pallas.splat_volume(
            jnp.asarray(pos), jnp.asarray(w), jnp.asarray(r), ppu, grid,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got_dev, want, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_fused_partition_device_multibatch():
    """Fused (class, tile) partition sort on the device path: tiny batches
    force multiple pre-sorted batches per bucket (including partial final
    batches with key padding), mixed radii span every bucket plus the dense
    tail and a few ineligible rows (zero weight, off-grid footprint) that
    must land in the trash section and deposit nothing. Parity vs the
    oracle AND vs the numpy (per-batch-sort) path."""
    import jax.numpy as jnp

    rng = np.random.Generator(np.random.Philox(99))
    n = 400
    grid = (40, 36, 32)
    ppu = 40.0
    box = np.array([g / ppu for g in grid], np.float32)
    pos = (rng.random((n, 3)).astype(np.float32) * box).astype(np.float32)
    w = rng.random(n).astype(np.float32) + 0.25
    r = np.empty(n, np.float32)
    r[: n // 4] = rng.random(n // 4) * 0.4 + 0.05          # sub-pixel
    r[n // 4 : n // 2] = rng.random(n // 4) * 2.5 + 0.5    # base buckets
    r[n // 2 : 3 * n // 4] = rng.random(n // 4) * 4.0 + 3.0  # mid ladder
    r[3 * n // 4 : -8] = rng.random(n // 4 - 8) * 6.0 + 7.5  # G32 + dense
    r[-8:] = rng.random(8) * 2.0 + 16.0                    # dense tail
    r = (r / ppu).astype(np.float32)
    # ineligible rows: zero weight, and a footprint entirely off-grid
    w[5] = 0.0
    pos[6] = (-30.0 / ppu, 0.5, 0.5)
    want = splat_volume_oracle(pos, w, r, ppu, grid)
    got_np = np.asarray(
        splat_pallas.splat_volume(pos, w, r, ppu, grid, interpret=True)
    )
    np.testing.assert_allclose(got_np, want, rtol=1e-6, atol=1e-7)
    got_dev = np.asarray(
        splat_pallas.splat_volume(
            jnp.asarray(pos), jnp.asarray(w), jnp.asarray(r), ppu, grid,
            batch=128, interpret=True,
        )
    )
    np.testing.assert_allclose(got_dev, want, rtol=1e-6, atol=1e-7)


def test_fused_partition_invariants():
    """Fast (pure-XLA) pin of the fused (class, tile) partition sort: keys
    ascending, every boundary offset equal to an independent recomputation,
    per-batch window slices internally sorted with `_pair_keys`-consistent
    local keys, trash rows weight-zeroed, and eligible counts matching the
    radius classes minus the ineligible rows."""
    import jax.numpy as jnp

    rng = np.random.Generator(np.random.Philox(123))
    n = 3000
    grid = (256, 48, 40)  # ntx = 2 for every bucket
    ppu = 64.0
    box = np.array([g / ppu for g in grid], np.float32)
    pos = (rng.random((n, 3)).astype(np.float32) * box).astype(np.float32)
    w = rng.random(n).astype(np.float32) + 0.25
    w[::97] = 0.0  # ineligible: zero weight
    rpx = (rng.random(n).astype(np.float32) ** 2) * 20.0 + 0.05
    r = (rpx / ppu).astype(np.float32)
    pos[1] = (-2.0, 0.1, 0.1)  # ineligible: footprint fully off-grid

    part = splat_pallas.prepartition(
        jnp.asarray(pos), jnp.asarray(w), jnp.asarray(r), ppu, grid
    )
    key = np.asarray(part.key)
    assert np.all(np.diff(key) >= 0)  # globally sorted

    # recompute every particle's fused key from the sorted channels and
    # check it matches the carried key (same math as _fused_partition)
    bases, dense_key, trash_key = splat_pallas._fused_bases(grid)
    ppx_s = jnp.asarray(part.pos_px)
    rr_s = jnp.asarray(part.rpx)
    # trash weights were zeroed, which feeds eligibility; recompute with a
    # nonzero stand-in weight only to verify *tile* placement of real rows
    want = np.full(n, -1, np.int64)
    for g, base in zip(splat_pallas.BUCKETS, bases):
        kg, _ = splat_pallas._pair_keys(
            ppx_s, rr_s, jnp.asarray(part.w), grid, g
        )
        kg = np.asarray(kg)
        nt = splat_pallas._ntiles(grid, g)
        want = np.where(kg < nt, base + kg, want)
    cls = np.asarray(splat_pallas._radius_class(rr_s))
    want = np.where(
        want < 0, np.where(cls == len(splat_pallas.BUCKETS),
                           dense_key, trash_key), want
    )
    # rows the partition classed as trash have w zeroed; if zeroing made a
    # previously-eligible row ineligible on recompute they must BE trash
    mism = want != key
    assert not np.any(mism & (key != trash_key)), np.nonzero(mism)[0][:10]
    assert np.all(np.asarray(part.w)[key >= trash_key] == 0.0)

    # boundary table: offsets equal searchsorted of the recomputed keys
    for bi, (g, tab) in enumerate(
        zip(splat_pallas.BUCKETS, part.wtabs)
    ):
        gxp, gyp, gzp = splat_pallas._grid_pad(grid, g)
        m = (gyp // g.YTILE) * (gzp // splat_pallas.TZ)
        ntx = gxp // splat_pallas.TX
        assert len(tab) == ntx + 1
        for xt in range(ntx + 1):
            bv = bases[bi] + xt * m if xt < ntx else (
                bases[bi + 1] if bi + 1 < len(bases) else dense_key
            )
            assert tab[xt] == np.searchsorted(key, bv), (bi, xt)
    assert part.dense_off == np.searchsorted(key, dense_key)
    assert part.n_huge == int(
        np.searchsorted(key, trash_key) - part.dense_off
    )
    assert abs(part.max_rpx - float(rpx.max())) < 1e-3
