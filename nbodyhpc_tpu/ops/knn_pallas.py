"""Pallas k-NN candidate kernel: DMA-fed neighborhood scan.

XLA's gather on TPU costs ~27 ns *per element* (measured), which caps the
pure-XLA query path at a few thousand queries/s. This kernel replaces the
first expanding-cube pass with hardware DMA: queries are sorted by cell id,
grouped into 128-query blocks, and each block's 27-cell neighborhoods are
fetched as at most 36 *contiguous runs* of the sorted cell-list (a z-interval
of cells at fixed (x, y) is one run — the same contiguity the reference's
AVX2 leaf scan exploits, reference kdtree_opt.hpp:105-248). All run DMAs are
issued up front, distances are evaluated on the VPU per run, and the dense
[128, NRUNS*RCAP] distance block is handed back for XLA top_k.

Exactness is preserved by flags: blocks spanning more than two cell columns,
or with any run longer than RCAP, mark their queries unconverged and the
standard escalation ladder (ops/knn.py) finishes them.
"""
from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .metrics import wrap_min_image as _wrap_min_image

QB = 128          # queries per block
NRUNS = 36        # run slots (2 columns x 9 neighbors x 2 periodic z-splits)
RCAP = 256        # candidates per run (128-multiple; run overflow -> flag)
NCAND = NRUNS * RCAP
G = 12            # column-pair pieces packed per block (occupancy: a piece
                  # averages ~10 queries at self-query densities, so packing
                  # ~12 pieces fills a 128-query block instead of leaving it
                  # 92% empty — top_k and result transfer charge per ROW)


RFETCH = RCAP + 128  # aligned fetch width (DMA offsets must be 128-aligned)


class KGeom(NamedTuple):
    """Kernel geometry: pieces per block, run slots per piece, lanes per run.

    Two presets trade DMA issue count against candidate focus (the round-2
    ablation found the kernel DMA-issue-bound at ~240 small fetches per
    block, PERF.md §2):

    - ``ZSEG`` (the original): pieces are column pairs x z-segments; runs
      are per-neighbor-column z-windows — tightly focused candidates
      (~41% of NCAND valid) but ~18-36 small DMAs per piece. Serves ANY
      tree density (the z-segment bounds the candidate budget).
    - ``FULLZ``: pieces are single cell columns over their FULL z extent;
      the 3x3 neighbor columns collapse to 3 *contiguous, gapless* slices
      of the z-major sorted point array (one per neighbor x), so a piece
      costs ~3-6 large DMAs instead of ~18-36 small ones, and the
      convergence bound drops the z face entirely (z is fully scanned).
      Eligible only while a 3-column slice fits the slot budget
      (NR * RCAP lanes ~ 12k candidates/piece — trees up to ~1.4k points
      per cell column, e.g. 1e7-2.5e7 uniform points at occupancy ~10);
      denser trees keep ZSEG.
    """

    G: int        # piece slots per block
    NR: int       # physical run slots per piece
    RCAP: int     # candidate lanes per run slot (128-multiple)

    @property
    def RFETCH(self) -> int:  # aligned fetch width per run DMA
        return self.RCAP + 128

    @property
    def NCAND(self) -> int:   # candidate lanes per query row
        return self.NR * self.RCAP


# read at CALL time by query_blocks (tests monkeypatch a small geometry
# for interpret-mode runs; RCAP/NRUNS/NCAND must be patched consistently)
ZSEG = KGeom(G=G, NR=NRUNS, RCAP=RCAP)
# FULLZ family: NR = 9 physical slots (3 per neighbor-x slice) so the slot
# width RCAP can be sized to the TREE (tree_plan picks the smallest rung
# whose 3 slots cover the measured max 3-column slice) instead of paying a
# worst-case 12288-lane budget on every block: every kernel cost that
# scales with NCAND — the distance evaluation, the dblk writes, and every
# extract-min top-k pass — shrinks with it (PERF.md §2: the fixed floor
# is NCAND-wide work). FULLZ is the largest rung (compat alias).
FULLZ_RCAP_RUNGS = (512, 1024, 2048)


def fullz_geom(rcap: int) -> KGeom:
    return KGeom(G=12, NR=9, RCAP=rcap)


FULLZ = fullz_geom(FULLZ_RCAP_RUNGS[-1])


def _start_run_dmas(runs_ref, xyz_ref, cand, sems, geom):
    """Kick off every non-empty run's candidate fetch up front (all DMAs
    in flight while the VPU works)."""
    for g in range(geom.G):
        for r in range(geom.NR):
            ln = runs_ref[0, g, geom.NR + r]

            @pl.when(ln > 0)  # zero-length runs (and empty piece slots)
            def _():          # skip the DMA entirely
                s0 = pl.multiple_of(runs_ref[0, g, r], 128)
                pltpu.make_async_copy(
                    xyz_ref.at[:, pl.ds(s0, geom.RFETCH)],
                    cand.at[g * geom.NR + r],
                    sems.at[g * geom.NR + r],
                ).start()


def _run_distances(runs_ref, xyz_ref, cand, sems, cxyz_s, valid_s, q,
                   masks, r, geom, periodic: bool, box):
    """[QB, RCAP] squared distances from run slot ``r`` of each query's own
    piece (inf outside the run / for pad queries).

    Row-selects each piece's candidate COORDINATES into one [QB, RCAP]
    lane set first (one select per piece per dim, ``masks`` precomputed
    [QB, 1] piece-membership), then evaluates the distance ONCE. The
    original form evaluated the full distance block per piece and selected
    the results — G x the VPU work; the kernel was VPU-bound there
    (PERF.md §2 roofline note). The selection chain accumulates in VMEM
    scratch under ``pl.when(ln > 0)`` so piece slots with an empty run
    slot r cost NO vector work at all (a block typically has 1-3 active
    pieces out of G under the FULLZ geometry — an unconditional chain
    would burn G * 4 selects per lane regardless)."""
    qx, qy, qz, _ = q
    lane = jax.lax.broadcasted_iota(jnp.int32, (QB, geom.RCAP), 1)
    # rows never written keep garbage coordinates from the previous run
    # slot; valid_s gates them to inf (jnp.where picks inf even off NaN)
    valid_s[...] = jnp.zeros((QB, geom.RCAP), jnp.float32)
    for g in range(geom.G):
        ln = runs_ref[0, g, geom.NR + r]

        @pl.when(ln > 0)
        def _():
            pltpu.make_async_copy(
                xyz_ref.at[:, pl.ds(
                    pl.multiple_of(runs_ref[0, g, r], 128), geom.RFETCH)],
                cand.at[g * geom.NR + r],
                sems.at[g * geom.NR + r],
            ).wait()
            shift = runs_ref[0, g, 2 * geom.NR + r]

            # roll the run's candidates to lane 0 (run starts at `shift`)
            rolled = pltpu.roll(
                cand[g * geom.NR + r],
                jax.lax.rem(geom.RFETCH - shift, geom.RFETCH),
                axis=1,
            )
            for dim in range(3):
                row = rolled[dim, : geom.RCAP][None, :]
                cxyz_s[dim] = jnp.where(
                    masks[g], jnp.broadcast_to(row, (QB, geom.RCAP)),
                    cxyz_s[dim],
                )
            valid_s[...] = jnp.where(
                masks[g], (lane < ln).astype(jnp.float32), valid_s[...]
            )

    d2 = jnp.zeros((QB, geom.RCAP), jnp.float32)
    for dim, qd in ((0, qx), (1, qy), (2, qz)):
        d = qd - cxyz_s[dim]
        if periodic:
            d = _wrap_min_image(d, float(box[dim]))
        d2 = d2 + d * d
    return jnp.where(valid_s[...] > 0, d2, jnp.inf)


def _q_columns(q_ref):
    return (q_ref[0, :, 0:1], q_ref[0, :, 1:2], q_ref[0, :, 2:3],
            q_ref[0, :, 3:4])  # piece id; pad slots carry -1: no piece


def _piece_masks(qg, geom):
    """[QB, 1] piece-membership mask per piece slot, hoisted across all
    run slots (pad rows carry -1 and match none)."""
    return tuple(qg == float(g) for g in range(geom.G))


def _knn_kernel(runs_ref, q_ref, xyz_ref, out_ref, cand, cxyz_s, valid_s,
                sems, *, geom, periodic: bool, box):
    # runs_ref: [1, G, 128] SMEM i32 per piece g: s0[0:NR] (128-aligned),
    #           lens[NR:2NR], shift[2NR:3NR] (s - s0)
    # q_ref: [1, QB, 4] VMEM f32: qx, qy, qz, piece id per query
    # xyz_ref: [4, npad] ANY
    # out_ref: [1, QB, NCAND] VMEM block (pipelined write); column slot r
    #          holds, for each query, the distances from ITS piece's run r
    # cand: VMEM [G*NR, 4, RFETCH]; sems: DMA[G*NR]
    _start_run_dmas(runs_ref, xyz_ref, cand, sems, geom)
    q = _q_columns(q_ref)
    masks = _piece_masks(q[3], geom)
    for r in range(geom.NR):
        out_ref[0, :, r * geom.RCAP : (r + 1) * geom.RCAP] = _run_distances(
            runs_ref, xyz_ref, cand, sems, cxyz_s, valid_s, q, masks, r,
            geom, periodic, box
        )


def _knn_topk_kernel(runs_ref, q_ref, xyz_ref, dk_ref, sk_ref, cand, dblk,
                     cxyz_s, valid_s, sems, *, geom, periodic: bool, box,
                     kpad: int, kseg: int = 0):
    """Fused candidate distances + exact top-k, never leaving VMEM.

    The [QB, NCAND] distance block stays in a VMEM scratch and the
    smallest entries are pulled out in ascending order (ties resolved to
    the lowest candidate slot, exactly ``lax.top_k``'s tie rule, so the
    fused and two-stage paths are interchangeable). Replaces the XLA
    sort-based ``top_k`` (~1.2 us/row, PERF.md §2) AND the
    [nblocks, QB, NCAND] HBM round trip (2.4 GB per 512-block macro).

    ``kseg == 0``: ``kpad`` full-width extract-min passes (each pass
    re-reads/re-writes the whole block — the round-3 floor).

    ``kseg > 0``: two-level extraction. NCAND lanes are viewed as
    W = NCAND/128 slices of 128 "segments" (segment = lane mod 128, so
    z-adjacent candidates round-robin across segments); ``kseg`` passes
    extract each segment's smallest entries into a [QB, kseg*128]
    shortlist (value + true lane), then ``kpad`` cheap passes extract
    the global top-k from the narrow shortlist, tie-breaking on the TRUE
    lane so the ``lax.top_k`` rule is preserved exactly. Full-width
    passes drop from kpad to kseg. EXACTNESS GUARD: a row whose top-kpad
    takes ``kseg`` entries from one segment may be missing that
    segment's (kseg+1)-th candidate; such rows (adversarially clustered
    — a random row needs >= kseg of its top-k in one lane-residue class,
    P ~ 1e-4) raise the overflow flag in ``sk`` lane 127 and both
    epilogues route them to the exact ladder. Requires kpad <= 64 (lane
    127 must be a filler lane).

    Rows with fewer than ``kpad`` finite candidates may repeat an
    already-extracted slot on the inf tail (there is no sentinel above
    inf to retire them with); both epilogues sanitize non-finite rows
    (index -> n, ladder fallback), so those duplicates are unobservable.
    """
    _start_run_dmas(runs_ref, xyz_ref, cand, sems, geom)
    q = _q_columns(q_ref)
    masks = _piece_masks(q[3], geom)
    for r in range(geom.NR):
        dblk[:, r * geom.RCAP : (r + 1) * geom.RCAP] = _run_distances(
            runs_ref, xyz_ref, cand, sems, cxyz_s, valid_s, q, masks, r,
            geom, periodic, box
        )

    cols = jax.lax.broadcasted_iota(jnp.int32, (QB, 128), 1)
    outd = jnp.full((QB, 128), jnp.inf, jnp.float32)
    outi = jnp.zeros((QB, 128), jnp.int32)

    if kseg == 0:
        lanes = jax.lax.broadcasted_iota(jnp.int32, (QB, geom.NCAND), 1)
        for i in range(kpad):
            d = dblk[...]
            m = jnp.min(d, axis=1, keepdims=True)
            am = jnp.min(
                jnp.where(d == m, lanes, geom.NCAND), axis=1, keepdims=True
            )
            outd = jnp.where(cols == i, m, outd)
            outi = jnp.where(cols == i, am, outi)
            dblk[...] = jnp.where(lanes == am, jnp.inf, d)
        dk_ref[0] = outd
        sk_ref[0] = outi
        return

    assert kpad <= 64, "segmented top-k needs sk lane 127 free"
    W = geom.NCAND // 128
    # phase 1: per-segment top-kseg shortlist (kseg full-width passes)
    short_d, short_i = [], []
    for j in range(kseg):
        m = dblk[:, 0:128]
        wid = jnp.zeros((QB, 128), jnp.int32)
        for w in range(1, W):
            sl = dblk[:, w * 128 : (w + 1) * 128]
            c = sl < m  # strict: first occurrence wins (lowest lane)
            m = jnp.where(c, sl, m)
            wid = jnp.where(c, w, wid)
        for w in range(W):
            sl = dblk[:, w * 128 : (w + 1) * 128]
            dblk[:, w * 128 : (w + 1) * 128] = jnp.where(
                wid == w, jnp.inf, sl
            )
        short_d.append(m)
        short_i.append(
            wid * 128 + jax.lax.broadcasted_iota(jnp.int32, (QB, 128), 1)
        )
    SD = jnp.concatenate(short_d, axis=1)  # [QB, kseg*128]
    SI = jnp.concatenate(short_i, axis=1)

    # phase 2: global top-kpad from the narrow shortlist
    seg_iota = jax.lax.broadcasted_iota(jnp.int32, (QB, 128), 1)
    cnt = jnp.zeros((QB, 128), jnp.int32)
    for i in range(kpad):
        m = jnp.min(SD, axis=1, keepdims=True)
        # tie-break on the TRUE lane (shortlist order is (pass, segment),
        # not lane order)
        am = jnp.min(
            jnp.where(SD == m, SI, geom.NCAND), axis=1, keepdims=True
        )
        outd = jnp.where(cols == i, m, outd)
        outi = jnp.where(cols == i, am, outi)
        SD = jnp.where(SI == am, jnp.inf, SD)
        cnt = cnt + jnp.where(
            jnp.isfinite(m) & (seg_iota == jax.lax.rem(am, 128)), 1, 0
        )
    ovf = (jnp.max(cnt, axis=1, keepdims=True) >= kseg).astype(jnp.int32)
    outi = jnp.where(cols == 127, ovf, outi)
    dk_ref[0] = outd
    sk_ref[0] = outi


@functools.partial(
    jax.jit,
    static_argnames=("nblocks", "periodic", "box", "interpret", "geom"),
)
def _run_knn(runs, qblk, xyz, nblocks, periodic, box, interpret,
             geom: KGeom = ZSEG):
    kernel = functools.partial(
        _knn_kernel, geom=geom, periodic=periodic, box=box
    )
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, geom.G, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, QB, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, QB, geom.NCAND), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (nblocks, QB, geom.NCAND), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((geom.G * geom.NR, 4, geom.RFETCH), jnp.float32),
            pltpu.VMEM((3, QB, geom.RCAP), jnp.float32),
            pltpu.VMEM((QB, geom.RCAP), jnp.float32),
            pltpu.SemaphoreType.DMA((geom.G * geom.NR,)),
        ],
        # FULLZ scratch (~13 MB) + Mosaic's RMW stack exceeds the 16 MB
        # default scoped-vmem limit (measured 21 MB); v5e VMEM is 128 MB
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(runs, qblk, xyz)


def _kpad(k: int) -> int:
    """Pass count for the fused kernel: next power of two (bounds the
    compiled-shape set to 8 across every user k in [1, 128])."""
    p = 1
    while p < k:
        p *= 2
    return p


def _kseg(kpad: int, ncand: int) -> int:
    """Segment-shortlist depth for the two-level fused top-k (0 = plain
    kpad-pass extraction). Env ``NBODYHPC_KNN_SEGTOPK`` overrides (0
    disables, N forces depth N — the on-chip ablation knob). Default: 4
    full-width passes instead of kpad when the workload is wide enough
    for the narrow phase-2 to be a win and lane 127 is free for the
    overflow flag (measured 2026-08-21, 1e7/5e5/k=16: kseg=4 877k q/s,
    kseg=6 838k, plain ~820k — benchmarks/RESULTS.md; the
    overflow->ladder rate at depth 4 is negligible on real data: a row
    needs >= 4 of its top-k in one lane-residue class)."""
    env = os.environ.get("NBODYHPC_KNN_SEGTOPK")
    if env is not None:
        v = int(env)
        return 0 if v <= 0 else min(v, kpad)
    if 8 <= kpad <= 64 and ncand >= 4096:
        return 4
    return 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "nblocks", "kpad", "periodic", "box", "interpret", "geom", "kseg"
    ),
)
def _run_knn_topk(runs, qblk, xyz, nblocks, kpad, periodic, box, interpret,
                  geom: KGeom = ZSEG, kseg: int = 0):
    """Fused kernel: (dk [nblocks, QB, 128] f32 ascending, sk i32 candidate
    slots); lanes >= kpad are inf/0 filler (with ``kseg > 0``, sk lane
    127 carries the segment-overflow flag). Requires k <= 128 (larger k
    takes the two-stage _run_knn + _topk_blocks path)."""
    kernel = functools.partial(
        _knn_topk_kernel, geom=geom, periodic=periodic, box=box, kpad=kpad,
        kseg=kseg,
    )
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, geom.G, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, QB, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, QB, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QB, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nblocks, QB, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, QB, 128), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((geom.G * geom.NR, 4, geom.RFETCH), jnp.float32),
            pltpu.VMEM((QB, geom.NCAND), jnp.float32),
            pltpu.VMEM((3, QB, geom.RCAP), jnp.float32),
            pltpu.VMEM((QB, geom.RCAP), jnp.float32),
            pltpu.SemaphoreType.DMA((geom.G * geom.NR,)),
        ],
        # FULLZ scratch (~13 MB) + Mosaic's RMW stack exceeds the 16 MB
        # default scoped-vmem limit (measured 21 MB); v5e VMEM is 128 MB
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(runs, qblk, xyz)


def build_blocks(tree, queries_w, qcell):
    """Host prep (vectorized numpy): sort queries by cell, build per-PIECE
    run tables with static slot layout run = colsel*18 + neighbor*2 + zseg
    (a piece = one column-pair/z-segment group, <= QB queries), then pack up
    to G pieces into each physical kernel block so blocks run nearly full.

    Returns (order, qmap [nblocks*QB] (flat slot -> sorted query index),
    qblk [nblocks, QB, 4] f32 (xyz + piece slot), runs [nblocks, G, 128]
    i32, piece_of_sorted [Q], blk_of_piece, gslot, flagged [npieces] bool).
    """
    dims = np.asarray(tree.dims).astype(np.int64)
    Cx, Cy, Cz = (int(v) for v in dims)
    offsets = tree.offsets_host()
    npad = tree.xyz.shape[1]
    periodic = tree.periodic

    cid = (qcell[:, 0].astype(np.int64) * Cy + qcell[:, 1]) * Cz + qcell[:, 2]
    order = np.argsort(cid, kind="stable")
    Q = queries_w.shape[0]
    qs = queries_w[order]
    cs = cid[order]

    # blocks cover one column *pair* each (<= 2 distinct (x, y) columns by
    # construction) and a bounded z-segment (so 18 column-runs of the segment's
    # z-union fit the NRUNS*RCAP candidate budget); heavy groups split into
    # multiple QB-sized blocks
    colid = cs // Cz
    avg_occ = max(tree.n / max(tree.ncells, 1), 1.0)
    zseg = int(max(1, NCAND / (18.0 * 2.0 * avg_occ) - 2))
    czs_all = cs % Cz
    pair = (colid // 2) * ((Cz + zseg - 1) // zseg + 1) + czs_all // zseg
    if Q:
        change = np.nonzero(np.diff(pair))[0] + 1
        pstarts = np.concatenate([[0], change]).astype(np.int64)
        pcounts = np.diff(np.concatenate([pstarts, [Q]]))
    else:
        pstarts = np.zeros(1, np.int64)
        pcounts = np.zeros(1, np.int64)
    nb_per = np.maximum((pcounts + QB - 1) // QB, 1)
    bbase = np.concatenate([[0], np.cumsum(nb_per)]).astype(np.int64)
    nblocks = max(int(bbase[-1]), 1)

    grp = np.repeat(np.arange(len(pcounts)), pcounts)
    j = np.arange(Q) - pstarts[grp]
    blockq = bbase[grp] + j // QB
    slotq = j % QB
    flat_slot = blockq * QB + slotq

    qmap = np.full(nblocks * QB, -1, np.int64)
    qmap[flat_slot] = np.arange(Q)
    valid_slot = (qmap >= 0).reshape(nblocks, QB)

    def gatherq(a, fill):
        out = np.full(nblocks * QB, fill, np.int64)
        out[flat_slot] = a
        return out.reshape(nblocks, QB)

    col = gatherq(colid, 0)
    cz = gatherq(qcell[order][:, 2].astype(np.int64), 0)

    big = np.iinfo(np.int64).max
    colA = np.where(valid_slot, col, big).min(axis=1)
    colB = np.where(valid_slot, col, -1).max(axis=1)
    colA = np.where(colA == big, 0, colA)
    colB = np.maximum(colB, colA)
    selA = valid_slot & (col == colA[:, None])
    selB = valid_slot & (col == colB[:, None])
    flagged = np.zeros(nblocks, bool)

    def zrange(sel):
        zz = np.where(sel, cz, big)
        z0 = zz.min(axis=1) - 1
        zz = np.where(sel, cz, np.iinfo(np.int64).min)
        z1 = zz.max(axis=1) + 1
        return z0, z1

    zA0, zA1 = zrange(selA)
    zB0, zB1 = zrange(selB)
    colxyA = np.stack([colA // Cy, colA % Cy], 1)
    colxyB = np.stack([colB // Cy, colB % Cy], 1)

    starts = np.zeros((nblocks, NRUNS), np.int64)
    lens = np.zeros((nblocks, NRUNS), np.int64)
    cells = np.zeros((nblocks, NRUNS), np.int64)
    dup_col = colA == colB  # single-column blocks: skip the B slots

    # A/B column deltas (wrapped for periodic) to dedupe shared neighbor
    # columns: a candidate must appear in exactly one run or top-k would
    # return the same point twice
    ddx = colxyB[:, 0] - colxyA[:, 0]
    ddy = colxyB[:, 1] - colxyA[:, 1]
    if periodic:
        ddx = np.mod(ddx + Cx // 2, Cx) - Cx // 2
        ddy = np.mod(ddy + Cy // 2, Cy) - Cy // 2
    zu0 = np.minimum(zA0, zB0)
    zu1 = np.maximum(zA1, zB1)

    for csel, (cxy, z0c, z1c, active) in enumerate(
        (
            (colxyA, zA0, zA1, np.ones(nblocks, bool)),
            (colxyB, zB0, zB1, ~dup_col),
        )
    ):
        for nb in range(9):
            dx, dy = nb // 3 - 1, nb % 3 - 1
            if csel == 0:
                # A-slot: if this neighbor column is also in B's 3x3, cover
                # the z-union here (and B's slot will skip it)
                shared = (
                    (np.abs(dx - ddx) <= 1) & (np.abs(dy - ddy) <= 1)
                    & ~dup_col
                )
                z0 = np.where(shared, zu0, z0c)
                z1 = np.where(shared, zu1, z1c)
                skip = np.zeros(nblocks, bool)
            else:
                # B-slot: skip neighbor columns already covered by A
                skip = (np.abs(dx + ddx) <= 1) & (np.abs(dy + ddy) <= 1)
                z0, z1 = z0c, z1c
            x = cxy[:, 0] + dx
            y = cxy[:, 1] + dy
            if periodic:
                x %= Cx
                y %= Cy
                inb = active & ~skip
                za = np.mod(z0, Cz)
                span = np.minimum(z1 - z0 + 1, Cz)
                first = np.minimum(span, Cz - za)
                seg = [(za, first), (np.zeros_like(za), span - first)]
            else:
                inb = active & ~skip & (x >= 0) & (x < Cx) & (y >= 0) & (y < Cy)
                x = np.clip(x, 0, Cx - 1)
                y = np.clip(y, 0, Cy - 1)
                za = np.clip(z0, 0, Cz - 1)
                zb = np.clip(z1, 0, Cz - 1)
                seg = [(za, zb - za + 1), (np.zeros_like(za), np.zeros_like(za))]
            base = (x * Cy + y) * Cz
            for si, (zs, zl) in enumerate(seg):
                ri = csel * 18 + nb * 2 + si
                zl = np.maximum(zl, 0)
                use = inb & (zl > 0)
                s = offsets[np.where(use, base + zs, 0)].astype(np.int64)
                e = offsets[np.where(use, base + zs + zl, 0)].astype(np.int64)
                ln = np.where(use, e - s, 0)
                starts[:, ri] = np.where(use, s, 0)
                lens[:, ri] = ln
                cells[:, ri] = np.where(use, zl, 0)

    # repack logical runs into RCAP-sized physical slots (long z-runs split
    # across consecutive slots); more pieces than slots -> flag for the ladder
    pieces = (lens + RCAP - 1) // RCAP
    total = pieces.sum(axis=1)
    flagged |= total > NRUNS
    excl = np.cumsum(pieces, axis=1) - pieces  # exclusive prefix
    j = np.arange(NRUNS)
    i_of = (excl[:, :, None] <= j[None, None, :]).sum(axis=1) - 1  # [nb, 36]
    i_of = np.clip(i_of, 0, NRUNS - 1)
    part = j[None, :] - np.take_along_axis(excl, i_of, axis=1)
    pstart = np.take_along_axis(starts, i_of, axis=1) + part * RCAP
    plen = np.clip(np.take_along_axis(lens, i_of, axis=1) - part * RCAP, 0, RCAP)
    plen = np.where((j[None, :] < total[:, None]) & (part >= 0), plen, 0)
    plen = np.where(flagged[:, None], 0, plen)
    pstart = np.where(plen > 0, pstart, 0)

    # DMA offsets must be 128-aligned: fetch from the aligned floor and tell
    # the kernel the residual lane shift
    # shift is computed AFTER the end-of-array clamp: a clamped s0 with a
    # pre-clamp shift would roll the fetched lanes onto the wrong rows
    # (benign today only because trees pad npad - n >= 2048 >> RFETCH)
    s0 = np.minimum((pstart // 128) * 128, max(npad - (RCAP + 128), 0))
    shift = pstart - s0

    # per-piece run rows (a "piece" = what the table machinery above calls a
    # block: one column pair x z-segment x <= QB queries)
    npieces = nblocks
    prow = np.zeros((npieces, 128), np.int32)
    prow[:, :NRUNS] = s0
    prow[:, NRUNS : 2 * NRUNS] = plen
    prow[:, 2 * NRUNS : 3 * NRUNS] = shift

    # --- pack pieces into physical blocks (first-fit on size-desc order) ---
    # inherently sequential (each placement depends on the running fill):
    # native first_fit_pack when the C extension is present (~1 ms), else
    # the identical Python loop (~1.1 s at 5e5 queries — the dominant host
    # cost of the whole prep; PERF.md §2)
    psz = valid_slot.sum(axis=1).astype(np.int64)
    porder = np.argsort(-psz, kind="stable")
    try:
        from nbodyhpc_tpu import _hostio  # type: ignore
    except ImportError:
        _hostio = None
    if _hostio is not None and hasattr(_hostio, "first_fit_pack"):
        nb2, blk_of_piece, slot_base, gslot = _hostio.first_fit_pack(
            psz, porder, QB, G
        )
    else:
        blk_of_piece = np.zeros(npieces, np.int64)
        slot_base = np.zeros(npieces, np.int64)
        gslot = np.zeros(npieces, np.int64)
        cur_b, cur_fill, cur_n = 0, 0, 0
        for p in porder:
            s = int(psz[p])
            if cur_n == G or cur_fill + s > QB:
                cur_b += 1
                cur_fill = 0
                cur_n = 0
            blk_of_piece[p] = cur_b
            slot_base[p] = cur_fill
            gslot[p] = cur_n
            cur_fill += s
            cur_n += 1
        nb2 = cur_b + 1

    runs2 = np.zeros((nb2, G, 128), np.int32)
    runs2[blk_of_piece, gslot, :] = prow

    # re-slot every query: piece p's queries keep their order, placed at
    # [slot_base[p], slot_base[p] + size)
    piece_of_q = blockq  # piece index per sorted query
    # position within piece: slotq counts pad gaps too, but pieces are
    # filled densely (slotq = j % QB over contiguous j) so slotq is dense
    flat2 = blk_of_piece[piece_of_q] * QB + slot_base[piece_of_q] + slotq
    qmap2 = np.full(nb2 * QB, -1, np.int64)
    qmap2[flat2] = np.arange(Q)
    qblk2 = np.zeros((nb2, QB, 4), np.float32)
    qblk2[:, :, 3] = -1.0  # pad slots match no piece
    qblk2.reshape(-1, 4)[flat2, :3] = qs
    qblk2.reshape(-1, 4)[flat2, 3] = gslot[piece_of_q].astype(np.float32)

    # per-piece work counters (the reference's KDTreeQueryStatistics analog,
    # kdtree.hpp:124-131): every query in a piece scans the same fetched
    # candidate set, so cells-scanned / points-visited are piece properties
    # — free to report from the tables already built here
    cs_piece = cells.sum(axis=1).astype(np.int32)
    pv_piece = lens.sum(axis=1).astype(np.int32)

    return (order, qmap2, qblk2, runs2, piece_of_q, blk_of_piece, gslot,
            flagged, cs_piece, pv_piece)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_blocks(d2, k):
    # [nb, QB, NCAND] -> top-k ascending for every slot; blocks run nearly
    # full after piece packing, so selecting real rows first (a gather over
    # HBM) costs more than the ~10% of pad rows it would save. Row-chunked
    # with lax.map: one monolithic top_k materializes value+index sort
    # buffers rivaling the 5 GiB distance block and OOMs at macro scale.
    nb, _, ncand = d2.shape
    rows = nb * QB
    flat = d2.reshape(rows, ncand)
    ch = min(16384, rows)  # rows is a power-of-two multiple of QB

    def one(chunk):
        neg, sel = jax.lax.top_k(-chunk, k)
        return -neg, sel

    dk, sk = jax.lax.map(one, flat.reshape(-1, ch, ncand))
    return dk.reshape(rows, k), sk.reshape(rows, k)


def query_blocks(tree, tree_dev, queries, k: int, batch_blocks: int = 1024,
                 interpret: bool = False, qchunk: int = 131072):
    """Fast path for large batched queries on TPU.

    Answers every query from its DMA-fetched 27-cell neighborhood and returns
    (distances^2 [Q, k], tree slots [Q, k], converged [Q], (cells_scanned
    [Q], points_visited [Q])) in the caller's query order. The stats tuple
    is the reference KDTreeQueryStatistics analog, read off the run tables
    at zero kernel cost: every query in a piece scans the same fetched
    candidate set, so its counters are the piece's cell/point totals.
    Queries in flagged blocks or failing the r=1 box-distance bound come
    back unconverged and must be finished by the exact ladder (whose own
    stats should replace these for those queries).

    Queries are processed in ``qchunk``-sized chunks so the host-side block
    build of chunk i+1 overlaps the (async) kernel + top-k of chunk i — the
    reference spends ~0 host time per query (pybind.cpp:164-172 fan-out),
    and the serial prep was the largest non-tunnel cost of this path
    (~1 s per 5e5 queries, PERF.md §2). One macro of device results stays
    in flight, drained only after the next macro is enqueued, so host
    transfers also overlap device compute (unchanged from the unchunked
    design; chunking slightly lowers piece-packing occupancy because pieces
    never span a chunk boundary).
    """
    xyz, index, offsets = tree_dev
    dims = np.asarray(tree.dims)
    h = np.asarray(tree.cell_size, np.float64)
    lo = np.asarray(tree.lo, np.float64)
    periodic = tree.periodic
    Q = queries.shape[0]

    if periodic:
        L = dims.astype(np.float64) * h
        qw = (queries - L * np.floor(queries / L)).astype(np.float32)
        box = tuple(float(v) for v in L)
    else:
        qw = queries
        box = (0.0, 0.0, 0.0)
    qcell = np.floor((qw - lo[None, :].astype(np.float32)) /
                     h[None, :].astype(np.float32)).astype(np.int64)
    if periodic:
        qcell = np.mod(qcell, dims[None, :])
    else:
        qcell = np.clip(qcell, 0, dims[None, :] - 1)

    d2_out = np.empty((Q, k), np.float32)
    slot_out = np.empty((Q, k), np.int64)
    conv_out = np.empty(Q, bool)
    cs_out = np.empty(Q, np.int32)
    pv_out = np.empty(Q, np.int32)

    def prep(c0, c1):
        """Host block build for queries [c0, c1) -> chunk state."""
        qw_c = qw[c0:c1]
        (order, qmap, qblk, runs, piece_of_q, blk_of_piece, gslot,
         flagged, cs_piece, pv_piece) = build_blocks(tree, qw_c, qcell[c0:c1])
        nblocks = qblk.shape[0]
        # pad to a power-of-two bucket (capped at batch_blocks): a handful
        # of kernel/top-k shapes ever compile, and empty pad blocks (all
        # lens zero) cost only masked VPU work
        bucket = 1
        while bucket < min(nblocks, batch_blocks):
            bucket *= 2
        nb_pad = (nblocks + bucket - 1) // bucket * bucket
        if nb_pad > nblocks:
            runs = np.concatenate(
                [runs, np.zeros((nb_pad - nblocks, G, 128), np.int32)]
            )
            qpad = np.zeros((nb_pad - nblocks, QB, 4), np.float32)
            qpad[:, :, 3] = -1.0
            qblk = np.concatenate([qblk, qpad])
        nq = c1 - c0
        msize = min(batch_blocks, nb_pad)
        return {
            "c0": c0, "nq": nq, "order": order, "qmap": qmap, "qblk": qblk,
            "runs": runs, "piece_of_q": piece_of_q,
            "blk_of_piece": blk_of_piece, "gslot": gslot, "flagged": flagged,
            "cs_piece": cs_piece, "pv_piece": pv_piece,
            "nblocks": nblocks, "nb_pad": nb_pad, "msize": msize,
            "d2_s": np.empty((nq, k), np.float32),
            "sel_s": np.empty((nq, k), np.int32),
            "ovf_s": np.zeros(nq, bool),
            "left": (nb_pad + msize - 1) // msize,
        }

    def drain(st, b0, b1, dk, sk, ov):
        sl = st["qmap"][b0 * QB : b1 * QB]
        sl = sl[: max(min(st["nblocks"], b1) - b0, 0) * QB]
        real = sl >= 0
        if real.any():
            st["d2_s"][sl[real]] = np.asarray(dk)[: sl.size][real]
            st["sel_s"][sl[real]] = np.asarray(sk)[: sl.size][real]
            if ov is not None:
                st["ovf_s"][sl[real]] = np.asarray(ov)[: sl.size][real]
        st["left"] -= 1
        if st["left"] == 0:
            finish(st)

    def finish(st):
        """Chunk epilogue (host): candidate index -> tree slot, r=1 cube
        convergence bound, writeback in caller order."""
        c0, nq = st["c0"], st["nq"]
        runs = st["runs"]
        d2_s, sel_s = st["d2_s"], st["sel_s"]
        order, piece_of_q = st["order"], st["piece_of_q"]
        # candidates were rolled to lane 0: tree slot = s0 + shift + lane;
        # runs are per (block, piece slot)
        blk_of_sorted = st["blk_of_piece"][piece_of_q]
        g_of_sorted = st["gslot"][piece_of_q]
        r_of = sel_s // RCAP
        slot = (
            runs[blk_of_sorted[:, None], g_of_sorted[:, None], r_of]
            + runs[blk_of_sorted[:, None], g_of_sorted[:, None],
                   2 * NRUNS + r_of]
            + (sel_s % RCAP)
        )

        # r=1 cube box-distance convergence bound (reference
        # kdtree_impl.hpp:239-267 pruning, applied to the complement of the
        # scanned cube). A periodic dimension with C <= 3 is fully wrapped
        # for every query; a non-periodic one is fully scanned only when
        # the clipped [a, b] interval covers [0, C-1] — evaluated PER QUERY
        # (a boundary-cell query with C = 3 misses the far cell; the old
        # static shortcut certified wrong neighbors as converged).
        qws = qw[c0 : c0 + nq][order]
        qcs = qcell[c0 : c0 + nq][order]
        db = np.full(nq, np.inf)
        covered = np.ones(nq, bool)
        for dim in range(3):
            C = int(dims[dim])
            hd = float(h[dim])
            if periodic:
                if 3 >= C:
                    continue  # fully wrapped: no bound from this dimension
                covered[:] = False  # an unscanned arc exists for every query
                face = (qcs[:, dim] - 1) * hd + lo[dim]
                dlo = qws[:, dim] - face
                dhi = 3 * hd - dlo
                db = np.minimum(db, np.maximum(np.minimum(dlo, dhi), 0.0))
            else:
                a = np.maximum(qcs[:, dim] - 1, 0)
                bq = np.minimum(qcs[:, dim] + 1, C - 1)
                covered &= (a == 0) & (bq == C - 1)
                dlo = np.where(a > 0, qws[:, dim] - (a * hd + lo[dim]),
                               np.inf)
                dhi = np.where(bq < C - 1,
                               ((bq + 1) * hd + lo[dim]) - qws[:, dim],
                               np.inf)
                db = np.minimum(db, np.maximum(np.minimum(dlo, dhi), 0.0))
        kth2 = d2_s[:, -1].astype(np.float64)
        conv = (kth2 < db * db) | covered
        conv &= ~st["flagged"][piece_of_q]
        # segmented top-k overflow (one segment supplied its whole
        # shortlist): the row's extraction may be incomplete — exact
        # ladder finishes it
        conv &= ~st["ovf_s"]
        if periodic and (int(dims[0]) < 3 or int(dims[1]) < 3):
            # wrapped 3x3 neighbor columns alias when an x/y dimension has
            # fewer than 3 cells, duplicating candidates — defer such
            # (tiny) trees entirely to the exact ladder
            conv[:] = False

        # back to caller order: sorted position p answers original query
        # c0 + order[p]
        dst = c0 + order
        d2_out[dst] = d2_s
        slot_out[dst] = slot
        conv_out[dst] = conv
        cs_out[dst] = st["cs_piece"][piece_of_q]
        pv_out[dst] = st["pv_piece"][piece_of_q]
        # free the chunk's tables promptly (runs/qblk are the big ones)
        st.clear()

    pending = None
    for c0 in range(0, Q, qchunk):
        st = prep(c0, min(c0 + qchunk, Q))
        for b0 in range(0, st["nb_pad"], st["msize"]):
            b1 = b0 + st["msize"]
            if k <= 128:
                # interpret mode keeps the plain extraction: the
                # segmented unroll (kseg passes x W slice updates) blows
                # up the interpreter's lowering (measured SIGABRT in the
                # slow tier); its exactness has a dedicated direct-kernel
                # test at an interpret-sized geometry
                ksg = 0 if interpret else _kseg(_kpad(k), NCAND)
                dk3, sk3 = _run_knn_topk(
                    jnp.asarray(st["runs"][b0:b1]),
                    jnp.asarray(st["qblk"][b0:b1]),
                    xyz, nblocks=st["msize"], kpad=_kpad(k),
                    periodic=periodic, box=box, interpret=interpret,
                    geom=ZSEG, kseg=ksg,
                )
                dk = dk3[:, :, :k].reshape(-1, k)
                sk = sk3[:, :, :k].reshape(-1, k)
                ov = (sk3[:, :, 127] > 0).reshape(-1) if ksg else None
            else:
                d2 = _run_knn(
                    jnp.asarray(st["runs"][b0:b1]),
                    jnp.asarray(st["qblk"][b0:b1]),
                    xyz, nblocks=st["msize"], periodic=periodic, box=box,
                    interpret=interpret, geom=ZSEG,
                )
                dk, sk = _topk_blocks(d2, k)
                ov = None
            # drain the PREVIOUS macro only after this one is enqueued: the
            # blocking host transfer (and the next chunk's host prep)
            # overlaps the device compute
            if pending is not None:
                drain(*pending)
            pending = (st, b0, b1, dk, sk, ov)
    if pending is not None:
        drain(*pending)
    return d2_out, slot_out, conv_out, (cs_out, pv_out)
