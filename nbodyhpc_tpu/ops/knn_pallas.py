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

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 128          # queries per block
NRUNS = 36        # run slots (2 columns x 9 neighbors x 2 periodic z-splits)
RCAP = 256        # candidates per run (128-multiple; run overflow -> flag)
NCAND = NRUNS * RCAP


RFETCH = RCAP + 128  # aligned fetch width (DMA offsets must be 128-aligned)


def _knn_kernel(runs_ref, q_ref, xyz_ref, out_ref, cand, sems,
                *, periodic: bool, box):
    # runs_ref: [1, 1, 128] SMEM i32: s0[0:36] (128-aligned), lens[36:72],
    #           shift[72:108] (s - s0)
    # q_ref: [1, QB, 4] VMEM f32: qx, qy, qz per query (lanes = channels)
    # xyz_ref: [4, npad] ANY
    # out_ref: [1, QB, NCAND] VMEM block (pipelined write)
    # cand: VMEM [NRUNS, 4, RFETCH]; sems: DMA[NRUNS]
    for r in range(NRUNS):
        s0 = pl.multiple_of(runs_ref[0, 0, r], 128)
        dma = pltpu.make_async_copy(
            xyz_ref.at[:, pl.ds(s0, RFETCH)], cand.at[r], sems.at[r]
        )
        dma.start()

    qx = q_ref[0, :, 0:1]  # [QB, 1]
    qy = q_ref[0, :, 1:2]
    qz = q_ref[0, :, 2:3]
    lane = jax.lax.broadcasted_iota(jnp.int32, (QB, RCAP), 1)

    for r in range(NRUNS):
        pltpu.make_async_copy(
            xyz_ref.at[:, pl.ds(pl.multiple_of(runs_ref[0, 0, r], 128), RFETCH)],
            cand.at[r], sems.at[r],
        ).wait()
        ln = runs_ref[0, 0, NRUNS + r]
        shift = runs_ref[0, 0, 2 * NRUNS + r]

        # roll the run's candidates to lane 0 (run starts at lane `shift`)
        rolled = pltpu.roll(cand[r], jax.lax.rem(RFETCH - shift, RFETCH), axis=1)
        d2 = jnp.zeros((QB, RCAP), jnp.float32)
        for dim, q in ((0, qx), (1, qy), (2, qz)):
            d = q - rolled[dim, :RCAP][None, :]
            if periodic:
                L = float(box[dim])
                d = d - L * jnp.round(d * (1.0 / L))
            d2 = d2 + d * d
        out_ref[0, :, r * RCAP : (r + 1) * RCAP] = jnp.where(lane < ln, d2, jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("nblocks", "periodic", "box", "interpret")
)
def _run_knn(runs, qblk, xyz, nblocks, periodic, box, interpret):
    kernel = functools.partial(_knn_kernel, periodic=periodic, box=box)
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((1, 1, 128), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, QB, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, QB, NCAND), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks, QB, NCAND), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NRUNS, 4, RFETCH), jnp.float32),
            pltpu.SemaphoreType.DMA((NRUNS,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(runs, qblk, xyz)


def build_blocks(tree, queries_w, qcell):
    """Host prep (vectorized numpy): sort queries by cell, build per-block
    run tables with static slot layout run = colsel*18 + neighbor*2 + zseg.

    Returns (order, qblk [nblocks, QB, 4] f32, runs [nblocks, 1, 128] i32,
    flagged [nblocks] bool).
    """
    dims = np.asarray(tree.dims).astype(np.int64)
    Cx, Cy, Cz = (int(v) for v in dims)
    offsets = tree.offsets
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
    qblk = np.zeros((nblocks, QB, 4), np.float32)
    qblk.reshape(-1, 4)[flat_slot, :3] = qs
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
    s0 = (pstart // 128) * 128
    shift = pstart - s0
    s0 = np.minimum(s0, max(npad - (RCAP + 128), 0))

    runs = np.zeros((nblocks, 1, 128), np.int32)
    runs[:, 0, :NRUNS] = s0
    runs[:, 0, NRUNS : 2 * NRUNS] = plen
    runs[:, 0, 2 * NRUNS : 3 * NRUNS] = shift
    return order, qmap, qblk, runs, flagged


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_blocks(d2, k, rows):
    # [nb, QB, NCAND] -> top-k ascending for the real query slots only
    # (pad slots would otherwise multiply the result transfer)
    nb = d2.shape[0]
    d2 = d2.reshape(nb * QB, NCAND)[rows]
    neg, sel = jax.lax.top_k(-d2, k)
    return -neg, sel


def query_blocks(tree, tree_dev, queries, k: int, batch_blocks: int = 1024,
                 interpret: bool = False):
    """Fast path for large batched queries on TPU.

    Answers every query from its DMA-fetched 27-cell neighborhood and returns
    (distances^2 [Q, k], tree slots [Q, k], converged [Q]) in the caller's
    query order. Queries in flagged blocks or failing the r=1 box-distance
    bound come back unconverged and must be finished by the exact ladder.
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

    order, qmap, qblk, runs, flagged = build_blocks(tree, qw, qcell)
    nblocks = qblk.shape[0]

    # per macro-batch: run kernel, top-k + pad-slot compaction on device,
    # transfer only real rows
    real = qmap >= 0
    real_pos = np.nonzero(real)[0]
    sidx_all = qmap[real]
    d2_s = np.empty((Q, k), np.float32)
    sel_s = np.empty((Q, k), np.int32)
    blk_of_sorted = np.empty(Q, np.int64)
    blk_of_sorted[sidx_all] = real_pos // QB

    for b0 in range(0, nblocks, batch_blocks):
        b1 = min(b0 + batch_blocks, nblocks)
        nb = b1 - b0
        d2 = _run_knn(
            jnp.asarray(runs[b0:b1]), jnp.asarray(qblk[b0:b1]), xyz,
            nblocks=nb, periodic=periodic, box=box, interpret=interpret,
        )
        in_range = (real_pos >= b0 * QB) & (real_pos < b1 * QB)
        rows = real_pos[in_range] - b0 * QB
        if rows.size == 0:
            continue
        nr = rows.size
        rows_p = np.pad(rows, (0, (-nr) % 8192))  # bucketed shapes, no retrace storm
        dk, sk = _topk_blocks(d2, k, jnp.asarray(rows_p))
        sb = sidx_all[in_range]
        d2_s[sb] = np.asarray(dk)[:nr]
        sel_s[sb] = np.asarray(sk)[:nr]

    # candidate index -> tree slot (candidates were rolled to lane 0:
    # tree slot = s0 + shift + lane)
    r_of = sel_s // RCAP
    slot = (
        runs[blk_of_sorted[:, None], 0, r_of]
        + runs[blk_of_sorted[:, None], 0, 2 * NRUNS + r_of]
        + (sel_s % RCAP)
    )

    # r=1 cube box-distance convergence bound (reference kdtree_impl.hpp:
    # 239-267 pruning, applied to the complement of the scanned cube)
    qws = qw[order]
    qcs = qcell[order]
    db = np.full(Q, np.inf)
    for dim in range(3):
        C = int(dims[dim])
        hd = float(h[dim])
        if 3 >= C:
            continue
        if periodic:
            face = (qcs[:, dim] - 1) * hd + lo[dim]
            dlo = qws[:, dim] - face
            dhi = 3 * hd - dlo
            db = np.minimum(db, np.maximum(np.minimum(dlo, dhi), 0.0))
        else:
            a = np.maximum(qcs[:, dim] - 1, 0)
            bq = np.minimum(qcs[:, dim] + 1, C - 1)
            dlo = np.where(a > 0, qws[:, dim] - (a * hd + lo[dim]), np.inf)
            dhi = np.where(bq < C - 1, ((bq + 1) * hd + lo[dim]) - qws[:, dim],
                           np.inf)
            db = np.minimum(db, np.maximum(np.minimum(dlo, dhi), 0.0))
    full_cover = all(3 >= int(dims[d]) for d in range(3))
    kth2 = d2_s[:, -1].astype(np.float64)
    conv = np.ones(Q, bool) if full_cover else kth2 < db * db
    conv &= ~flagged[blk_of_sorted]

    # back to caller order
    inv = np.empty(Q, np.int64)
    inv[order] = np.arange(Q)
    return d2_s[inv], slot[inv], conv[inv]
