"""Device-resident block build for the Pallas k-NN kernel.

The host path (ops/knn_pallas.py::build_blocks) spends ~1.4 s of
single-threaded numpy per 5e5 queries building DMA run tables, and ~40 MB
of those tables then ride the host link every batch. This module removes
both costs with one observation: the 36-run DMA plan of a block depends
only on its (column pair, z-segment) — i.e. on the TREE — once the
z-segments are pinned to a static grid instead of the queries' z-extent.
So the tree precomputes ONE run-table row per static piece
(``static_piece_tables``, a few MB in HBM, built on device), and a query
batch reduces to:

  sort by piece id  ->  segment scans (piece sizes/slots)
  ->  one tiny host sync per chunk (piece sizes -> native first-fit pack,
      the only inherently sequential step; ~1 ms in C)
  ->  row-gather the precomputed run rows per packed (block, slot)
  ->  the unchanged Pallas kernel + top-k
  ->  elementwise epilogue (slot decode, convergence bound) on device

Everything heavy stays on device; the host link carries ~100 KB per
131072-query chunk instead of ~10 MB. The static z-union is the same
budget the host sizing formula already assumed (it sizes ``zseg`` for
queries spanning the whole segment), so candidate capacity and the
flag-to-ladder escape hatch are unchanged. Permutations are expressed as
sort + row-gather, never elementwise scatter (PERF.md gather rule).

Reference analog: the Vulkan renderer's descriptor/indirect tables are
also built once and reused per draw (point_renderer.cpp:393-449); the
reference kd-tree spends ~0 host time per query (pybind.cpp:164-172).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

import os
import time

from .knn_pallas import (
    FULLZ,
    G,
    NRUNS,
    QB,
    RCAP,
    RFETCH,
    ZSEG,
    _kpad,
    _kseg,
    _run_knn,
    _run_knn_topk,
    _topk_blocks,
)

# NBODYHPC_KNND_TRACE=1: per-stage timing with forced syncs (distorts the
# pipeline; for stage-split measurement only, PERF.md discipline)
_TRACE = os.environ.get("NBODYHPC_KNND_TRACE", "0") == "1"


def _tr(label, t0, arr=None):
    if _TRACE:
        if arr is not None:
            jnp.asarray(arr).block_until_ready()
            float(jnp.ravel(arr)[0])  # force a real host transfer (axon)
        print(f"[knnd] {label}: {(time.time() - t0) * 1000:.0f} ms",
              flush=True)
    return time.time()


def piece_geometry(tree):
    """Static piece grid parameters: (zseg, nseg, npair, nsp).

    Matches the host sizing formula (knn_pallas.build_blocks): a z-segment
    is sized so 18 column-runs of a full segment fit the NRUNS*RCAP
    candidate budget at the tree's average occupancy.
    """
    Cx, Cy, Cz = (int(v) for v in tree.dims)
    avg_occ = max(tree.n / max(tree.ncells, 1), 1.0)
    zseg = int(max(1, (NRUNS * RCAP) / (18.0 * 2.0 * avg_occ) - 2))
    zseg = min(zseg, Cz)
    nseg = (Cz + zseg - 1) // zseg
    npair = (Cx * Cy + 1) // 2
    return zseg, nseg, npair, npair * nseg


@functools.partial(
    jax.jit,
    static_argnames=("dims", "periodic", "npad", "zseg", "nseg", "npair"),
)
def _build_static_tables(offsets, dims, periodic, npad, zseg, nseg, npair):
    """[NSP, 128] i32 run rows (+ [NSP] bool flagged) for every static piece.

    Row p = pair m, segment s (p = m * nseg + s): the 36 RCAP-slot DMA runs
    covering the 3x3 neighborhoods of columns (2m, 2m+1) over the
    z-interval [s*zseg - 1, min((s+1)*zseg, Cz)] — the z-union of any
    query group the piece can contain. Port of the per-batch host table
    math in knn_pallas.build_blocks:209-304, evaluated once per tree.
    """
    Cx, Cy, Cz = (int(v) for v in dims)
    ncol = Cx * Cy
    nsp = npair * nseg
    p = jnp.arange(nsp, dtype=jnp.int32)
    m, s = p // nseg, p % nseg

    colA = 2 * m
    colB = jnp.minimum(2 * m + 1, ncol - 1)
    dup_col = colB == colA
    axy = jnp.stack([colA // Cy, colA % Cy], 1)
    bxy = jnp.stack([colB // Cy, colB % Cy], 1)

    z0 = s * zseg - 1
    z1 = jnp.minimum((s + 1) * zseg, Cz)

    ddx = bxy[:, 0] - axy[:, 0]
    ddy = bxy[:, 1] - axy[:, 1]
    if periodic:
        ddx = jnp.mod(ddx + Cx // 2, Cx) - Cx // 2
        ddy = jnp.mod(ddy + Cy // 2, Cy) - Cy // 2

    starts_l, lens_l = [], []
    for csel, cxy in ((0, axy), (1, bxy)):
        for nb in range(9):
            dx, dy = nb // 3 - 1, nb % 3 - 1
            if csel == 0:
                # A covers shared neighbor columns (the z-union IS [z0, z1]
                # here); B skips them — each tree point lands in at most
                # one run or top-k would return it twice
                skip = jnp.zeros((nsp,), bool)
            else:
                skip = (jnp.abs(dx + ddx) <= 1) & (jnp.abs(dy + ddy) <= 1)
                skip = skip | dup_col
            x = cxy[:, 0] + dx
            y = cxy[:, 1] + dy
            if periodic:
                x = jnp.mod(x, Cx)
                y = jnp.mod(y, Cy)
                inb = ~skip
                za = jnp.mod(z0, Cz)
                span = jnp.minimum(z1 - z0 + 1, Cz)
                first = jnp.minimum(span, Cz - za)
                seg = ((za, first), (jnp.zeros_like(za), span - first))
            else:
                inb = ~skip & (x >= 0) & (x < Cx) & (y >= 0) & (y < Cy)
                x = jnp.clip(x, 0, Cx - 1)
                y = jnp.clip(y, 0, Cy - 1)
                za = jnp.clip(z0, 0, Cz - 1)
                zb = jnp.clip(z1, 0, Cz - 1)
                seg = ((za, zb - za + 1),
                       (jnp.zeros_like(za), jnp.zeros_like(za)))
            base = (x * Cy + y) * Cz
            for zs, zl in seg:
                zl = jnp.maximum(zl, 0)
                use = inb & (zl > 0)
                st = offsets[jnp.where(use, base + zs, 0)].astype(jnp.int32)
                en = offsets[jnp.where(use, base + zs + zl, 0)].astype(
                    jnp.int32
                )
                starts_l.append(jnp.where(use, st, 0))
                lens_l.append(jnp.where(use, en - st, 0))

    starts = jnp.stack(starts_l, 1)  # [NSP, 36] in kernel slot order
    lens = jnp.stack(lens_l, 1)
    return _repack_rows(starts, lens, ZSEG, npad)


def _repack_rows(starts, lens, geom, npad):
    """Repack logical (start, len) runs into ``geom.RCAP``-sized physical
    slots (identical to the host math in knn_pallas.build_blocks: long runs
    split across consecutive slots; more slots than geom.NR -> flag).
    Returns (prow [N, 128] i32: s0 | plen | shift, flagged [N] bool)."""
    NR, RCAP_ = geom.NR, geom.RCAP
    n_rows = starts.shape[0]
    pieces = (lens + RCAP_ - 1) // RCAP_
    total = jnp.sum(pieces, axis=1)
    flagged = total > NR
    excl = jnp.cumsum(pieces, axis=1) - pieces
    j = jnp.arange(NR, dtype=jnp.int32)
    i_of = jnp.sum(
        (excl[:, :, None] <= j[None, None, :]).astype(jnp.int32), axis=1
    ) - 1
    i_of = jnp.clip(i_of, 0, starts.shape[1] - 1)
    part = j[None, :] - jnp.take_along_axis(excl, i_of, axis=1)
    pstart = jnp.take_along_axis(starts, i_of, axis=1) + part * RCAP_
    plen = jnp.clip(
        jnp.take_along_axis(lens, i_of, axis=1) - part * RCAP_, 0, RCAP_
    )
    plen = jnp.where((j[None, :] < total[:, None]) & (part >= 0), plen, 0)
    plen = jnp.where(flagged[:, None], 0, plen)
    pstart = jnp.where(plen > 0, pstart, 0)

    # DMA offsets must be 128-aligned: aligned floor + residual lane shift.
    # The end-of-array clamp can push shift past 127; the kernel's roll is
    # modulo RFETCH and shift + len <= RFETCH still holds (len is bounded
    # by the rows that remain), so lanes never wrap onto foreign rows.
    s0 = jnp.minimum((pstart // 128) * 128, max(npad - geom.RFETCH, 0))
    shift = pstart - s0

    prow = jnp.zeros((n_rows, 128), jnp.int32)
    prow = prow.at[:, :NR].set(s0)
    prow = prow.at[:, NR : 2 * NR].set(plen)
    prow = prow.at[:, 2 * NR : 3 * NR].set(shift)
    return prow, flagged


@functools.partial(jax.jit, static_argnames=("dims", "periodic"))
def _fullz_logical_runs(offsets, dims, periodic):
    """Geometry-independent FULLZ run table: per column the 6 logical
    (start, len) slices (3 neighbor-x x up-to-2 wrapped-y segments), plus
    the max per-neighbor-x slice length — the statistic ``tree_plan``
    sizes the RCAP rung from.

    Piece p = cell column p = (x, y): the 27-cell neighborhoods of every
    query in the column union to the 3x3 neighbor columns over FULL z.
    In the z-major cell order that is, per neighbor x, ONE contiguous
    gapless slice of the sorted point array spanning y in [y-1, y+1]
    (a wrapped y interval splits in two) — a handful of large DMAs per
    piece instead of ZSEG's ~18-36 small ones, zero dead lanes, and
    duplicates are impossible by construction (distinct x -> disjoint
    slices; one slice is a contiguous range). The reference's analog of
    this exactness argument is its per-leaf full scan,
    kdtree_opt.hpp:105-248.
    """
    Cx, Cy, Cz = (int(v) for v in dims)
    ncol = Cx * Cy
    c = jnp.arange(ncol, dtype=jnp.int32)
    x, y = c // Cy, c % Cy
    starts_l, lens_l = [], []
    for dx in (-1, 0, 1):
        xd = x + dx
        if periodic:
            xd = jnp.mod(xd, Cx)
            okx = jnp.ones((ncol,), bool)
        else:
            okx = (xd >= 0) & (xd < Cx)
            xd = jnp.clip(xd, 0, Cx - 1)
        if periodic:
            # y window [y-1, y+1] wrapped: one segment when it fits before
            # the seam, else two (requires Cy >= 3 — enforced by tree_plan
            # — so the two segments never alias a column)
            ya = jnp.mod(y - 1, Cy)
            w1 = jnp.minimum(3, Cy - ya)
            segs = ((ya, w1), (jnp.zeros_like(ya), 3 - w1))
        else:
            ya = jnp.maximum(y - 1, 0)
            yb = jnp.minimum(y + 1, Cy - 1)
            segs = ((ya, yb - ya + 1),
                    (jnp.zeros_like(ya), jnp.zeros_like(ya)))
        for ys, yw in segs:
            use = okx & (yw > 0)
            lo = (xd * Cy + ys) * Cz
            hi = lo + yw * Cz
            s = offsets[jnp.where(use, lo, 0)].astype(jnp.int32)
            e = offsets[jnp.where(use, hi, 0)].astype(jnp.int32)
            starts_l.append(jnp.where(use, s, 0))
            lens_l.append(jnp.where(use, e - s, 0))
    starts = jnp.stack(starts_l, 1)  # [ncol, 6]
    lens = jnp.stack(lens_l, 1)
    # per-neighbor-x slice length = its (up to) 2 wrapped-y segments
    slice_len = lens[:, 0::2] + lens[:, 1::2]  # [ncol, 3]
    return starts, lens, jnp.max(slice_len)


_repack_rows_j = functools.partial(
    jax.jit, static_argnames=("geom", "npad")
)(_repack_rows)


def _build_static_tables_fullz(offsets, dims, periodic, npad, geom=None):
    """FULLZ run rows (+ flagged) at a given (or largest) geometry rung."""
    from .knn_pallas import FULLZ

    starts, lens, _ = _fullz_logical_runs(
        offsets, tuple(int(v) for v in dims), bool(periodic)
    )
    return _repack_rows_j(
        starts, lens, geom=geom if geom is not None else FULLZ, npad=npad
    )


def static_piece_tables(tree, tree_dev):
    """Cached per-tree static run tables (prow [NSP, 128], flagged [NSP])."""
    cached = getattr(tree, "_static_tables", None)
    if cached is not None:
        return cached
    zseg, nseg, npair, _ = piece_geometry(tree)
    _, _, offsets = tree_dev
    prow, flagged = _build_static_tables(
        offsets,
        tuple(int(v) for v in tree.dims),
        bool(tree.periodic),
        int(tree.xyz.shape[1]),
        zseg,
        nseg,
        npair,
    )
    tree._static_tables = (prow, flagged)
    return tree._static_tables


def tree_plan(tree, tree_dev):
    """Cached per-tree kernel plan: (geom, pair, zseg, nseg, prow, flagged).

    Prefers the FULLZ geometry (pieces = single full-z cell columns,
    a handful of large DMAs each — the round-2 ablation found the ZSEG
    kernel DMA-issue-bound) whenever the tree's columns fit a candidate
    budget rung: the slot width RCAP is the smallest rung whose 3 slots
    per neighbor-x cover the tree's measured max 3-column slice (one
    scalar sync), so NCAND — and with it every NCAND-wide kernel cost:
    distance evaluation, dblk traffic, each extract-min top-k pass — is
    sized to THIS tree instead of a worst-case constant (a 1e7-point
    uniform tree rides the 1024 rung at NCAND = 9216 instead of 18432).
    Falls back to ZSEG if more than 1% of columns overflow the largest
    rung (dense trees), if a periodic x/y dimension has < 3 cells (wrap
    alias), or if the padded array is shorter than one fetch.
    """
    from .knn_pallas import FULLZ_RCAP_RUNGS, fullz_geom

    cached = getattr(tree, "_kernel_plan", None)
    if cached is not None:
        return cached
    Cx, Cy, Cz = (int(v) for v in tree.dims)
    npad = int(tree.xyz.shape[1])
    _, _, offsets = tree_dev
    plan = None
    fullz_ok = npad >= fullz_geom(FULLZ_RCAP_RUNGS[0]).RFETCH and (
        not tree.periodic or (Cx >= 3 and Cy >= 3)
    )
    if fullz_ok:
        starts, lens, maxsl_d = _fullz_logical_runs(
            offsets, (Cx, Cy, Cz), bool(tree.periodic)
        )
        maxsl = int(maxsl_d)  # one tiny sync per tree
        geom = None
        for rcap in FULLZ_RCAP_RUNGS:
            if maxsl <= 3 * rcap and npad >= fullz_geom(rcap).RFETCH:
                geom = fullz_geom(rcap)
                break
        if geom is None:
            # a few over-dense columns: largest rung + per-column flags
            geom = fullz_geom(FULLZ_RCAP_RUNGS[-1])
        prow, flagged = _repack_rows_j(starts, lens, geom=geom, npad=npad)
        frac = float(jnp.mean(flagged.astype(jnp.float32)))  # one sync/tree
        if frac <= 0.01:
            plan = (geom, False, Cz, 1, prow, flagged)
    if plan is None:
        zseg, nseg, _, _ = piece_geometry(tree)
        prow, flagged = static_piece_tables(tree, tree_dev)
        plan = (ZSEG, True, zseg, nseg, prow, flagged)
    tree._kernel_plan = plan
    return plan


def _seg_op(a, b):
    # segmented max-scan combiner: (value, segment-start flag)
    (va, fa), (vb, fb) = a, b
    return jnp.where(fb, vb, jnp.maximum(va, vb)), fa | fb


@functools.partial(
    jax.jit, static_argnames=("dims", "periodic", "zseg", "nseg", "pair")
)
def _stage_sort(queries, lo, h, dims, periodic, zseg, nseg, pair=True):
    """Sort a query chunk by static piece id and segment it into dynamic
    pieces (split at QB multiples). All outputs are statically shaped
    [CQ]; per-piece rows past ``npieces`` are inert (size 0).

    ``pair`` selects the static piece id: column pairs x z-segments for
    the ZSEG geometry, single columns (zseg = Cz, nseg = 1) for FULLZ."""
    CQ = queries.shape[0]
    Cx, Cy, Cz = (int(v) for v in dims)
    dims_j = jnp.asarray((Cx, Cy, Cz))
    if periodic:
        L = dims_j.astype(jnp.float32) * h
        qw = queries - L[None, :] * jnp.floor(queries / L[None, :])
    else:
        qw = queries
    qcell = jnp.floor((qw - lo[None, :]) * (1.0 / h)[None, :]).astype(
        jnp.int32
    )
    if periodic:
        qcell = jnp.mod(qcell, dims_j[None, :])
    else:
        qcell = jnp.clip(qcell, 0, dims_j[None, :] - 1)
    colid = qcell[:, 0] * Cy + qcell[:, 1]
    pid = (colid // (2 if pair else 1)) * nseg + qcell[:, 2] // zseg

    iota = jnp.arange(CQ, dtype=jnp.int32)
    pid_s, qx, qy, qz, cx_s, cy_s, cz_s, orig = jax.lax.sort(
        (pid, qw[:, 0], qw[:, 1], qw[:, 2],
         qcell[:, 0], qcell[:, 1], qcell[:, 2], iota),
        num_keys=1, is_stable=True,
    )

    newp = jnp.concatenate([jnp.ones(1, bool), pid_s[1:] != pid_s[:-1]])
    # start position of each pid-group, broadcast to its elements
    gstart, _ = jax.lax.associative_scan(
        _seg_op, (jnp.where(newp, iota, 0), newp)
    )
    jloc = iota - gstart
    bnd = newp | (jloc % QB == 0) & (jloc > 0)
    dpid = jnp.cumsum(bnd.astype(jnp.int32)) - 1
    slot_in_piece = jloc % QB
    npieces = dpid[-1] + 1

    # compact per-piece scalars: a stable sort moves piece-first rows to
    # the front in dpid order; piece sizes fall out of start-position diffs
    key = jnp.where(bnd, dpid, CQ)
    _, start_c, pid_c = jax.lax.sort(
        (key, iota, pid_s), num_keys=1, is_stable=True
    )
    row = jnp.arange(CQ, dtype=jnp.int32)
    start_c = jnp.where(row < npieces, start_c, CQ)
    psz = jnp.concatenate([start_c[1:], jnp.full(1, CQ, jnp.int32)]) - start_c
    psz = jnp.where(row < npieces, psz, 0)

    qs = jnp.stack([qx, qy, qz], 1)
    qcs = jnp.stack([cx_s, cy_s, cz_s], 1)
    # psz and pid_c stacked so the host fetches one array per chunk
    return qs, qcs, orig, dpid, slot_in_piece, jnp.stack([psz, pid_c]), npieces


@functools.partial(jax.jit, static_argnames=("nbpad", "ng"))
def _stage_pack(qs, dpid, slot_in_piece, blk_of, slot_base, gslot, map_bg,
                prow, nbpad, ng=G):
    """Scatter queries into their packed block slots and row-gather the
    static run rows per (block, piece slot) and per query."""
    blk_q = blk_of[dpid]
    g_q = gslot[dpid]
    flat = blk_q * QB + slot_base[dpid] + slot_in_piece

    qblk = jnp.zeros((nbpad * QB, 4), jnp.float32).at[:, 3].set(-1.0)
    qblk = qblk.at[flat].set(
        jnp.concatenate([qs, g_q[:, None].astype(jnp.float32)], 1)
    )
    qblk = qblk.reshape(nbpad, QB, 4)

    mflat = map_bg.reshape(-1)
    runs = jnp.where(
        (mflat >= 0)[:, None], prow[jnp.maximum(mflat, 0)], 0
    ).reshape(nbpad, ng, 128)
    # per-query run row for the epilogue's slot decode
    mq = mflat[blk_q * ng + g_q]
    runs_q = jnp.where((mq >= 0)[:, None], prow[jnp.maximum(mq, 0)], 0)
    return qblk, runs, flat, runs_q


@functools.partial(jax.jit, static_argnames=("k", "meta", "geom", "zfull"))
def _epilogue(dk, sk, flat, runs_q, qs, qcs, flag_q, ovf, index, k, meta,
              geom=ZSEG, zfull=False):
    """Elementwise epilogue on device: decode tree slots -> global indices,
    r=1-cube box-distance convergence bound (host analog:
    knn_pallas.query_blocks ``finish``, kdtree_impl.hpp:239-267 pruning).

    ``zfull`` (FULLZ geometry): the piece scanned its neighbor columns
    over the FULL z extent, so the z face never bounds convergence —
    strictly more queries converge than under ZSEG's z-window."""
    dims, lo, h, periodic, n = meta
    NR, RC = geom.NR, geom.RCAP
    dk_q = dk[flat]
    sk_q = sk[flat]
    r_of = sk_q // RC
    onehot = r_of[..., None] == jnp.arange(NR, dtype=jnp.int32)[None, None]
    s0_sel = jnp.sum(runs_q[:, None, :NR] * onehot, axis=2)
    sh_sel = jnp.sum(runs_q[:, None, 2 * NR : 3 * NR] * onehot, axis=2)
    slot = s0_sel + sh_sel + sk_q % RC
    gidx = index[slot]
    gidx = jnp.where(jnp.isfinite(dk_q), gidx, jnp.uint32(n))

    db = jnp.full(qs.shape[0], jnp.inf, jnp.float32)
    covered = jnp.ones(qs.shape[0], bool)
    for dim in range(2 if zfull else 3):
        C = int(dims[dim])
        hd = np.float32(h[dim])
        lod = np.float32(lo[dim])
        if periodic:
            if 3 >= C:
                continue  # fully wrapped: no bound from this dimension
            covered = jnp.zeros(qs.shape[0], bool)
            face = (qcs[:, dim].astype(jnp.float32) - 1.0) * hd + lod
            dlo = qs[:, dim] - face
            dhi = 3.0 * hd - dlo
            db = jnp.minimum(db, jnp.maximum(jnp.minimum(dlo, dhi), 0.0))
        else:
            a = jnp.maximum(qcs[:, dim] - 1, 0)
            b = jnp.minimum(qcs[:, dim] + 1, C - 1)
            covered = covered & (a == 0) & (b == C - 1)
            dlo = jnp.where(
                a > 0,
                qs[:, dim] - (a.astype(jnp.float32) * hd + lod),
                jnp.inf,
            )
            dhi = jnp.where(
                b < C - 1,
                ((b + 1).astype(jnp.float32) * hd + lod) - qs[:, dim],
                jnp.inf,
            )
            db = jnp.minimum(db, jnp.maximum(jnp.minimum(dlo, dhi), 0.0))
    kth = dk_q[:, -1]
    # ovf: segmented-top-k overflow flag per block slot (one segment
    # supplied its whole shortlist — extraction may be incomplete); such
    # rows go to the exact ladder like statically flagged pieces
    conv = ((kth < db * db) | covered) & ~flag_q & ~ovf[flat]
    return jnp.sqrt(dk_q), gidx, conv


@jax.jit
def _invert_perm(orig, d, gi, conv):
    # permutation back to caller order as sort + row-gather (never an
    # elementwise scatter)
    _, perm = jax.lax.sort(
        (orig, jnp.arange(orig.shape[0], dtype=jnp.int32)), num_keys=1,
        is_stable=True,
    )
    return d[perm], gi[perm], conv[perm]


def _pow2(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


def _pack_host(psz_h, porder, ng=G):
    """First-fit packing (size-descending) of pieces into (<= QB queries,
    <= ng slots) blocks — the one sequential step, in C when available."""
    try:
        from nbodyhpc_tpu import _hostio  # type: ignore

        if hasattr(_hostio, "first_fit_pack"):
            return _hostio.first_fit_pack(psz_h, porder, QB, ng)
    except ImportError:
        pass
    npieces = psz_h.shape[0]
    blk_of = np.zeros(npieces, np.int64)
    slot_base = np.zeros(npieces, np.int64)
    gslot = np.zeros(npieces, np.int64)
    cb, cf, cn = 0, 0, 0
    for pp in porder:
        sv = int(psz_h[pp])
        if cn == ng or cf + sv > QB:
            cb += 1
            cf = 0
            cn = 0
        blk_of[pp] = cb
        slot_base[pp] = cf
        gslot[pp] = cn
        cf += sv
        cn += 1
    return cb + 1, blk_of, slot_base, gslot


def _macro_sizes(nb2: int, batch_blocks: int):
    """Greedy power-of-two macro decomposition of ``nb2`` blocks.

    One pow2 bucket wastes up to ~2x kernel + top-k work on empty pad
    blocks (a pad block costs the same masked VPU scan as a full one);
    decomposing into descending pow2 macros >= 128 bounds the waste at
    <~11% while reusing the same handful of compiled kernel shapes.
    """
    out = []
    left = nb2
    size = min(batch_blocks, _pow2(max(nb2, 1), 128))
    while left > 0:
        while size > 128 and size > left:
            size //= 2
        out.append(size)
        left -= size
    return out


def query_blocks_device(tree, tree_dev, queries, k: int,
                        qchunk: int = 1 << 20, batch_blocks: int = 512,
                        interpret: bool = False):
    """Device-resident exact k-NN via the Pallas kernel.

    ``queries`` is a (Q, 3) jax array; returns (distances [Q, k] f32
    ascending — already sqrt'd, indices [Q, k] uint32) as device arrays in
    caller order. Host involvement per chunk: one ``npieces`` sync plus
    ~100 KB of piece-size/packing metadata. Unconverged queries (piece
    overflow, r=1 bound failure) are finished by the exact in-program
    chunked ladder; exactness is never sacrificed.

    Phase structure matters on a remote device: all chunk sorts are
    enqueued and their (tiny) piece metadata synced BEFORE any kernel
    work is enqueued — a sync issued after a kernel macro would drain the
    whole device queue. ``qchunk`` only bounds the sort stage's working
    set: chunk boundaries FRAGMENT pieces (measured at 131072: 4x more
    pieces, blocks G-slot-bound at 53% occupancy, kernel + top-k ~2x),
    so it stays large by default.
    """
    from . import knn as _knn

    xyz, index, offsets = tree_dev
    dims = tuple(int(v) for v in tree.dims)
    periodic = bool(tree.periodic)
    Q = queries.shape[0]
    geom, pair, zseg, nseg, prow, flagged = tree_plan(tree, tree_dev)
    lo_np = np.asarray(tree.lo, np.float64)
    h_np = np.asarray(tree.cell_size, np.float64)
    lo_j = jnp.asarray(lo_np.astype(np.float32))
    h_j = jnp.asarray(h_np.astype(np.float32))
    if periodic:
        L = np.asarray(tree.dims, np.float64) * h_np
        box = tuple(float(v) for v in L)
    else:
        box = (0.0, 0.0, 0.0)
    meta = (
        dims,
        tuple(float(v) for v in lo_np),
        tuple(float(v) for v in h_np),
        periodic,
        int(tree.n),
    )

    # --- phase A: sort every chunk, fetch piece metadata (tiny syncs) ---
    t0 = time.time()
    chunks = []
    for c0 in range(0, Q, qchunk):
        c1 = min(c0 + qchunk, Q)
        CQ = min(_pow2(c1 - c0, 2048), _pow2(qchunk, 2048))
        qc = queries[c0 : c0 + CQ]
        if qc.shape[0] < CQ:
            qc = jnp.concatenate(
                [qc, jnp.broadcast_to(qc[:1], (CQ - qc.shape[0], 3))]
            )
        qs, qcs, orig, dpid, slot_in_piece, pmeta, npieces_d = _stage_sort(
            qc, lo_j, h_j, dims, periodic, zseg, nseg, pair
        )
        chunks.append([c0, c1, qs, qcs, orig, dpid, slot_in_piece, pmeta,
                       npieces_d])
    t0 = _tr("A sorts enqueued", t0)
    for ch in chunks:
        npieces = int(ch[8])  # the one scalar sync per chunk
        pm = np.asarray(jax.lax.slice_in_dim(ch[7], 0, npieces, axis=1))
        ch[8] = npieces
        ch.append(pm)
    t0 = _tr("A metadata synced", t0)

    # --- phase B: pack on host, enqueue kernel work. A kernel macro's
    # [msize, QB, NCAND] distance block (2.4 GB at msize=512) is allocated
    # at DISPATCH, so in-flight macros are paced to 2 with a tiny forced
    # transfer (block_until_ready is unreliable under the axon remote
    # device): the device stays busy on macro i while the host waits for
    # i-1, and peak HBM holds two distance blocks, not one per macro ---
    inflight = []
    if k <= 128:
        # fused kernel: no HBM distance block — a macro's live output is
        # [msize, 128, kpad] f32+i32 (~67 MB at msize=512), so dozens can
        # be in flight inside the free-HBM budget. Each pace sync is a
        # full tunnel round trip; under degraded tunnel weather (measured
        # 2026-08-20: 360 s for a nominal-8 s probe) the per-macro RTTs
        # are exactly what drags the device-resident qps from 475k to
        # 128k, so the fused path paces as rarely as memory allows. The
        # budget is derived from what is actually resident (tree arrays,
        # queries, the accumulated per-macro k-slices) against the chip
        # budget (overridable like the splat path's NBODYHPC_TPU_HBM_GB),
        # not a fixed constant — a tree near chip capacity must pace
        # sooner than the 1e7-point benchmark tree.
        per_macro = batch_blocks * 128 * 128 * 8  # [msize, QB, 128] f32+i32
        budget = float(
            os.environ.get("NBODYHPC_TPU_HBM_GB", "13.0")
        ) * 2**30
        resident = (
            xyz.nbytes + index.nbytes + offsets.nbytes + prow.nbytes
            + queries.nbytes
            # chunk-lifetime arrays: sorted queries/cells/perms (~9 i32/f32
            # channels per query) plus the accumulated dk_l/sk_l k-slices
            + Q * 4 * 9
            + Q * (int(k) * 8 + 16)
        )
        free = budget - resident - (1 << 30)
        max_inflight = max(2, int(free // per_macro))
    else:
        max_inflight = 2

    def pace(dk):
        inflight.append(dk)
        if len(inflight) > max_inflight:
            float(inflight.pop(0)[0, 0])

    parts = []
    for c0, c1, qs, qcs, orig, dpid, slot_in_piece, pmeta, npieces, pm \
            in chunks:
        psz_h = pm[0].astype(np.int64)
        pid_h = pm[1].astype(np.int64)
        porder = np.argsort(-psz_h, kind="stable")
        nb2, blk_of, slot_base, gslot = _pack_host(psz_h, porder, geom.G)
        t0 = _tr(f"B pack host (npieces={npieces}, nb2={nb2})", t0)

        msizes = _macro_sizes(int(nb2), batch_blocks)
        nbpad = sum(msizes)
        map_bg = np.full((nbpad, geom.G), -1, np.int32)
        map_bg[blk_of, gslot] = pid_h

        npb = _pow2(npieces, 1024)

        def padi(a, npb=npb, npieces=npieces):
            out = np.zeros(npb, np.int32)
            out[:npieces] = a
            return jnp.asarray(out)

        qblk, runs, flat, runs_q = _stage_pack(
            qs, dpid, slot_in_piece, padi(blk_of), padi(slot_base),
            padi(gslot), jnp.asarray(map_bg), prow, nbpad=nbpad, ng=geom.G,
        )
        t0 = _tr("B stage_pack", t0, qblk)
        dk_l, sk_l, ov_l = [], [], []
        b0 = 0
        for msize in msizes:
            if k <= 128:
                # fused kernel: distances + exact top-k in VMEM, skipping
                # the [msize, QB, NCAND] HBM block (2.4 GB at msize=512)
                # and the sort-based top_k pass entirely
                # interpret: plain extraction (the segmented unroll blows
                # up interpreter lowering; see knn_pallas.query_blocks)
                ksg = 0 if interpret else _kseg(_kpad(int(k)), geom.NCAND)
                dk3, sk3 = _run_knn_topk(
                    jax.lax.slice_in_dim(runs, b0, b0 + msize),
                    jax.lax.slice_in_dim(qblk, b0, b0 + msize),
                    xyz, nblocks=msize, kpad=_kpad(int(k)),
                    periodic=periodic, box=box, interpret=interpret,
                    geom=geom, kseg=ksg,
                )
                dk = dk3[:, :, : int(k)].reshape(-1, int(k))
                sk = sk3[:, :, : int(k)].reshape(-1, int(k))
                ov_l.append(
                    (sk3[:, :, 127] > 0).reshape(-1) if ksg
                    else jnp.zeros(msize * QB, bool)
                )
                t0 = _tr(f"B fused kernel msize={msize}", t0, dk)
            else:
                d2 = _run_knn(
                    jax.lax.slice_in_dim(runs, b0, b0 + msize),
                    jax.lax.slice_in_dim(qblk, b0, b0 + msize),
                    xyz, nblocks=msize, periodic=periodic, box=box,
                    interpret=interpret, geom=geom,
                )
                t0 = _tr(f"B kernel msize={msize}", t0, d2)
                dk, sk = _topk_blocks(d2, int(k))
                ov_l.append(jnp.zeros(msize * QB, bool))
                t0 = _tr(f"B topk msize={msize}", t0, dk)
            pace(dk)
            dk_l.append(dk)
            sk_l.append(sk)
            b0 += msize
        dk = jnp.concatenate(dk_l) if len(dk_l) > 1 else dk_l[0]
        sk = jnp.concatenate(sk_l) if len(sk_l) > 1 else sk_l[0]
        ovf = jnp.concatenate(ov_l) if len(ov_l) > 1 else ov_l[0]
        flag_q = flagged[pmeta[1][dpid]]
        d, gi, conv = _epilogue(
            dk, sk, flat, runs_q, qs, qcs, flag_q, ovf, index, int(k), meta,
            geom=geom, zfull=not pair,
        )
        t0 = _tr("B epilogue", t0, d)
        # rows are in piece-sorted order: the pad tail's queries are
        # interleaved, so slicing by POSITION here would drop real queries
        # and keep pads (the original form of this line did exactly that).
        # Keep every row; pad rows get a unique sentinel id >= Q so the
        # final inverse-permutation sort pushes them past the [:Q] slice.
        real = c1 - c0
        ids = jnp.where(orig < real, orig + c0, Q + c0 + orig)
        parts.append((d, gi, conv, ids))

    d_all = jnp.concatenate([p[0] for p in parts])
    gi_all = jnp.concatenate([p[1] for p in parts])
    conv_all = jnp.concatenate([p[2] for p in parts])
    orig_all = jnp.concatenate([p[3] for p in parts])
    d_out, gi_out, conv_out = _invert_perm(orig_all, d_all, gi_all, conv_all)
    d_out, gi_out, conv_out = d_out[:Q], gi_out[:Q], conv_out[:Q]
    t0 = _tr("invert_perm", t0, d_out)

    nbad = int(jnp.sum(~conv_out))
    t0 = _tr(f"nbad sync (nbad={nbad})", t0)
    if nbad:
        # finish unconverged queries with the exact chunked ladder, still
        # on device (padded to a power-of-two bucket to bound compiles;
        # typical nbad is a handful, so the floor stays small — a 1024
        # floor cost ~600 ms of ladder work for 7 real queries)
        pad = _pow2(nbad, 128)
        bad_idx = jnp.nonzero(~conv_out, size=pad, fill_value=Q)[0]
        qb = jnp.concatenate([queries, queries[:1]])[bad_idx]
        ladder = _knn.default_ladder(k, tree)
        bmax = max(((2 * r + 1) ** 3) * c for r, c in ladder)
        chunk = max(2048, (1 << 25) // bmax)
        fnl = _knn._compiled_query_chunked(
            tree.meta_static, ladder, int(k), True, chunk
        )
        dlad, ilad = fnl(xyz, index, offsets, qb)
        d_out = jnp.concatenate([d_out, jnp.zeros((1, k), d_out.dtype)])
        gi_out = jnp.concatenate([gi_out, jnp.zeros((1, k), gi_out.dtype)])
        d_out = d_out.at[bad_idx].set(dlad)[:Q]
        gi_out = gi_out.at[bad_idx].set(ilad)[:Q]
        _tr(f"ladder fallback (pad={pad})", t0, d_out)
    return d_out, gi_out
