"""Device-resident kNN block build (ops/knn_device.py).

Fast tier: the static piece tables must cover, for every piece, exactly
the tree slots of its 3x3 (pair-union) neighborhood x z-window, each slot
at most once (duplicate coverage would surface as repeated top-k hits) —
checked against an independent numpy cell-membership oracle. The sort
stage's segmentation invariants are checked directly.

Slow tier (interpret-mode Pallas, --runslow): end-to-end
KDTree.query_device(engine="kernel") parity vs the exact host path.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from nbodyhpc_tpu.kdtree import KDTree
from nbodyhpc_tpu.ops import knn_device
from nbodyhpc_tpu.ops.knn_device import (
    G,
    NRUNS,
    QB,
    RCAP,
    _stage_sort,
    piece_geometry,
    static_piece_tables,
)


def _tree(n, seed, periodic, leafsize=64):
    rng = np.random.default_rng(seed)
    pts = rng.random((n, 3), dtype=np.float32)
    return pts, KDTree(pts, leafsize=leafsize,
                       boxsize=1.0 if periodic else None)


@pytest.mark.parametrize("periodic", [True, False])
def test_static_tables_cover_neighborhoods_exactly(periodic):
    pts, t = _tree(4000, 1, periodic)
    tree = t._tree
    zseg, nseg, npair, nsp = piece_geometry(tree)
    prow, flagged = static_piece_tables(tree, t._dev)
    prow = np.asarray(prow)
    flagged = np.asarray(flagged)
    Cx, Cy, Cz = (int(v) for v in tree.dims)
    offsets = np.asarray(t._dev[2])

    # cell id of every sorted slot (from the tree's own offsets)
    ncells = Cx * Cy * Cz
    slot_cell = np.zeros(int(tree.xyz.shape[1]), np.int64) - 1
    for c in range(ncells):
        slot_cell[offsets[c] : offsets[c + 1]] = c

    rng = np.random.default_rng(2)
    for p in rng.choice(nsp, size=min(nsp, 40), replace=False):
        m, s = p // nseg, p % nseg
        colA = 2 * m
        colB = min(2 * m + 1, Cx * Cy - 1)
        z0, z1 = s * zseg - 1, min((s + 1) * zseg, Cz)

        want = set()
        for col in {colA, colB}:
            cx, cy = col // Cy, col % Cy
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    x, y = cx + dx, cy + dy
                    if periodic:
                        x, y = x % Cx, y % Cy
                    elif not (0 <= x < Cx and 0 <= y < Cy):
                        continue
                    for z in range(z0, z1 + 1):
                        zz = z % Cz if periodic else z
                        if 0 <= zz < Cz:
                            want.add(((x * Cy + y) * Cz + zz))
        want_slots = sorted(
            sl for c in want
            for sl in range(offsets[c], offsets[c + 1])
        )

        got = []
        for r in range(NRUNS):
            s0, ln, sh = (
                prow[p, r], prow[p, NRUNS + r], prow[p, 2 * NRUNS + r]
            )
            got.extend(range(s0 + sh, s0 + sh + ln))
        if flagged[p]:
            assert not got  # flagged pieces carry no runs
            continue
        assert len(got) == len(set(got)), "duplicate slot coverage"
        assert sorted(got) == want_slots


@pytest.mark.parametrize("periodic", [True, False])
def test_fullz_tables_cover_column_neighborhoods_exactly(periodic):
    """FULLZ geometry (pieces = single full-z cell columns): the run tables
    must cover, for every column, exactly the tree slots of its 3x3
    neighbor columns over the FULL z extent, each slot at most once —
    the exactness contract that lets the epilogue drop the z face from the
    convergence bound (reference analog: the per-leaf full scan,
    kdtree_opt.hpp:105-248)."""
    from nbodyhpc_tpu.ops.knn_device import _build_static_tables_fullz
    from nbodyhpc_tpu.ops.knn_pallas import FULLZ

    pts, t = _tree(4000, 1, periodic)
    tree = t._tree
    Cx, Cy, Cz = (int(v) for v in tree.dims)
    npad = int(tree.xyz.shape[1])
    offsets = np.asarray(t._dev[2])
    prow, flagged = _build_static_tables_fullz(
        t._dev[2], (Cx, Cy, Cz), periodic, npad
    )
    prow = np.asarray(prow)
    flagged = np.asarray(flagged)
    NR = FULLZ.NR

    rng = np.random.default_rng(2)
    ncol = Cx * Cy
    for col in rng.choice(ncol, size=min(ncol, 40), replace=False):
        cx, cy = col // Cy, col % Cy
        want = set()
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                x, y = cx + dx, cy + dy
                if periodic:
                    x, y = x % Cx, y % Cy
                elif not (0 <= x < Cx and 0 <= y < Cy):
                    continue
                for z in range(Cz):
                    want.add((x * Cy + y) * Cz + z)
        want_slots = sorted(
            sl for c in want
            for sl in range(offsets[c], offsets[c + 1])
        )
        got = []
        for r in range(NR):
            s0, ln, sh = (
                prow[col, r], prow[col, NR + r], prow[col, 2 * NR + r]
            )
            got.extend(range(s0 + sh, s0 + sh + ln))
        if flagged[col]:
            assert not got
            continue
        assert len(got) == len(set(got)), "duplicate slot coverage"
        assert sorted(got) == want_slots


def test_tree_plan_prefers_fullz_and_falls_back_when_dense():
    """Sparse uniform trees take a FULLZ rung (columns fit the candidate
    budget; the RCAP rung is sized to the tree's measured max 3-column
    slice); a tree whose columns exceed the largest rung keeps ZSEG."""
    from nbodyhpc_tpu.ops.knn_device import tree_plan
    from nbodyhpc_tpu.ops.knn_pallas import FULLZ, ZSEG, fullz_geom

    pts, t = _tree(4000, 7, True)
    plan = tree_plan(t._tree, t._dev)
    geom, pair = plan[0], plan[1]
    assert not pair and geom.NR == FULLZ.NR
    # a 4000-point tree's columns are tiny: the smallest rung must win
    assert geom.RCAP < FULLZ.RCAP
    assert geom == fullz_geom(geom.RCAP)

    # all points in one thin column: its 3-column slice is the whole array,
    # far past FULLZ's 12k-lane budget once n > NR * RCAP
    rng = np.random.default_rng(8)
    pts2 = rng.random((20000, 3), dtype=np.float32)
    pts2[:, 0] *= 1e-3
    pts2[:, 1] *= 1e-3
    t2 = KDTree(pts2, boxsize=1.0)
    geom2 = tree_plan(t2._tree, t2._dev)[0]
    assert geom2 is ZSEG


def test_stage_sort_segmentation_invariants():
    pts, t = _tree(3000, 3, True)
    tree = t._tree
    zseg, nseg, npair, nsp = piece_geometry(tree)
    rng = np.random.default_rng(4)
    CQ = 2048
    q = jnp.asarray(rng.random((CQ, 3), dtype=np.float32))
    lo = jnp.asarray(np.asarray(tree.lo, np.float32))
    h = jnp.asarray(np.asarray(tree.cell_size, np.float32))
    qs, qcs, orig, dpid, sip, pmeta, npieces = _stage_sort(
        q, lo, h, tuple(int(v) for v in tree.dims), True, zseg, nseg
    )
    psz, pid_c = pmeta[0], pmeta[1]
    npieces = int(npieces)
    dpid = np.asarray(dpid)
    sip = np.asarray(sip)
    psz = np.asarray(psz)
    pid_c = np.asarray(pid_c)
    orig = np.asarray(orig)
    qs = np.asarray(qs)

    assert npieces <= CQ and dpid.max() == npieces - 1
    assert psz[:npieces].sum() == CQ and (psz[npieces:] == 0).all()
    assert (sip < QB).all() and (sip >= 0).all()
    # dpid non-decreasing, sizes match counts, slots dense per piece
    assert (np.diff(dpid) >= 0).all()
    counts = np.bincount(dpid, minlength=npieces)
    np.testing.assert_array_equal(counts, psz[:npieces])
    for p in (0, npieces // 2, npieces - 1):
        sel = dpid == p
        np.testing.assert_array_equal(np.sort(sip[sel]), np.arange(sel.sum()))
    # every query's static pid matches its piece's compacted pid
    Cy, Cz = int(tree.dims[1]), int(tree.dims[2])
    cell = np.asarray(qcs)
    pid_q = (cell[:, 0] * Cy + cell[:, 1]) // 2 * nseg + cell[:, 2] // zseg
    np.testing.assert_array_equal(pid_q, pid_c[dpid])
    # orig is a permutation carrying the original query rows
    assert np.sort(orig).tolist() == list(range(CQ))
    np.testing.assert_allclose(qs, np.asarray(q)[orig], rtol=0, atol=0)


@pytest.mark.slow
@pytest.mark.parametrize("periodic", [True, False])
def test_query_blocks_device_interpret_parity(periodic):
    """End-to-end device path (interpret-mode kernel) vs the exact host
    path, including the ladder finish of unconverged queries."""
    pts, t = _tree(4000, 5, periodic, leafsize=256)
    rng = np.random.default_rng(6)
    # non-power-of-two Q: the chunk pads to 4096 and the pad rows are
    # INTERLEAVED with real queries after the piece sort — regression for
    # the positional [:real] slice that scrambled padded batches
    q = rng.random((2100, 3), dtype=np.float32)
    d, i = t.query_device(jnp.asarray(q), k=4, engine="kernel")
    dref, iref = t.query(q, k=4)
    np.testing.assert_array_equal(np.asarray(i), iref)
    np.testing.assert_allclose(np.asarray(d), dref, rtol=1e-6, atol=0)
