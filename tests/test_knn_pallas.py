"""Pallas k-NN candidate kernel vs the exact XLA path (interpret mode).

Shapes are deliberately small: interpret-mode kernel evaluation costs
~seconds per block batch on one CPU core, and CI runs the whole suite —
the budget is a sub-5-minute `pytest -q` (the real-hardware validation
lives in the verify skill probes, .claude/skills/verify/SKILL.md)."""
import numpy as np
import pytest

from nbodyhpc_tpu.kdtree import KDTree
from nbodyhpc_tpu.ops import knn


def _pts(n, seed, box=1.0):
    rng = np.random.Generator(np.random.Philox(seed))
    return (rng.random((n, 3)) * box).astype(np.float32)


@pytest.mark.slow
@pytest.mark.parametrize("periodic", [False, True])
def test_kernel_path_matches_exact(periodic):
    pts = _pts(1200, 21)
    q = _pts(160, 22)
    tree = KDTree(pts, boxsize=1.0 if periodic else None)
    ref = knn.cell_knn_query(tree._tree, tree._dev, q, 6, use_kernel="never")
    got = knn.cell_knn_query(tree._tree, tree._dev, q, 6, use_kernel="force")
    np.testing.assert_allclose(got.distances, ref.distances, rtol=1e-6)
    np.testing.assert_array_equal(got.indices, ref.indices)


@pytest.mark.slow
def test_query_blocks_chunked_matches_unchunked():
    """qchunk smaller than Q: per-chunk prep/drain must return the same
    answers (and the same convergence verdicts' *answers* after the ladder)
    as one big chunk — pins the overlapped-prep refactor."""
    from nbodyhpc_tpu.ops import knn_pallas

    pts = _pts(1000, 31)
    q = _pts(288, 32)
    tree = KDTree(pts, boxsize=1.0)
    one = knn_pallas.query_blocks(
        tree._tree, tree._dev, q, 5, interpret=True, qchunk=1 << 20
    )
    few = knn_pallas.query_blocks(
        tree._tree, tree._dev, q, 5, interpret=True, qchunk=128
    )
    # chunking regroups pieces, so tie ORDER inside a block may differ;
    # distances and the converged mask's certified answers must agree
    np.testing.assert_allclose(few[0], one[0], rtol=1e-6)
    both = one[2] & few[2]
    np.testing.assert_array_equal(
        np.sort(few[1][both], axis=1), np.sort(one[1][both], axis=1)
    )


@pytest.mark.slow
def test_kernel_path_clustered_escalates():
    rng = np.random.Generator(np.random.Philox(5))
    cluster = (rng.normal(scale=0.002, size=(1200, 3)) + 0.5).astype(np.float32)
    pts = np.clip(np.concatenate([cluster, _pts(100, 6)]), 0, 0.999).astype(
        np.float32
    )
    q = _pts(128, 7)
    tree = KDTree(pts)
    ref = knn.cell_knn_query(tree._tree, tree._dev, q, 4, use_kernel="never")
    got = knn.cell_knn_query(tree._tree, tree._dev, q, 4, use_kernel="force")
    np.testing.assert_allclose(got.distances, ref.distances, rtol=1e-6)
    np.testing.assert_array_equal(got.indices, ref.indices)


def test_build_blocks_stats_cover_own_neighborhood():
    """Kernel-path QueryStatistics come from the host run tables
    (build_blocks, no kernel needed): every unflagged query's
    points_visited must cover at least its OWN 27-cell neighborhood
    (the piece scans the z-union over all its queries, a superset), and
    cells_scanned at least those of its 27 cells that exist."""
    from nbodyhpc_tpu.ops import knn_pallas

    pts = _pts(3000, 51)
    tree = KDTree(pts, boxsize=1.0)
    t = tree._tree
    dims = np.asarray(t.dims)
    assert (dims >= 3).all()  # aliasing-free wrap for this workload
    q = _pts(400, 52)

    h = np.asarray(t.cell_size, np.float64)
    lo = np.asarray(t.lo, np.float64)
    qcell = np.floor((q - lo[None, :].astype(np.float32))
                     / h[None, :].astype(np.float32)).astype(np.int64)
    qcell = np.mod(qcell, dims[None, :])

    (order, _qmap, _qblk, _runs, piece_of_q, _bop, _gs, flagged,
     cs_piece, pv_piece) = knn_pallas.build_blocks(t, q, qcell)

    offsets = np.asarray(t.offsets)
    Cy, Cz = int(dims[1]), int(dims[2])
    for p in range(q.shape[0]):
        piece = piece_of_q[p]
        if flagged[piece]:
            continue
        cx, cy, cz = qcell[order[p]]
        npts = 0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    cid = (((cx + dx) % dims[0]) * Cy
                           + (cy + dy) % Cy) * Cz + (cz + dz) % Cz
                    npts += int(offsets[cid + 1] - offsets[cid])
        assert pv_piece[piece] >= npts
        assert cs_piece[piece] >= 27
        assert pv_piece[piece] <= t.n


@pytest.mark.slow
def test_with_stats_rides_kernel_path():
    """with_stats no longer disables the kernel path: forced kernel
    queries return the same answers as the ladder, converged queries
    carry table-derived counters, and unconverged ones carry the
    ladder's own counters (which certified their answers)."""
    pts = _pts(1200, 61)
    q = _pts(160, 62)
    tree = KDTree(pts, boxsize=1.0)
    ref = knn.cell_knn_query(
        tree._tree, tree._dev, q, 6, use_kernel="never", with_stats=True
    )
    got = knn.cell_knn_query(
        tree._tree, tree._dev, q, 6, use_kernel="force", with_stats=True
    )
    np.testing.assert_allclose(got.distances, ref.distances, rtol=1e-6)
    np.testing.assert_array_equal(got.indices, ref.indices)
    assert got.stats is not None
    assert got.stats.points_visited.shape == (160,)
    assert (got.stats.points_visited >= 6).all()
    assert (got.stats.cells_scanned > 0).all()
