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


@pytest.fixture
def small_zseg(monkeypatch):
    """Interpret-sized ZSEG geometry for the slow e2e parity tests.

    The production ZSEG (G=12 pieces x NR=36 slots x RCAP=256) unrolls
    432 gated DMA/select units per kernel — the Pallas INTERPRETER's
    lowering of that graph takes tens of minutes to hours on one CPU
    core (the round-4 slow tier never completed; measured hang/SIGSEGV
    round 5). G=3 x RCAP=128 exercises every mechanism (table build,
    run splitting, piece packing, kernel, epilogues) at a lowering the
    interpreter can compile in ~a minute. query_blocks reads the ZSEG
    globals at call time for exactly this purpose."""
    from nbodyhpc_tpu.ops import knn_pallas as kp

    g = kp.KGeom(G=3, NR=36, RCAP=128)
    monkeypatch.setattr(kp, "G", 3)
    monkeypatch.setattr(kp, "RCAP", 128)
    monkeypatch.setattr(kp, "NCAND", 36 * 128)
    monkeypatch.setattr(kp, "RFETCH", 256)
    monkeypatch.setattr(kp, "ZSEG", g)
    return g


@pytest.mark.slow
@pytest.mark.parametrize("periodic", [False, True])
def test_kernel_path_matches_exact(periodic, small_zseg):
    pts = _pts(1200, 21)
    q = _pts(160, 22)
    tree = KDTree(pts, boxsize=1.0 if periodic else None)
    ref = knn.cell_knn_query(tree._tree, tree._dev, q, 6, use_kernel="never")
    got = knn.cell_knn_query(tree._tree, tree._dev, q, 6, use_kernel="force")
    np.testing.assert_allclose(got.distances, ref.distances, rtol=1e-6)
    np.testing.assert_array_equal(got.indices, ref.indices)


@pytest.mark.slow
def test_query_blocks_chunked_matches_unchunked(small_zseg):
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
def test_kernel_path_clustered_escalates(small_zseg):
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
def test_with_stats_rides_kernel_path(small_zseg):
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


def test_knn_topk_kernel_smoke_fullz():
    """Default-tier direct-kernel smoke (VERDICT r2 ask 7): one interpret
    block of the fused kernel under the FULLZ geometry (the smallest
    unroll: G x NR = 72 gated units) against a numpy oracle built from the
    same run tables — covers DMA fetch + roll, the gated scratch
    selection, masked validity, and the extract-min passes, in seconds."""
    import jax.numpy as jnp

    from nbodyhpc_tpu.ops.knn_pallas import FULLZ, _kpad, _run_knn_topk

    geom = FULLZ
    rng = np.random.Generator(np.random.Philox(77))
    npad = geom.RFETCH + 256
    xyz = rng.random((4, npad)).astype(np.float32)
    k = 4

    # piece 0: two runs (one shifted); piece 1: one run; others empty
    runs = np.zeros((1, geom.G, 128), np.int32)
    spec = {0: [(0, 100), (131, 50)], 1: [(256, 40)]}
    for g, rr in spec.items():
        for r, (start, ln) in enumerate(rr):
            s0 = min((start // 128) * 128, npad - geom.RFETCH)
            runs[0, g, r] = s0
            runs[0, g, geom.NR + r] = ln
            runs[0, g, 2 * geom.NR + r] = start - s0

    qblk = np.zeros((1, 128, 4), np.float32)
    qblk[0, :, :3] = rng.random((128, 3))
    qblk[0, :, 3] = -1.0  # pad rows match no piece
    qblk[0, :10, 3] = 0.0
    qblk[0, 10:16, 3] = 1.0

    dk, sk = _run_knn_topk(
        jnp.asarray(runs), jnp.asarray(qblk), jnp.asarray(xyz),
        nblocks=1, kpad=_kpad(k), periodic=False, box=(0.0, 0.0, 0.0),
        interpret=True, geom=geom,
    )
    dk = np.asarray(dk)[0, :, :k]
    sk = np.asarray(sk)[0, :, :k]

    for q in range(16):
        g = 0 if q < 10 else 1
        cand = np.concatenate([
            np.arange(start, start + ln) for (start, ln) in spec[g]
        ])
        d2 = ((xyz[:3, cand] - qblk[0, q, :3][:, None]) ** 2).sum(axis=0)
        order = np.argsort(d2, kind="stable")[:k]
        np.testing.assert_allclose(dk[q], d2[order], rtol=1e-6)
        # decode kernel slot -> tree slot via the same run tables
        r_of = sk[q] // geom.RCAP
        s0 = runs[0, g, r_of]
        sh = runs[0, g, 2 * geom.NR + r_of]
        np.testing.assert_array_equal(s0 + sh + sk[q] % geom.RCAP,
                                      cand[order])
    assert not np.isfinite(dk[16:]).any()  # pad rows retire to inf


def test_knn_topk_kernel_segmented_matches_and_flags():
    """Default-tier smoke of the two-level (segmented) fused top-k: k=8
    activates kseg (kpad >= 8), results must match the numpy oracle with
    the lax.top_k tie rule, and a row whose top-k clusters in one
    lane-residue segment must raise the overflow flag (sk lane 127) —
    the exactness guard that routes such rows to the ladder."""
    import jax.numpy as jnp

    from nbodyhpc_tpu.ops.knn_pallas import KGeom, _kpad, _kseg, \
        _run_knn_topk

    # small interpret-friendly geometry in the FULLZ family shape (the
    # full-size unroll takes minutes under the Pallas interpreter);
    # NCAND = 4608 >= 4096 keeps the default kseg policy active
    geom = KGeom(G=4, NR=9, RCAP=512)
    kpad = _kpad(8)
    assert _kseg(kpad, geom.NCAND) == 4  # default policy activates here
    rng = np.random.Generator(np.random.Philox(99))
    npad = geom.RFETCH + 1024
    xyz = np.full((4, npad), 10.0, np.float32)
    xyz[:3, :1200] = rng.random((3, 1200)) + 2.0  # far-ish spread
    # adversarial cluster for piece 1: the 8 nearest all share lane
    # residue 5 (lanes 5, 133, ..., 901 of a 1024-long logical run —
    # split across two RCAP=512 slots, residue preserved: 512 % 128 == 0)
    near = 5 + 128 * np.arange(8)
    xyz[:3, near] = 0.001 * rng.random((3, 8))
    xyz[3] = 0.0

    runs = np.zeros((1, geom.G, 128), np.int32)
    # piece 0: a normal spread run; piece 1: the clustered 1024-long run
    # as two physical slots
    runs[0, 0, 0] = 1024 // 128 * 128
    runs[0, 0, geom.NR] = 150
    runs[0, 0, 2 * geom.NR] = 0
    runs[0, 1, 0] = 0
    runs[0, 1, geom.NR] = 512
    runs[0, 1, 2 * geom.NR] = 0
    runs[0, 1, 1] = 512
    runs[0, 1, geom.NR + 1] = 512
    runs[0, 1, 2 * geom.NR + 1] = 0

    qblk = np.zeros((1, 128, 4), np.float32)
    qblk[0, :, :3] = rng.random((128, 3)) + 2.0
    qblk[0, :, 3] = -1.0
    qblk[0, :6, 3] = 0.0     # piece 0 queries
    qblk[0, 6, :3] = 0.0     # piece 1 query at the cluster
    qblk[0, 6, 3] = 1.0

    dk, sk = _run_knn_topk(
        jnp.asarray(runs), jnp.asarray(qblk), jnp.asarray(xyz),
        nblocks=1, kpad=kpad, periodic=False, box=(0.0, 0.0, 0.0),
        interpret=True, geom=geom, kseg=6,
    )
    dk = np.asarray(dk)[0]
    sk = np.asarray(sk)[0]

    # piece-0 queries: exact parity with the oracle, no overflow flag
    cand = np.arange(1024, 1024 + 150)
    for q in range(6):
        d2 = ((xyz[:3, cand] - qblk[0, q, :3][:, None]) ** 2).sum(axis=0)
        order = np.argsort(d2, kind="stable")[:8]
        np.testing.assert_allclose(dk[q, :8], d2[order], rtol=1e-6)
        np.testing.assert_array_equal(sk[q, :8], order)
        assert sk[q, 127] == 0, "spread row must not flag"

    # piece-1 query: 8 nearest share one segment > kseg=6 -> flagged
    assert sk[6, 127] == 1, "clustered row must raise the overflow flag"
    # ...and its extracted prefix is still correct as far as it goes
    # (first kseg entries of the hot segment come out in order)
    d2c = ((xyz[:3, :1024] - qblk[0, 6, :3][:, None]) ** 2).sum(axis=0)
    want = np.sort(d2c)[:6]
    np.testing.assert_allclose(dk[6, :6], want, rtol=1e-6)
