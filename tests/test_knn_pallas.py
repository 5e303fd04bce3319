"""Pallas k-NN candidate kernel vs the exact XLA path (interpret mode)."""
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
    pts = _pts(4000, 21)
    q = _pts(600, 22)
    tree = KDTree(pts, boxsize=1.0 if periodic else None)
    ref = knn.cell_knn_query(tree._tree, tree._dev, q, 6, use_kernel="never")
    got = knn.cell_knn_query(tree._tree, tree._dev, q, 6, use_kernel="force")
    np.testing.assert_allclose(got.distances, ref.distances, rtol=1e-6)
    np.testing.assert_array_equal(got.indices, ref.indices)


@pytest.mark.slow
def test_kernel_path_clustered_escalates():
    rng = np.random.Generator(np.random.Philox(5))
    cluster = (rng.normal(scale=0.002, size=(3000, 3)) + 0.5).astype(np.float32)
    pts = np.clip(np.concatenate([cluster, _pts(100, 6)]), 0, 0.999).astype(
        np.float32
    )
    q = _pts(300, 7)
    tree = KDTree(pts)
    ref = knn.cell_knn_query(tree._tree, tree._dev, q, 4, use_kernel="never")
    got = knn.cell_knn_query(tree._tree, tree._dev, q, 4, use_kernel="force")
    np.testing.assert_allclose(got.distances, ref.distances, rtol=1e-6)
    np.testing.assert_array_equal(got.indices, ref.indices)
