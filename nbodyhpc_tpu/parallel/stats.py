"""Sharded summary statistics: the flagship end-to-end pipeline of
BASELINE.md — snapshot -> density field + kNN-CDF over the mesh.

Histogram reduction rides ``psum`` over the slab axis (SURVEY.md §5.8's
"global reductions (total mass, kNN-CDF statistics) via psum").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.cells import CellList
from ..core.points import round_up
from ..ops import knn as _knn
from .mesh import make_slab_mesh


def knn_cdf_sharded(tree: CellList, tree_dev, k, radii, n_queries: int = 65536,
                    mesh: Mesh | None = None, seed: int = 0):
    """kNN-CDFs with the random query set sharded over the mesh and the
    histogram reduced with psum. Returns (radii, cdf [len(k), len(radii)]).
    """
    if mesh is None:
        mesh = make_slab_mesh()
    axis = mesh.axis_names[0]
    nd = mesh.devices.size

    ks = tuple(int(v) for v in (k if np.ndim(k) else (k,)))
    kmax = max(ks)
    radii = np.asarray(radii, np.float32)

    rng = np.random.Generator(np.random.Philox(seed))
    if tree.periodic:
        lo = np.zeros(3)
        hi = tree.boxsize.astype(np.float64)
    else:
        lo = tree.lo.astype(np.float64)
        hi = lo + tree.cell_size.astype(np.float64) * tree.dims
    ladder = _knn.default_ladder(kmax, tree)
    # bound peak memory like cell_knn_query does: one ladder pass
    # materializes [chunk, cells_in_cube * cap] candidates, so the per-device
    # shard is processed in lax.map chunks instead of one monolithic pass
    bmax = max(((2 * r + 1) ** 3) * c for r, c in ladder)
    ch = int(min(max((n_queries + nd - 1) // nd, 1),
                 max(2048, (1 << 25) // bmax)))
    ch = round_up(ch, 8)
    qloc = round_up(max((n_queries + nd - 1) // nd, 1), ch)
    q = (lo + rng.random((nd * qloc, 3)) * (hi - lo)).astype(np.float32)

    qfn = _knn._make_query_fn(tree.meta_static, ladder, kmax, True, False)
    r_j = jnp.asarray(radii)
    kidx = jnp.asarray([kk - 1 for kk in ks])

    def shard_fn(xyz, index, offsets, queries):
        def one(qc):
            dist, _ = qfn(xyz, index, offsets, qc)
            kth = dist[:, kidx]  # [ch, nk]
            return jnp.sum(
                (kth[:, :, None] <= r_j[None, None, :]).astype(jnp.float32),
                axis=0,
            )

        hists = jax.lax.map(one, queries.reshape(-1, ch, 3))
        return jax.lax.psum(jnp.sum(hists, axis=0), axis)

    mapped = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis)),
        out_specs=P(),
    )
    xyz, index, offsets = tree_dev
    hist = jax.jit(mapped)(xyz, index, offsets, jnp.asarray(q))
    cdf = np.asarray(hist) / (nd * qloc)
    return radii, cdf
