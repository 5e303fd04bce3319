"""Fixed-radius (ball) queries: neighbor counts within a radius.

The reference exposes only k-NN, but ball counts are the natural companion for
kNN-CDF / correlation statistics (see :mod:`nbodyhpc_tpu.utils.stats`).
Implementation: a streaming masked scan of the whole (padded) point array per
query block — O(N x Q), VPU-dense with no data movement, which on TPU beats
per-cell slicing until Q is small and the radius tiny. A cell-list candidate
path (as in ops/knn.py) is a possible optimization for that regime; the
tree's offsets are accepted (and currently unused) so the signature already
permits it.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cells import CellList
from .metrics import wrap_min_image


@functools.lru_cache(maxsize=32)
def _compiled_count(npad, n, periodic, box, block):
    def run(xyz, queries, r2):
        q = queries  # [Q, 3]
        nblocks = npad // block

        def body(acc, i):
            d2 = jnp.zeros((q.shape[0], block), jnp.float32)
            for dim in range(3):
                px = jax.lax.dynamic_slice(xyz, (dim, i * block), (1, block))
                d = q[:, dim : dim + 1] - px
                if periodic:
                    d = wrap_min_image(d, float(box[dim]))
                d2 = d2 + d * d
            slot = i * block + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
            ok = (d2 <= r2[:, None]) & (slot < n)
            return acc + jnp.sum(ok, axis=1, dtype=jnp.int32), None

        acc, _ = jax.lax.scan(body, jnp.zeros((q.shape[0],), jnp.int32), jnp.arange(nblocks))
        return acc

    return jax.jit(run)


def ball_count(tree: CellList, tree_dev, queries, radius, chunk: int = 16384) -> np.ndarray:
    """Count points within ``radius`` of each query point (inclusive boundary)."""
    xyz, _, _ = tree_dev
    queries = np.asarray(queries, np.float32)
    Q = queries.shape[0]
    r = np.broadcast_to(np.asarray(radius, np.float32), (Q,)).astype(np.float32)
    box = tuple(float(v) for v in tree.boxsize) if tree.periodic else None
    from .knn import _divisor_block

    block = _divisor_block(tree.xyz.shape[1], min(4096, tree.xyz.shape[1]))
    fn = _compiled_count(int(tree.xyz.shape[1]), int(tree.n), bool(tree.periodic), box, block)

    out = np.empty((Q,), np.int32)
    csize = min(chunk, max(Q, 1))
    for s in range(0, max(Q, 1), csize):
        e = min(s + csize, Q)
        qc = queries[s:e]
        rc = r[s:e]
        if qc.shape[0] < csize:
            pad = csize - qc.shape[0]
            qc = np.pad(qc, ((0, pad), (0, 0)))
            rc = np.pad(rc, (0, pad))
        out[s:e] = np.asarray(fn(xyz, jnp.asarray(qc), jnp.asarray(rc * rc)))[: e - s]
    return out
