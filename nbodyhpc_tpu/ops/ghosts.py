"""Periodic ghost-particle augmentation (host-side preprocessing).

Exact functional mirror of the reference's CPU vertex pre-processing
(reference: rasterization/src/cpp/vertex_utilities.cpp:13-43): for each
periodic dimension (box size > 0), any particle whose sphere crosses the 0 or L
face is cloned to the wrapped position; dimensions are processed sequentially
so corner-crossing particles spawn all combinations (up to 7 clones, more if a
diameter exceeds the box). Runs eagerly in numpy, like the reference runs it on
the CPU before upload — ghost counts are data-dependent and must not enter the
jitted path.
"""
from __future__ import annotations

import numpy as np


def augment_points_periodic(positions, weights, radii, box_size):
    """Clone boundary-crossing particles across periodic faces.

    Parameters mirror ``wenda::augment_vertices_periodic``: ``box_size`` is a
    3-sequence; entries <= 0 disable periodicity for that dimension.

    Returns (positions, weights, radii) with clones appended.
    """
    positions = np.asarray(positions, np.float32)
    weights = np.asarray(weights, np.float32)
    radii = np.asarray(radii, np.float32)

    for dim in range(3):
        L = float(box_size[dim])
        if L <= 0:
            continue
        hi = positions[:, dim] + radii > L
        lo = positions[:, dim] - radii < 0.0
        clones = []
        for mask, shift in ((hi, -L), (lo, +L)):
            if np.any(mask):
                p = positions[mask].copy()
                p[:, dim] += shift
                clones.append((p, weights[mask], radii[mask]))
        if clones:
            positions = np.concatenate([positions] + [c[0] for c in clones])
            weights = np.concatenate([weights] + [c[1] for c in clones])
            radii = np.concatenate([radii] + [c[2] for c in clones])
    return positions, weights, radii


def augment_points_periodic_device(positions, weights, radii, box_size):
    """Device-resident variant of :func:`augment_points_periodic`.

    Identical dim-sequential clone semantics and output ordering (hi-face
    clones then lo-face clones per dimension, ascending source index).
    Ghost counts are data-dependent, so this runs eagerly with one small
    host sync per dimension to size the clone gathers; everything else
    stays in HBM. Use it when the particle set already lives on device —
    at 1e8 particles the host version costs minutes of single-core numpy
    plus a full re-upload, while this costs milliseconds. The row gathers
    here are prep, not hot-path (the no-gather invariant applies to the
    per-voxel deposit/query loops, not to a one-off boundary compaction).
    """
    import jax.numpy as jnp

    for dim in range(3):
        L = float(box_size[dim])
        if L <= 0:
            continue
        x = positions[:, dim]
        hi = x + radii > L
        lo = x - radii < 0.0
        nhi, nlo = (int(v) for v in np.asarray(jnp.stack(
            [jnp.sum(hi, dtype=jnp.int32), jnp.sum(lo, dtype=jnp.int32)]
        )))
        clones = []
        for mask, cnt, shift in ((hi, nhi, -L), (lo, nlo, +L)):
            if cnt:
                idx = jnp.nonzero(mask, size=cnt)[0]
                p = positions[idx].at[:, dim].add(jnp.float32(shift))
                clones.append((p, weights[idx], radii[idx]))
        if clones:
            positions = jnp.concatenate([positions] + [c[0] for c in clones])
            weights = jnp.concatenate([weights] + [c[1] for c in clones])
            radii = jnp.concatenate([radii] + [c[2] for c in clones])
    return positions, weights, radii
