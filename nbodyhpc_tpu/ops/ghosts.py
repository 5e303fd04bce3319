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
