"""Distance metrics: plain L2 and periodic (min-image / torus) L2.

Reproduces the reference's two metric policies (reference: kdtree/src/cpp/
include/kdtree/kdtree.hpp:20-121): ``L2Distance`` accumulates squared
per-dimension differences, and ``L2PeriodicDistance`` uses the minimum-image
convention ``min(d^2, (d - L)^2, (d + L)^2)`` per dimension. Distances returned
by queries are square roots of these accumulations (the reference's
``postprocess``, kdtree.hpp:34-36).

``wrap_min_image`` is THE shared wrap used on the query hot paths
(ops/knn.py, ops/ball.py): it takes the box length as a static Python float
so the reciprocal is folded at trace time — the exact f32 expression
``d - L * round(d * (1/L))`` is part of the engine/oracle parity contract,
so every call site must route through here rather than re-deriving it.
A non-positive ``L`` disables the wrap for that dimension (the reference's
min-selection degrades the same way at L = 0, kdtree.hpp:66-87).
"""
from __future__ import annotations

import jax.numpy as jnp


def squared_l2(a, b):
    """Sum of squared differences along the last axis."""
    d = a - b
    return jnp.sum(d * d, axis=-1)


def wrap_min_image(d, L: float):
    """Minimum-image wrap of one displacement component for box length ``L``
    (a static Python float; ``L <= 0`` disables periodicity, matching the
    reference's graceful degradation at box_size = 0)."""
    L = float(L)
    if L <= 0.0:
        return d
    return d - L * jnp.round(d * (1.0 / L))


def min_image_delta(d, box):
    """Minimum-image displacement for each component of ``d``; ``box`` is a
    static 3-sequence of box lengths (non-positive entries disable the wrap
    for that dimension)."""
    comps = [
        wrap_min_image(d[..., i], float(box[i])) for i in range(3)
    ]
    return jnp.stack(comps, axis=-1)


def squared_l2_periodic(a, b, box):
    """Min-image squared distance along the last axis; ``box`` is a static
    3-sequence."""
    d = min_image_delta(a - b, box)
    return jnp.sum(d * d, axis=-1)
