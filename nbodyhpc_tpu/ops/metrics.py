"""Distance metrics: plain L2 and periodic (min-image / torus) L2.

Reproduces the reference's two metric policies (reference: kdtree/src/cpp/
include/kdtree/kdtree.hpp:20-121): ``L2Distance`` accumulates squared
per-dimension differences, and ``L2PeriodicDistance`` uses the minimum-image
convention ``min(d^2, (d - L)^2, (d + L)^2)`` per dimension. Distances returned
by queries are square roots of these accumulations (the reference's
``postprocess``, kdtree.hpp:34-36).

All functions broadcast and are jit/vmap friendly.
"""
from __future__ import annotations

import jax.numpy as jnp


def squared_l2(a, b):
    """Sum of squared differences along the last axis."""
    d = a - b
    return jnp.sum(d * d, axis=-1)


def min_image_delta(d, box):
    """Minimum-image displacement for each component of ``d`` in a periodic box.

    Equivalent to the reference's per-dimension ``min(d^2, (d±L)^2)`` selection
    (kdtree.hpp:66-87) but computed as a wrap of the displacement itself.
    """
    return d - box * jnp.round(d / box)


def squared_l2_periodic(a, b, box):
    """Min-image squared distance along the last axis; ``box`` broadcasts to 3."""
    d = min_image_delta(a - b, box)
    return jnp.sum(d * d, axis=-1)
