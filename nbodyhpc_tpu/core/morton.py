"""Morton (Z-order) encoding for 3D cell coordinates.

Used to order particles/cells so that spatially adjacent cells are adjacent in
memory, which gives the TPU kernels DMA-friendly contiguous candidate blocks.
This replaces the reference's pointer-based kd-tree spatial ordering
(reference: kdtree/src/cpp/include/kdtree/kdtree_impl.hpp:78-174) with a
sort-based structure that XLA handles natively.

Works both on numpy arrays (host-side build) and jnp arrays (traced).
"""
from __future__ import annotations


def _part1by2(x):
    """Spread the low 10 bits of x so there are two zero bits between each."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _compact1by2(x):
    x = x & 0x09249249
    x = (x | (x >> 2)) & 0x030C30C3
    x = (x | (x >> 4)) & 0x0300F00F
    x = (x | (x >> 8)) & 0x030000FF
    x = (x | (x >> 16)) & 0x000003FF
    return x


def morton_encode3(ix, iy, iz):
    """Interleave three 10-bit integer coordinates into a 30-bit Morton code."""
    return _part1by2(ix) | (_part1by2(iy) << 1) | (_part1by2(iz) << 2)


def morton_decode3(code):
    """Inverse of :func:`morton_encode3`."""
    return _compact1by2(code), _compact1by2(code >> 1), _compact1by2(code >> 2)
