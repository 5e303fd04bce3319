# Typing stubs for the public rasterizer surface — the analog of the
# reference's shipped binding stub (kdtree ships _impl.pyi; the rasterizer
# module's contract is documented in rasterization/src/python/nbodyhpc/
# rasterizer/__init__.py:42-143).
from typing import Any, Optional, Tuple, Union

import numpy as np

Extent2d = Union[int, Tuple[int, int]]
Extent3d = Union[int, Tuple[int, int, int]]
PeriodT = Union[bool, float, Tuple[float, float, float]]

__all__ = [
    "Container",
    "PointRenderer",
    "get_default_container",
    "get_point_renderer",
    "render_points",
    "render_points_volume",
]

class Container:
    enable_validation_layers: bool
    def __init__(
        self, enable_validation_layers: bool = ..., device: Any = ...
    ) -> None: ...
    def device_ctx(self) -> Any: ...

class PointRenderer:
    width: int
    height: int
    subsample_factor: int
    def __init__(
        self,
        container: Optional[Container],
        width: int,
        height: int,
        subsample_factor: int = ...,
    ) -> None: ...
    def render_points(
        self,
        positions: Any,
        weights: Any,
        radii: Any,
        pixels_per_unit: float,
        period: Any = ...,
    ) -> np.ndarray: ...
    def render_points_volume(
        self,
        positions: Any,
        weights: Any,
        radii: Any,
        num_slices: int,
        pixels_per_unit: float,
        period: Any = ...,
    ) -> np.ndarray: ...

def get_default_container() -> Container: ...
def get_point_renderer(
    grid_size: Extent2d,
    subsample_factor: int = ...,
    container: Optional[Container] = ...,
) -> PointRenderer: ...
def render_points(
    positions: Any,
    weights: Any,
    radii: Any,
    pixels_per_unit: float,
    grid_size: Extent2d,
    periodic: PeriodT = ...,
) -> np.ndarray: ...
def render_points_volume(
    positions: Any,
    weights: Any,
    radii: Any,
    pixels_per_unit: float,
    grid_size: Extent3d,
    periodic: PeriodT = ...,
    subsample_factor: int = ...,
) -> np.ndarray: ...
