# Typing stubs for the public k-NN surface — the analog of the reference's
# shipped binding stub (reference: kdtree/src/python/nbodyhpc/kdtree/_impl.pyi).
from typing import Any, Optional, Tuple, Union

import numpy as np

from ..ops.knn import QueryStatistics as QueryStatistics

__all__ = ["KDTree", "QueryStatistics"]

_BoxSize = Union[None, float, Tuple[float, float, float]]

class KDTree:
    def __init__(
        self,
        points: Any,
        leafsize: int = ...,
        max_threads: int = ...,
        boxsize: _BoxSize = ...,
        **kwargs: Any,
    ) -> None: ...
    @property
    def n(self) -> int: ...
    @property
    def size(self) -> int: ...
    @property
    def periodic(self) -> bool: ...
    @property
    def boxsize(self) -> Union[None, float, Tuple[float, ...]]: ...
    def query(
        self, points: Any, k: int = ..., workers: int = ..., **kwargs: Any
    ) -> Tuple[np.ndarray, np.ndarray]: ...
    def query_device(
        self, queries: Any, k: int = ..., engine: str = ...
    ) -> Tuple[Any, Any]: ...
    def query_with_statistics(
        self, points: Any, k: int = ...
    ) -> Tuple[np.ndarray, np.ndarray, QueryStatistics]: ...
    def query_radius_count(
        self, points: Any, radius: Union[float, Any]
    ) -> np.ndarray: ...
