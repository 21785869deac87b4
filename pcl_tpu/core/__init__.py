from pcl_tpu.core.cloud import (
    Cloud,
    make_cloud,
    from_numpy,
    to_numpy,
    concat,
    compact,
    compact_indices,
)
from pcl_tpu.core import geometry, transforms, spring, intersections

__all__ = [
    "Cloud",
    "make_cloud",
    "from_numpy",
    "to_numpy",
    "concat",
    "compact",
    "compact_indices",
    "geometry",
    "transforms",
    "spring",
    "intersections",
]
