"""Whitespace-separated XYZ[+extras] reader (reference: io/include/pcl/io/
ascii_io.h — ASCIIReader with configurable extension/separators)."""

from __future__ import annotations

import numpy as np

from pcl_tpu.core.cloud import Cloud, from_numpy


def load(path, capacity=None, columns=("x", "y", "z")) -> Cloud:
    data = np.loadtxt(path, dtype=np.float32, ndmin=2)
    if data.shape[1] < 3:
        raise ValueError(f"need >= 3 columns, got {data.shape[1]}")
    xyz = data[:, :3]
    attrs = {}
    extra = data[:, 3:]
    if extra.shape[1] == 1:
        attrs["intensity"] = extra[:, 0]
    elif extra.shape[1] == 3:
        attrs["normal" if tuple(columns[3:4]) == ("nx",) else "rgb"] = extra
    elif extra.shape[1] > 0:
        attrs["extra"] = extra
    return from_numpy(xyz, attrs, capacity=capacity)


def save(path, cloud: Cloud) -> None:
    from pcl_tpu.core.cloud import to_numpy
    xyz, _ = to_numpy(cloud, compact=True)
    np.savetxt(path, xyz, fmt="%.9g")
