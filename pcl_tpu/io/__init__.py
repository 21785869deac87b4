from pcl_tpu.io.pcd import load as load_pcd, save as save_pcd
from pcl_tpu.io.ply import load as load_ply, save as save_ply
from pcl_tpu.io import lzf

__all__ = ["load_pcd", "save_pcd", "lzf"]


def _load_ifs(path, **kw):
    from pcl_tpu.io.formats_extra import load_ifs_cloud
    return load_ifs_cloud(path)


def _load_vtk(path, **kw):
    from pcl_tpu.io.formats_extra import load_vtk_cloud
    return load_vtk_cloud(path)


def load(path, **kw):
    """Auto-dispatch by extension (reference: io/include/pcl/io/auto_io.h)."""
    p = str(path).lower()
    if p.endswith(".pcd"):
        return load_pcd(path, **kw)
    if p.endswith(".ply"):
        from pcl_tpu.io.ply import load as load_ply
        return load_ply(path, **kw)
    if p.endswith(".xyz") or p.endswith(".txt"):
        from pcl_tpu.io.ascii import load as load_ascii
        return load_ascii(path, **kw)
    if p.endswith(".obj"):
        from pcl_tpu.io.obj import load as load_obj
        return load_obj(path, **kw)
    if p.endswith(".ifs"):
        return _load_ifs(path, **kw)
    if p.endswith(".vtk"):
        return _load_vtk(path, **kw)
    raise ValueError(f"unknown point-cloud file extension: {path}")


def save(path, cloud, **kw):
    p = str(path).lower()
    if p.endswith(".pcd"):
        return save_pcd(path, cloud, **kw)
    if p.endswith(".ply"):
        from pcl_tpu.io.ply import save as save_ply
        return save_ply(path, cloud, **kw)
    if p.endswith(".xyz") or p.endswith(".txt"):
        from pcl_tpu.io.ascii import save as save_ascii
        return save_ascii(path, cloud, **kw)
    if p.endswith(".vtk"):
        import numpy as np
        from pcl_tpu.io.formats_extra import save_vtk
        from pcl_tpu.core.cloud import to_numpy
        xyz, _ = to_numpy(cloud)
        return save_vtk(path, np.asarray(xyz), **kw)
    if p.endswith(".ifs"):
        import numpy as np
        from pcl_tpu.io.formats_extra import save_ifs
        from pcl_tpu.core.cloud import to_numpy
        xyz, _ = to_numpy(cloud)
        return save_ifs(path, np.asarray(xyz), **kw)
    if p.endswith(".obj"):
        from pcl_tpu.io.obj import save as save_obj
        return save_obj(path, cloud, **kw)
    raise ValueError(f"unknown point-cloud file extension: {path}")
