"""ctypes wrapper for the native binned-SAH BVH builder."""

from __future__ import annotations

import ctypes

import numpy as np

from tracy_tpu.accel.bvh_build import HostBVH
from tracy_tpu.utils.native import get_native_lib


def build_bvh_native(
    tri_min: np.ndarray, tri_max: np.ndarray, leaf_size: int = 8,
    max_depth: int = 60, cost_mode: str = "tris"
) -> HostBVH:
    lib = get_native_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")

    t = len(tri_min)
    tri_min = np.ascontiguousarray(tri_min, dtype=np.float32)
    tri_max = np.ascontiguousarray(tri_max, dtype=np.float32)
    node_bounds = np.empty((2 * t + 2, 6), dtype=np.float32)
    node_meta = np.empty((2 * t + 2, 3), dtype=np.int32)
    tri_order = np.empty((t,), dtype=np.int32)
    out_depth = np.zeros((1,), dtype=np.int32)

    n = lib.tracy_build_bvh(
        tri_min.ctypes.data_as(ctypes.c_void_p),
        tri_max.ctypes.data_as(ctypes.c_void_p),
        t, leaf_size, max_depth, 1 if cost_mode == "chunks" else 0,
        node_bounds.ctypes.data_as(ctypes.c_void_p),
        node_meta.ctypes.data_as(ctypes.c_void_p),
        tri_order.ctypes.data_as(ctypes.c_void_p),
        out_depth.ctypes.data_as(ctypes.c_void_p),
    )
    if n < 0:
        raise RuntimeError("tracy_build_bvh failed")
    return HostBVH(
        node_bounds=node_bounds[:n].copy(),
        node_meta=node_meta[:n].copy(),
        tri_order=tri_order,
        max_depth=int(out_depth[0]),
    )
