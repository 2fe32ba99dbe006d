"""Native-backed wavefront OBJ loading (same contract as objloader.load_obj).

The C++ scanner (native/obj_loader.cpp) does the IO-bound line parsing; the
reference-quirk dedup (position-index keyed, first occurrence wins) is shared
numpy code in objloader.shape_from_flat.
"""

from __future__ import annotations

import ctypes
from typing import List

import numpy as np

from tracy_tpu.scene.objloader import ObjShape, shape_from_flat
from tracy_tpu.utils.native import get_native_lib


def load_obj_native(path: str) -> List[ObjShape]:
    lib = get_native_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")

    counts = np.zeros((4,), dtype=np.int64)
    handle = lib.tracy_obj_scan(path.encode(), counts.ctypes.data_as(ctypes.c_void_p))
    if handle < 0:
        raise FileNotFoundError(path)
    try:
        nv, nn, nt, nc = (int(x) for x in counts)
        v = np.empty((nv, 3), dtype=np.float32)
        vn = np.empty((nn, 3), dtype=np.float32)
        vt = np.empty((nt, 2), dtype=np.float32)
        f_v = np.empty((nc,), dtype=np.int32)
        f_vt = np.empty((nc,), dtype=np.int32)
        f_vn = np.empty((nc,), dtype=np.int32)
        shape_id = np.empty((nc,), dtype=np.int32)
        rc = lib.tracy_obj_fill(
            handle,
            v.ctypes.data_as(ctypes.c_void_p),
            vn.ctypes.data_as(ctypes.c_void_p),
            vt.ctypes.data_as(ctypes.c_void_p),
            f_v.ctypes.data_as(ctypes.c_void_p),
            f_vt.ctypes.data_as(ctypes.c_void_p),
            f_vn.ctypes.data_as(ctypes.c_void_p),
            shape_id.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise RuntimeError("tracy_obj_fill failed")
    finally:
        lib.tracy_obj_free(handle)

    positions = v.astype(np.float64)
    normals = vn.astype(np.float64)
    uvs = vt.astype(np.float64)

    shapes: List[ObjShape] = []
    for sid in np.unique(shape_id):
        sel = shape_id == sid
        shapes.append(
            shape_from_flat("", f_v[sel], f_vt[sel], f_vn[sel], positions, normals, uvs)
        )
    return shapes


def load_obj_fast(path: str) -> List[ObjShape]:
    """Native loader with Python fallback."""
    try:
        return load_obj_native(path)
    except RuntimeError:
        from tracy_tpu.scene.objloader import load_obj

        return load_obj(path)
