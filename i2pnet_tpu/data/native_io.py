"""ctypes bindings for the native host-IO library (native/i2pnet_io.cpp).

The library is built on first use (make -C native); every entry point has
a numpy fallback so the pipeline works without a toolchain. On this class
of host (single core, 150k-point samples) the fused C paths cut the
per-sample assembly cost several-fold vs chained numpy ops.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libi2pnet_io.so"))
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    # Rebuild when any build input (i2pnet_io.cpp, Makefile, headers) is
    # newer than the .so — loading a stale binary silently runs old
    # kernels. All file access goes through an flock so concurrent
    # first-touch (forked data workers, parallel eval jobs sharing the
    # repo) cannot race a rebuild and dlopen a half-written library:
    # rebuilders hold LOCK_EX; loaders hold LOCK_SH for the dlopen, so a
    # reader can never observe the linker's truncate-then-write window.
    native_dir = os.path.abspath(_NATIVE_DIR)

    def _stale() -> bool:
        if not os.path.exists(_LIB_PATH):
            return True
        try:
            lib_m = os.path.getmtime(_LIB_PATH)
            for fn in os.listdir(native_dir):
                if fn.endswith((".cpp", ".cc", ".h", ".hpp")) or fn == "Makefile":
                    if os.path.getmtime(os.path.join(native_dir, fn)) > lib_m:
                        return True
        except OSError:
            return True
        return False

    lib = None
    try:
        import fcntl

        lock_path = os.path.join(native_dir, ".build.lock")
        with open(lock_path, "w") as lock:
            shared = not _stale()
            fcntl.flock(lock, fcntl.LOCK_SH if shared else fcntl.LOCK_EX)
            try:
                # re-check under the lock: another process may have
                # finished (or started needing) a rebuild while we waited
                if _stale():
                    if shared:  # upgrade; flock re-acquires, no deadlock
                        fcntl.flock(lock, fcntl.LOCK_EX)
                    if _stale():  # a concurrent upgrader may have built it
                        subprocess.run(
                            ["make", "-C", native_dir],
                            check=True,
                            capture_output=True,
                            timeout=120,
                        )
                lib = ctypes.CDLL(_LIB_PATH)
            finally:
                fcntl.flock(lock, fcntl.LOCK_UN)
    except Exception:
        # toolchain/lock unavailable: fall back to a best-effort load of
        # whatever binary exists
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
    if lib is None:
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.read_velodyne_bin.restype = ctypes.c_int64
    lib.read_velodyne_bin.argtypes = [ctypes.c_char_p, f32p, f32p, ctypes.c_int64]
    lib.transform_pad_points.restype = None
    lib.transform_pad_points.argtypes = [f32p, ctypes.c_int64, f32p, f32p, ctypes.c_int64]
    lib.voxel_downsample.restype = ctypes.c_int64
    lib.voxel_downsample.argtypes = [f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_float, f32p]
    lib.assemble_large_range_sample.restype = None
    lib.assemble_large_range_sample.argtypes = [
        f32p, f32p, f32p, i64p, ctypes.c_int64, f32p, ctypes.c_int64,
        f32p, f32p, f32p, f32p,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_velodyne_bin(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """-> (xyz (n,3) f32, intensity (n,) f32).

    The buffer is sized from the file (16 bytes per record), so no scan is
    silently truncated; a trailing partial record is dropped on both the
    native and fallback paths (identical outputs by toolchain)."""
    n_rec = os.path.getsize(path) // 16
    lib = _load()
    if lib is None:
        raw = np.fromfile(path, np.float32, count=n_rec * 4).reshape(-1, 4)
        return np.ascontiguousarray(raw[:, :3]), np.ascontiguousarray(raw[:, 3])
    xyz = np.empty((n_rec, 3), np.float32)
    inten = np.empty((n_rec,), np.float32)
    n = lib.read_velodyne_bin(path.encode(), _fp(xyz), _fp(inten), n_rec)
    if n < 0:
        raise FileNotFoundError(path)
    return xyz[:n], inten[:n]


def transform_pad_points(xyz: np.ndarray, E: np.ndarray, total: int) -> np.ndarray:
    """out[i] = E[:, :3] @ xyz[i] + E[:, 3], zero-padded to (total, 3)."""
    xyz = np.ascontiguousarray(xyz, np.float32)
    E = np.ascontiguousarray(E, np.float32).reshape(3, 4)
    lib = _load()
    if lib is None:
        out = np.zeros((total, 3), np.float32)
        n = min(len(xyz), total)
        out[:n] = xyz[:n] @ E[:, :3].T + E[:, 3]
        return out
    out = np.empty((total, 3), np.float32)
    # clamp like the numpy fallback: the C kernel writes n points into the
    # (total, 3) buffer with no bound check of its own
    lib.transform_pad_points(
        _fp(xyz), min(len(xyz), total), _fp(E), _fp(out), total
    )
    return out


def voxel_downsample(points: np.ndarray, voxel: float) -> np.ndarray:
    """Average points per voxel; points (n, c) with xyz first."""
    points = np.ascontiguousarray(points, np.float32)
    lib = _load()
    if lib is None:
        from i2pnet_tpu.data.preprocess import voxel_downsample as np_vd

        return np_vd(points, voxel)
    out = np.empty_like(points)
    n_out = lib.voxel_downsample(
        _fp(points), len(points), points.shape[1], ctypes.c_float(voxel), _fp(out)
    )
    return out[:n_out].copy()


def assemble_large_range_sample(
    xyz: np.ndarray,
    intensity: np.ndarray,
    normals: Optional[np.ndarray],
    perm: np.ndarray,
    E: np.ndarray,
    total: int,
):
    """Fused permute + transform + pad (the KittiLargeRangeDataset hot loop).

    Returns (lidar (total,3), feats (total,1), raw (total,3),
    sn (total,3) or None).
    """
    xyz = np.ascontiguousarray(xyz, np.float32)
    intensity = np.ascontiguousarray(intensity, np.float32).reshape(-1)
    E = np.ascontiguousarray(E, np.float32).reshape(3, 4)
    perm = np.ascontiguousarray(perm, np.int64)
    n = min(len(perm), total)
    lib = _load()
    if lib is None:
        sel = perm[:n]
        raw = np.zeros((total, 3), np.float32)
        raw[:n] = xyz[sel]
        lidar = np.zeros((total, 3), np.float32)
        lidar[:n] = raw[:n] @ E[:, :3].T + E[:, 3]
        feats = np.zeros((total, 1), np.float32)
        feats[:n, 0] = intensity[sel]
        sn = None
        if normals is not None:
            sn = np.zeros((total, 3), np.float32)
            sn[:n] = normals[sel] @ E[:, :3].T
        return lidar, feats, raw, sn

    lidar = np.empty((total, 3), np.float32)
    feats = np.empty((total, 1), np.float32)
    raw = np.empty((total, 3), np.float32)
    sn = np.empty((total, 3), np.float32) if normals is not None else None
    nrm = np.ascontiguousarray(normals, np.float32) if normals is not None else None
    lib.assemble_large_range_sample(
        _fp(xyz),
        _fp(intensity),
        _fp(nrm) if nrm is not None else ctypes.cast(None, ctypes.POINTER(ctypes.c_float)),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        _fp(E),
        total,
        _fp(lidar),
        _fp(feats),
        _fp(raw),
        _fp(sn) if sn is not None else ctypes.cast(None, ctypes.POINTER(ctypes.c_float)),
    )
    return lidar, feats, raw, sn
