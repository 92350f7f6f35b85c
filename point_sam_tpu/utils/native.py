"""ctypes bindings for the native C++ host-side geometry library (csrc/).

Builds csrc/psam_native.cpp on first use with g++ (cached in
``~/.cache/point_sam_tpu``), binds via ctypes (no pybind11 in this
environment), and falls back to NumPy implementations when no compiler is
available. Used by data preprocessing and the evaluation tooling; also the
independent ground truth for kernel tests.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "psam_native.cpp"
_lib = None
_tried = False


def _build_lib() -> ctypes.CDLL | None:
    global _tried
    if _tried:
        return _lib
    _tried = True
    if not _SRC.exists():
        return None
    cache = Path(
        os.environ.get("PSAM_NATIVE_CACHE",
                       Path.home() / ".cache" / "point_sam_tpu")
    )
    cache.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so = cache / f"psam_native_{tag}.so"
    if not so.exists():
        cmd = [
            "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
            "-pthread", str(_SRC), "-o", str(so),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError) as e:
            print(f"psam_native build failed ({e}); using numpy fallback")
            return None
    lib = ctypes.CDLL(str(so))
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.psam_fps.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.psam_knn.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                             ctypes.c_int64, i32p, f32p]
    lib.psam_chamfer.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64,
                                 f32p]
    lib.psam_normalize.argtypes = [f32p, ctypes.c_int64, f32p]
    lib.psam_normalize.restype = ctypes.c_float
    lib.psam_version.restype = ctypes.c_int
    globals()["_lib"] = lib
    return lib


def _as_f32(x):
    return np.ascontiguousarray(x, dtype=np.float32)


def have_native() -> bool:
    return _build_lib() is not None


def fps_cpu(points: np.ndarray, num_samples: int) -> np.ndarray:
    """[N, 3] -> [G] int32, same selection rule as ops.fps."""
    pts = _as_f32(points)
    n = len(pts)
    lib = _build_lib()
    out = np.zeros(num_samples, np.int32)
    if lib is not None:
        lib.psam_fps(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            num_samples, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return out
    mind = np.full(n, np.inf, np.float32)
    sel = 0
    out[0] = 0
    for s in range(1, num_samples):
        mind = np.minimum(mind, ((pts - pts[sel]) ** 2).sum(-1))
        sel = int(np.argmax(mind))
        out[s] = sel
    return out


def knn_cpu(query: np.ndarray, key: np.ndarray, k: int):
    """Exact kNN -> (d2 [Nq, k], idx [Nq, k] int32), ascending."""
    q, kk = _as_f32(query), _as_f32(key)
    nq, nk = len(q), len(kk)
    lib = _build_lib()
    if lib is not None:
        idx = np.zeros((nq, k), np.int32)
        d2 = np.zeros((nq, k), np.float32)
        lib.psam_knn(
            q.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nq,
            kk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nk, k,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return d2, idx
    d = ((q[:, None, :] - kk[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1)[:, :k].astype(np.int32)
    return np.take_along_axis(d, idx, 1).astype(np.float32), idx


def chamfer_cpu(src: np.ndarray, tgt: np.ndarray) -> np.ndarray:
    """One-directional chamfer: per-src min squared distance to tgt."""
    s, t = _as_f32(src), _as_f32(tgt)
    lib = _build_lib()
    if lib is not None:
        out = np.zeros(len(s), np.float32)
        lib.psam_chamfer(
            s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(s),
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(t),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    return ((s[:, None, :] - t[None, :, :]) ** 2).sum(-1).min(1)


def normalize_cpu(points: np.ndarray):
    """In-place-style unit-sphere normalization -> (points, shift, scale)."""
    pts = _as_f32(points).copy()
    lib = _build_lib()
    if lib is not None:
        shift = np.zeros(3, np.float32)
        scale = lib.psam_normalize(
            pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts),
            shift.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return pts, shift, float(scale)
    shift = pts.mean(0)
    pts = pts - shift
    scale = float(np.linalg.norm(pts, axis=1).max())
    return pts / max(scale, 1e-12), shift, scale
