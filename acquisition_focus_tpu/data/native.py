"""ctypes bindings for the native host-side geometry library (native/libafocus.so).

Optional fast path for offline preprocessing on the host CPU — production caller:
``data.preprocess.resample_iso`` (the per-case isotropic resample of the offline
pipeline), which falls back to the JAX op when the library is absent. Build with
``scripts/build_native.sh`` or :func:`ensure_built` (the preprocess CLIs call it).
"""

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _ROOT / 'native' / 'libafocus.so'
_lib = None


def ensure_built(quiet=True):
    """Build native/libafocus.so if missing and a host compiler exists.

    Returns True when the library is usable afterwards. Never raises: offline
    tooling calls this opportunistically and falls back to the JAX ops.
    """
    if _LIB_PATH.is_file():
        return True
    script = _ROOT / 'scripts' / 'build_native.sh'
    try:
        subprocess.run(['bash', str(script)], check=True,
                       capture_output=quiet, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return False
    return _LIB_PATH.is_file()


def _load():
    global _lib
    if _lib is None and _LIB_PATH.is_file():
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.resample_affine.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.label_center.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_double)]
        _lib = lib
    return _lib


def is_available():
    return _load() is not None


def native_grid_sample(volume, theta, out_dhw, mode='trilinear'):
    """(C, D, H, W) float32 volume + (4, 4) grid affine -> (C, Do, Ho, Wo).

    Same semantics as ops.resample.grid_sample for a single (unbatched) volume.
    """
    lib = _load()
    assert lib is not None, "native library not built (scripts/build_native.sh)"
    vol = np.ascontiguousarray(volume, np.float32)
    th = np.ascontiguousarray(theta, np.float64)
    C, D, H, W = vol.shape
    Do, Ho, Wo = out_dhw
    out = np.empty((C, Do, Ho, Wo), np.float32)
    lib.resample_affine(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        C, D, H, W,
        th.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        Do, Ho, Wo, 1 if mode == 'nearest' else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def native_label_center(label):
    lib = _load()
    assert lib is not None
    lbl = np.ascontiguousarray(label, np.int32)
    out = np.empty(3, np.float64)
    lib.label_center(
        lbl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        *lbl.shape, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out
