"""ctypes binding to the native C++ runtime (native/impala_native.cpp).

Lazy-builds ``libimpala_native.so`` with the in-tree Makefile on first use if
the toolchain is available; every caller has a pure-Python fallback, so the
library is an accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libimpala_native.so"))

_lock = threading.Lock()
_lib = None
_tried = False

# dtype codes matching impala_native.cpp pick_loader
DTYPE_CODES = {
    "|u1": 0, "|i1": 1, "<i2": 2, ">i2": 3, "<u2": 4, ">u2": 5,
    "<i4": 6, ">i4": 7, "<u4": 8, ">u4": 9, "<f4": 10, ">f4": 11,
    "<f8": 12, ">f8": 13,
}


def _build():
    makefile_dir = os.path.abspath(_NATIVE_DIR)
    if not os.path.exists(os.path.join(makefile_dir, "Makefile")):
        return False
    try:
        subprocess.run(["make", "-C", makefile_dir], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib():
    """The loaded library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("OPENIMPALA_NO_NATIVE", "0") == "1":
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.impala_threshold_decode.restype = ctypes.c_int
        lib.impala_unpack_bits.restype = ctypes.c_int
        lib.impala_flood_fill.restype = ctypes.c_int64
        lib.impala_percolation_mask.restype = ctypes.c_int64
        lib.impala_percolation_mask_phase.restype = ctypes.c_int64
        lib.impala_remspot.restype = ctypes.c_int64
        if hasattr(lib, "impala_bfs_seeded"):
            lib.impala_bfs_seeded.restype = ctypes.c_int64
        if hasattr(lib, "impala_pack_eq"):
            lib.impala_pack_eq.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def threshold_decode(raw: np.ndarray, thr: float, vtrue: int, vfalse: int):
    """int8 thresholded copy of a raw (any supported dtype) buffer, or None
    when the native library is unavailable."""
    lib = get_lib()
    code = DTYPE_CODES.get(raw.dtype.str)
    if lib is None or code is None:
        return None
    flat = np.ascontiguousarray(raw).reshape(-1)
    out = np.empty(flat.shape, np.int8)
    rc = lib.impala_threshold_decode(
        _ptr(flat.view(np.uint8), ctypes.c_uint8), ctypes.c_int64(flat.size),
        ctypes.c_int(code), ctypes.c_double(thr), ctypes.c_int8(vtrue),
        ctypes.c_int8(vfalse), _ptr(out, ctypes.c_int8),
    )
    if rc != 0:
        return None
    return out.reshape(raw.shape)


def unpack_bits(packed: np.ndarray, n_values: int, fill_order: int = 1):
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint8)
    out = np.empty(n_values, np.uint8)
    lib.impala_unpack_bits(_ptr(packed, ctypes.c_uint8),
                           ctypes.c_int64(n_values), ctypes.c_int(fill_order),
                           _ptr(out, ctypes.c_uint8))
    return out


def pack_eq(phase: np.ndarray, phase_id: int):
    """MSB-first bit-packed ``phase == phase_id`` along the last axis in ONE
    C pass (numpy needs a compare pass + a packbits pass — ~1.3 s + 0.3 s at
    512^3 on this host vs ~0.2 s fused).  Returns a uint8 array of shape
    ``(*phase.shape[:-1], phase.shape[-1] // 8)``, or None when the fast
    path doesn't apply (library missing, dtype unsupported, Z % 8 != 0, or a
    phase_id outside the int8 reinterpretation range — same guards as
    percolation_mask_phase)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "impala_pack_eq"):
        return None
    phase = np.asarray(phase)
    code = _PHASE_DTYPES.get(phase.dtype)
    if (code is None or not phase.flags.c_contiguous
            or phase.shape[-1] % 8 != 0):
        return None
    phase_id = _reinterpret_phase_id(phase.dtype, phase_id)
    if code == 0 and not (-128 <= phase_id < 128):
        return None
    out = np.empty(phase.shape[:-1] + (phase.shape[-1] // 8,), np.uint8)
    rc = lib.impala_pack_eq(
        phase.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(code),
        ctypes.c_int64(int(phase_id)), ctypes.c_int64(phase.size),
        _ptr(out, ctypes.c_uint8),
    )
    return out if rc == 0 else None


def percolation_mask(phase_ok: np.ndarray, direction: int):
    """(active_mask bool, n_active) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(phase_ok, np.int8)
    active = np.empty(p.shape, np.int8)
    n = lib.impala_percolation_mask(
        _ptr(p, ctypes.c_int8), ctypes.c_int64(p.shape[0]),
        ctypes.c_int64(p.shape[1]), ctypes.c_int64(p.shape[2]),
        ctypes.c_int(direction), _ptr(active, ctypes.c_int8),
    )
    if n < 0:
        return None
    return active.astype(bool), int(n)


_PHASE_DTYPES = {np.dtype(np.int8): 0, np.dtype(np.uint8): 0,
                 np.dtype(np.int32): 1}


def _reinterpret_phase_id(dtype, phase_id: int) -> int:
    """uint8 volumes ride the int8 C comparison: both the volume bytes and
    the id pass through the same cast, so mapping an id in [128, 255] to its
    int8 reinterpretation (id - 256) keeps the comparison an exact
    bijection.  Ids outside [0, 255] can never match a uint8 volume and are
    left as-is (the range guard then routes them to the slow fallback,
    which correctly returns an empty mask)."""
    if np.dtype(dtype) == np.uint8 and 128 <= phase_id <= 255:
        return phase_id - 256
    return phase_id


def percolation_mask_phase(phase: np.ndarray, phase_id: int, direction: int):
    """Like percolation_mask but from the RAW phase volume: the
    ``phase == phase_id`` comparison happens inside the C pad copy, sparing
    two full-volume numpy passes.  None if the library or dtype fast path
    is unavailable (callers fall back to the compare-then-mask route)."""
    lib = get_lib()
    if lib is None:
        return None
    phase = np.asarray(phase)
    code = _PHASE_DTYPES.get(phase.dtype)
    if code is None or not phase.flags.c_contiguous:
        return None
    phase_id = _reinterpret_phase_id(phase.dtype, phase_id)
    if code == 0 and not (-128 <= phase_id < 128):
        # the C side static_casts phase_id to int8; out-of-range ids would
        # wrap (e.g. an int32 volume's id 200 -> -56) and falsely match —
        # fall back instead (uint8 ids in [128,255] were already remapped
        # to their exact int8 reinterpretation above)
        return None
    active = np.empty(phase.shape, np.int8)
    n = lib.impala_percolation_mask_phase(
        phase.ctypes.data_as(ctypes.c_void_p), ctypes.c_int(code),
        ctypes.c_int64(int(phase_id)), ctypes.c_int64(phase.shape[0]),
        ctypes.c_int64(phase.shape[1]), ctypes.c_int64(phase.shape[2]),
        ctypes.c_int(direction), _ptr(active, ctypes.c_int8),
    )
    if n < 0:
        return None
    return active.astype(bool), int(n)


def remspot(phase: np.ndarray):
    """(filtered phase, n_flips) or None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    p = np.ascontiguousarray(phase, np.int32)
    out = np.empty(p.shape, np.int32)
    flips = lib.impala_remspot(
        _ptr(p, ctypes.c_int32), ctypes.c_int64(p.shape[0]),
        ctypes.c_int64(p.shape[1]), ctypes.c_int64(p.shape[2]),
        _ptr(out, ctypes.c_int32),
    )
    return out, int(flips)


def bfs_seeded(phase_ok: np.ndarray, prev_mask: np.ndarray,
               seeds: np.ndarray):
    """Incremental seeded BFS (the per-shard step of distributed
    percolation): expands ``seeds`` over ``phase_ok`` into ``prev_mask``.
    Returns ``(mask_out, n_new)`` or None if the library is unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "impala_bfs_seeded"):
        return None
    p = np.ascontiguousarray(phase_ok, np.int8)
    m = np.ascontiguousarray(prev_mask, np.int8)
    s = np.ascontiguousarray(seeds, np.int8)
    out = np.empty(p.shape, np.int8)
    n = lib.impala_bfs_seeded(
        _ptr(p, ctypes.c_int8), _ptr(m, ctypes.c_int8),
        _ptr(s, ctypes.c_int8), ctypes.c_int64(p.shape[0]),
        ctypes.c_int64(p.shape[1]), ctypes.c_int64(p.shape[2]),
        _ptr(out, ctypes.c_int8),
    )
    if n < 0:
        return None
    return out.astype(bool), int(n)
