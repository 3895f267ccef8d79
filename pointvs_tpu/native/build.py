"""Lazy build + ctypes bindings for the native graph-ops library.

Compiles graphops.cpp once per source hash into
~/.cache/pointvs_tpu/native/ and loads it with ctypes (no pybind11
dependency). All entry points return None gracefully when no compiler is
present, so the numpy fallbacks keep everything working.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

from pointvs_tpu.logging import get_logger

LOG = get_logger('PointVS-TPU')

_SRC = Path(__file__).parent / 'graphops.cpp'
_CACHE_DIR = Path(os.environ.get(
    'POINTVS_NATIVE_CACHE',
    os.path.join(os.path.expanduser('~'), '.cache', 'pointvs_tpu',
                 'native')))
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

HAVE_COMPILER = shutil.which('g++') is not None


def _compile() -> Optional[Path]:
    if not HAVE_COMPILER:
        return None
    src = _SRC.read_bytes()
    digest = hashlib.sha1(src).hexdigest()[:16]
    out = _CACHE_DIR / f'graphops-{digest}.so'
    if out.exists():
        return out
    _CACHE_DIR.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix('.tmp.so')
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC',
           str(_SRC), '-o', str(tmp)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        tmp.rename(out)
        return out
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        LOG.warning(f'native graphops build failed ({e}); using numpy path')
        return None


def get_graphops() -> Optional[ctypes.CDLL]:
    """The loaded library, building it on first use; None on failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so_path = _compile()
        if so_path is None:
            return None
        lib = ctypes.CDLL(str(so_path))
        lib.pvs_box_filter.restype = ctypes.c_int
        lib.pvs_box_filter.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_double, ctypes.POINTER(ctypes.c_uint8)]
        lib.pvs_radius_edges.restype = ctypes.c_int64
        lib.pvs_radius_edges.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.pvs_counting_argsort.restype = None
        lib.pvs_counting_argsort.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32)]
        lib.pvs_max_window_load.restype = ctypes.c_int64
        lib.pvs_max_window_load.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32]
        lib.pvs_symhalf.restype = ctypes.c_int64
        lib.pvs_symhalf.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint8)]
        _LIB = lib
        LOG.info(f'native graphops loaded from {so_path}')
        return _LIB


def _dptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _bptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def native_box_filter(lig_xyz: np.ndarray, rec_xyz: np.ndarray,
                      radius: float) -> Optional[np.ndarray]:
    """Indices of receptor atoms within radius of any ligand atom."""
    lib = get_graphops()
    if lib is None or not len(rec_xyz):
        return None
    lig = np.ascontiguousarray(lig_xyz, dtype=np.float64)
    rec = np.ascontiguousarray(rec_xyz, dtype=np.float64)
    keep = np.zeros(len(rec), dtype=np.uint8)
    lib.pvs_box_filter(_dptr(lig), len(lig), _dptr(rec), len(rec),
                       ctypes.c_double(radius), _bptr(keep))
    return np.where(keep)[0]


def native_counting_argsort(ids: np.ndarray, max_id: int
                            ) -> Optional[np.ndarray]:
    """Stable argsort of bounded non-negative int32 ids; None if no lib."""
    lib = get_graphops()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    out = np.empty(len(ids), dtype=np.int32)
    lib.pvs_counting_argsort(_iptr(ids), len(ids),
                             ctypes.c_int32(max_id), _iptr(out))
    return out


def native_max_window_load(ids: np.ndarray, id_bound: int,
                           window: int) -> Optional[int]:
    lib = get_graphops()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    return int(lib.pvs_max_window_load(
        _iptr(ids), len(ids), ctypes.c_int32(id_bound),
        ctypes.c_int32(window)))


def native_symhalf(senders: np.ndarray, receivers: np.ndarray,
                   recv_perm: np.ndarray, edge_class: np.ndarray,
                   n_pad: int):
    """(half_s, half_r, half_class_bits) for the symmetric-half wire
    format, or None when unavailable/ineligible (see pvs_symhalf)."""
    lib = get_graphops()
    if lib is None:
        return None
    e = len(senders)
    senders = np.ascontiguousarray(senders, dtype=np.int32)
    receivers = np.ascontiguousarray(receivers, dtype=np.int32)
    recv_perm = np.ascontiguousarray(recv_perm, dtype=np.int32)
    edge_class = np.ascontiguousarray(edge_class, dtype=np.uint8)
    half_s = np.empty(e // 2, dtype=np.uint16)
    half_r = np.empty(e // 2, dtype=np.uint16)
    bits = np.empty(e // 8, dtype=np.uint8)
    n_up = lib.pvs_symhalf(
        _iptr(senders), _iptr(receivers), _iptr(recv_perm),
        _bptr(edge_class), ctypes.c_int64(e), ctypes.c_int32(n_pad),
        half_s.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        half_r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        _bptr(bits))
    if n_up < 0:
        return None
    return half_s, half_r, bits


# Adaptive capacity hint: items in one dataset have similar edge counts,
# and an undersized first guess costs a full extra O(N^2) native pass per
# item (measured: nearly every cold item paid it at the old 4096 start).
_EDGE_CAP_HINT = [4096]


def native_radius_edges(xyz: np.ndarray, bp: np.ndarray, inter_r: float,
                        intra_r: float, prune: bool):
    """(rows, cols, attrs, keep_mask) or None when unavailable."""
    lib = get_graphops()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(xyz, dtype=np.float64)
    bp = np.ascontiguousarray(bp, dtype=np.int32)
    n = len(bp)
    cap = max(_EDGE_CAP_HINT[0], 4096)
    while True:
        rows = np.empty(cap, dtype=np.int32)
        cols = np.empty(cap, dtype=np.int32)
        attrs = np.empty(cap, dtype=np.int32)
        keep = np.empty(n, dtype=np.uint8)
        count = lib.pvs_radius_edges(
            _dptr(xyz), _iptr(bp), n, ctypes.c_double(inter_r),
            ctypes.c_double(intra_r), int(prune), _iptr(rows), _iptr(cols),
            _iptr(attrs), ctypes.c_int64(cap), _bptr(keep))
        if count >= 0:
            if 2 * count > _EDGE_CAP_HINT[0]:
                _EDGE_CAP_HINT[0] = int(2 * count)
            return (rows[:count].copy(), cols[:count].copy(),
                    attrs[:count].copy(), keep.astype(bool))
        if cap > 1 << 26:  # 64M edges: give up, numpy path will also OOM
            return None
        cap *= 4
