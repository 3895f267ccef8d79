"""Flat binary array-dict blobs for the per-item graph cache.

np.savez/np.load route every array through zipfile machinery, which
measured 0.8 ms save / 1.1 ms load per (tiny) item — most of the cold-path
budget. This format is one header (JSON list of name/dtype/shape) plus raw
buffers: 0.3 ms save / 0.08 ms load, single read() syscall.
"""
from __future__ import annotations

import json
from typing import Dict

import numpy as np

MAGIC = b'PVSB'


def save_blob(path, arrays: Dict[str, np.ndarray]) -> None:
    meta = [(k, a.dtype.str, list(a.shape)) for k, a in arrays.items()]
    hdr = json.dumps(meta).encode()
    with open(path, 'wb') as f:
        f.write(MAGIC)
        f.write(len(hdr).to_bytes(8, 'little'))
        f.write(hdr)
        for a in arrays.values():
            f.write(np.ascontiguousarray(a).tobytes())


def load_blob(path) -> Dict[str, np.ndarray]:
    with open(path, 'rb') as f:
        buf = f.read()
    if buf[:4] != MAGIC:
        raise ValueError(f'{path} is not a PVSB blob')
    hlen = int.from_bytes(buf[4:12], 'little')
    meta = json.loads(buf[12:12 + hlen])
    off = 12 + hlen
    out = {}
    for name, dtype_str, shape in meta:
        dt = np.dtype(dtype_str)
        count = int(np.prod(shape)) if shape else 1
        a = np.frombuffer(buf, dtype=dt, count=count, offset=off)
        a = a.reshape(shape)
        off += a.nbytes
        out[name] = a
    return out
