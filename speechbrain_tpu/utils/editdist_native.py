"""ctypes loader for the native edit-distance core (_editdist.cpp).

Same compile-on-first-use pattern as io/native.py: g++ builds the
shared object next to the source (with a lock + atomic rename), calls
release the GIL, and the batch is sharded across hardware threads.
``native_available()`` is False when no compiler is present; the pure
Python DP in utils/edit_distance.py is the fallback.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "_editdist.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_editdist.so")


def _build():
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        "-o", _SO + ".tmp", _SRC,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_SO + ".tmp", _SO)


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.sb_edit_ops_batch.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
            ]
            lib.sb_edit_ops_batch.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available():
    """True when the compiled edit-distance core is usable."""
    return _load() is not None


def _flatten(seqs, token_to_id):
    flat, offsets = [], [0]
    for seq in seqs:
        flat.extend(token_to_id[t] for t in seq)
        offsets.append(len(flat))
    return (
        np.asarray(flat, np.int32),
        np.asarray(offsets, np.int64),
    )


def edit_ops_batch(refs, hyps):
    """(ins, del, sub) per pair via the native core, or None when
    unavailable. Tokens may be any hashable values (interned to ids)."""
    lib = _load()
    if lib is None:
        return None
    token_to_id = {}
    for seq in refs:
        for t in seq:
            token_to_id.setdefault(t, len(token_to_id))
    for seq in hyps:
        for t in seq:
            token_to_id.setdefault(t, len(token_to_id))
    a, a_off = _flatten(refs, token_to_id)
    b, b_off = _flatten(hyps, token_to_id)
    n = len(refs)
    out = np.zeros((n, 3), np.int32)
    lib.sb_edit_ops_batch(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        a_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
