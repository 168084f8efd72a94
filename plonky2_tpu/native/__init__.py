"""Native (C++) runtime components, loaded via ctypes.

The TPU owns the compute path (jax/XLA/pallas); the host-side runtime work
that the reference gets from rustc — keccak Merkle hashing for the
non-recursive KeccakGoldilocksConfig, where every tree level is hashed on
the CPU by design — is compiled from `keccak.cpp` at first import with the
baked-in g++.  Everything degrades gracefully: if no compiler/artifact is
available, callers fall back to the numpy twins in `hash/keccak.py` (which
also serve as the correctness cross-check, tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "keccak.cpp")
_LIB = os.path.join(_DIR, "libkeccak.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.keccak_f_batch.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.keccak256_rows.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                   ctypes.c_size_t, ctypes.c_void_p]
    lib.keccak_merkle_layer.argtypes = [ctypes.c_void_p, ctypes.c_size_t,
                                        ctypes.c_size_t, ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def keccak_f_batch(states: np.ndarray) -> np.ndarray:
    """In-place-semantics keccak-f[1600] over (..., 5, 5) u64 lane states.
    Returns a new array (same contract as hash.keccak.keccak_f)."""
    lib = _load()
    assert lib is not None
    flat = np.ascontiguousarray(states, dtype=np.uint64).reshape(-1, 25).copy()
    lib.keccak_f_batch(flat.ctypes.data, flat.shape[0])
    return flat.reshape(states.shape)


def keccak256_rows(rows: np.ndarray) -> np.ndarray:
    """keccak-256 of each row of an (n, L) uint8 matrix -> (n, 32) uint8."""
    lib = _load()
    assert lib is not None
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    n, length = rows.shape
    if length == 0:
        rows = np.zeros((n, 1), dtype=np.uint8)  # valid pointer, len stays 0
    out = np.empty((n, 32), dtype=np.uint8)
    lib.keccak256_rows(rows.ctypes.data, n, length, out.ctypes.data)
    return out


def keccak_merkle_layer(level: np.ndarray, size: int) -> np.ndarray:
    """One 2-to-1 Merkle layer over (2n, size) byte digests -> (n, size)."""
    lib = _load()
    assert lib is not None
    assert 0 < size <= 32, size  # C side concatenates pairs into 64 bytes
    level = np.ascontiguousarray(level, dtype=np.uint8)
    n = level.shape[0] // 2
    out = np.empty((n, size), dtype=np.uint8)
    lib.keccak_merkle_layer(level.ctypes.data, n, size, out.ctypes.data)
    return out
