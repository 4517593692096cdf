"""ctypes binding for the native host runtime (native/hostmath.cpp).

The reference's field/curve layer and transcript hashing are native Rust
(halo2curves Cargo.lock:1359, poseidon-rs Cargo.lock:2068 [dep]); this module
is the TPU build's equivalent native layer for host-side work between device
kernel launches: Montgomery field batches, G1 ops (SRS generation), the
Poseidon permutation and Keccak-256.

Everything degrades gracefully: if the shared library is missing it is built
on first import (g++ is in the image); if that fails, ``AVAILABLE`` is False
and callers fall back to the pure-Python paths (which remain the golden
reference implementations — tests compare the two).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "hostmath.cpp")
_SO = os.path.join(_HERE, "..", "native", "libhostmath.so")

AVAILABLE = False
_lib = None


def _scalar_bytes(x: int) -> bytes:
    return int(x).to_bytes(32, "little")


def _scalars_blob(xs) -> bytes:
    return b"".join(int(x).to_bytes(32, "little") for x in xs)


def _load():
    global _lib, AVAILABLE
    if _lib is not None:
        return
    try:
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
                 "-o", _SO], check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
    except Exception:
        AVAILABLE = False
        return
    lib.hm_init.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.hm_f_mul_batch.argtypes = [ctypes.c_int, ctypes.c_char_p,
                                   ctypes.c_char_p, ctypes.c_char_p,
                                   ctypes.c_long]
    lib.hm_f_inv_batch.argtypes = [ctypes.c_int, ctypes.c_char_p,
                                   ctypes.c_char_p, ctypes.c_long]
    lib.hm_f_powers.argtypes = [ctypes.c_int, ctypes.c_char_p,
                                ctypes.c_char_p, ctypes.c_long]
    lib.hm_g1_msm.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                              ctypes.c_char_p, ctypes.c_long]
    lib.hm_g1_srs.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                              ctypes.c_char_p, ctypes.c_long]
    lib.hm_g1_fixed_base_many.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                          ctypes.c_char_p, ctypes.c_long]
    lib.hm_g1_sum.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                              ctypes.c_long]
    lib.hm_poseidon_setup.argtypes = [ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, ctypes.c_char_p,
                                      ctypes.c_char_p]
    lib.hm_poseidon_permute.argtypes = [ctypes.c_char_p]
    lib.hm_keccak256.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                 ctypes.c_char_p]
    from .utils import refcrypto as rc
    lib.hm_init(_scalar_bytes(rc.FQ), _scalar_bytes(rc.FR))
    _lib = lib
    AVAILABLE = True


_load()

FQ_ID, FR_ID = 0, 1


def f_mul_batch(which: int, a, b) -> list:
    n = len(a)
    out = ctypes.create_string_buffer(32 * n)
    _lib.hm_f_mul_batch(which, _scalars_blob(a), _scalars_blob(b), out, n)
    raw = out.raw
    return [int.from_bytes(raw[32 * i:32 * i + 32], "little")
            for i in range(n)]


def f_inv_batch(which: int, a) -> list:
    n = len(a)
    out = ctypes.create_string_buffer(32 * n)
    _lib.hm_f_inv_batch(which, _scalars_blob(a), out, n)
    raw = out.raw
    return [int.from_bytes(raw[32 * i:32 * i + 32], "little")
            for i in range(n)]


def f_powers(which: int, base: int, n: int) -> list:
    out = ctypes.create_string_buffer(32 * n)
    _lib.hm_f_powers(which, _scalar_bytes(base), out, n)
    raw = out.raw
    return [int.from_bytes(raw[32 * i:32 * i + 32], "little")
            for i in range(n)]


def _points_blob(points) -> bytes:
    """[(x, y)] affine ints -> packed 64-byte LE records."""
    return b"".join(int(x).to_bytes(32, "little") +
                    int(y).to_bytes(32, "little") for x, y in points)


def _points_from_raw(raw: bytes, n: int) -> list:
    return [(int.from_bytes(raw[64 * i:64 * i + 32], "little"),
             int.from_bytes(raw[64 * i + 32:64 * i + 64], "little"))
            for i in range(n)]


def g1_msm(points, scalars) -> tuple:
    """Affine [(x, y)] x [int] -> affine (x, y); (0,0) = identity."""
    n = len(points)
    out = ctypes.create_string_buffer(64)
    _lib.hm_g1_msm(_points_blob(points), _scalars_blob(scalars), out, n)
    return _points_from_raw(out.raw, 1)[0]


def g1_srs(g_affine, tau: int, n: int) -> list:
    """[G, tau G, tau^2 G, ...] — 8-bit windowed fixed-base (SRS gen)."""
    out = ctypes.create_string_buffer(64 * n)
    _lib.hm_g1_srs(_points_blob([g_affine]), _scalar_bytes(tau), out, n)
    return _points_from_raw(out.raw, n)


def g1_fixed_base_many(g_affine, scalars) -> list:
    """[s_i * G] for one fixed base — 8-bit windowed table, one pass."""
    n = len(scalars)
    out = ctypes.create_string_buffer(64 * n)
    _lib.hm_g1_fixed_base_many(_points_blob([g_affine]),
                               _scalars_blob(scalars), out, n)
    return _points_from_raw(out.raw, n)


def g1_sum(points) -> tuple:
    n = len(points)
    out = ctypes.create_string_buffer(64)
    _lib.hm_g1_sum(_points_blob(points), out, n)
    return _points_from_raw(out.raw, 1)[0]


_poseidon_ready = False


def poseidon_setup_default() -> None:
    """Install the transcript's Grain-derived constants (Python is the
    single source of truth for their derivation)."""
    global _poseidon_ready
    if _poseidon_ready:
        return
    from .transcript.poseidon import R_F, R_P, T, poseidon_constants
    rcs, mds = poseidon_constants()
    rc_blob = _scalars_blob([v for row in rcs for v in row])
    mds_blob = _scalars_blob([v for row in mds for v in row])
    _lib.hm_poseidon_setup(T, R_F, R_P, rc_blob, mds_blob)
    _poseidon_ready = True


def poseidon_permute(state: list) -> list:
    poseidon_setup_default()
    buf = ctypes.create_string_buffer(_scalars_blob(state), 32 * len(state))
    _lib.hm_poseidon_permute(buf)
    raw = buf.raw
    return [int.from_bytes(raw[32 * i:32 * i + 32], "little")
            for i in range(len(state))]


def keccak256(data: bytes) -> bytes:
    out = ctypes.create_string_buffer(32)
    _lib.hm_keccak256(data, len(data), out)
    return out.raw
