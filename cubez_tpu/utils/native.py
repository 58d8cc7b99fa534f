"""ctypes bindings for the czx native runtime (native/czx_native.cpp).

The library is built on demand with ``make`` (g++) the first time it is
needed; every entry point has a pure-Python fallback so the framework works
without a toolchain.  The native layer mirrors the components the reference
keeps in C++ (CBrick division search, host TDMA/PCR oracles, SPH dump,
history writer — see czx_native.cpp header for the file:line parity map).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libczx.so"))
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-s"],
                    cwd=os.path.abspath(_NATIVE_DIR),
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None

        i64 = ctypes.c_int64
        i32 = ctypes.c_int32
        f32 = ctypes.c_float
        pd = ctypes.POINTER(ctypes.c_double)
        pf = ctypes.POINTER(ctypes.c_float)
        p64 = ctypes.POINTER(i64)

        lib.czx_auto_division.argtypes = [i64, p64, p64]
        lib.czx_auto_division.restype = ctypes.c_int
        lib.czx_tdma.argtypes = [i64, pd, pd, pd, pd]
        lib.czx_tdma_batch.argtypes = [i64, i64, pd, pd, pd, pd]
        lib.czx_pcr.argtypes = [i64, pd, pd, pd]
        lib.czx_write_sph.argtypes = [
            ctypes.c_char_p, i32, i32, i32, f32, f32, f32, f32, f32, f32,
            i32, f32, pf,
        ]
        lib.czx_write_sph.restype = ctypes.c_int
        lib.czx_write_history.argtypes = [ctypes.c_char_p, pd, i64]
        lib.czx_write_history.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_f64(a):
    return np.ascontiguousarray(a, dtype=np.float64)


def auto_division(nproc: int, gsize) -> tuple[int, int, int] | None:
    """Native CBrick-style division search; None if the library is missing
    (caller falls back to parallel.decomp.auto_division)."""
    lib = _load()
    if lib is None:
        return None
    g = np.asarray(gsize, dtype=np.int64)
    out = np.zeros(3, dtype=np.int64)
    rc = lib.czx_auto_division(
        nproc,
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise ValueError(f"cannot divide {tuple(gsize)} over {nproc} blocks")
    return tuple(int(v) for v in out)


def tdma(a, b, c, d) -> np.ndarray:
    """Host Thomas solve (oracle); falls back to NumPy."""
    lib = _load()
    a, b, c, d = map(_as_f64, (a, b, c, d))
    n = d.shape[-1]
    if lib is not None and d.ndim == 1:
        x = d.copy()
        pd_ = ctypes.POINTER(ctypes.c_double)
        lib.czx_tdma(
            n,
            x.ctypes.data_as(pd_),
            a.ctypes.data_as(pd_),
            b.ctypes.data_as(pd_),
            c.ctypes.data_as(pd_),
        )
        return x
    if lib is not None and d.ndim == 2:
        x = d.copy()
        pd_ = ctypes.POINTER(ctypes.c_double)
        lib.czx_tdma_batch(
            d.shape[0], n,
            x.ctypes.data_as(pd_),
            np.ascontiguousarray(np.broadcast_to(a, d.shape)).ctypes.data_as(pd_),
            np.ascontiguousarray(np.broadcast_to(b, d.shape)).ctypes.data_as(pd_),
            np.ascontiguousarray(np.broadcast_to(c, d.shape)).ctypes.data_as(pd_),
        )
        return x
    return _tdma_py(a, b, c, d)


def _tdma_py(a, b, c, d):
    n = d.shape[-1]
    cp = np.zeros_like(d)
    dp = np.zeros_like(d)
    cp[..., 0] = c[..., 0] / b[..., 0]
    dp[..., 0] = d[..., 0] / b[..., 0]
    for i in range(1, n):
        den = b[..., i] - a[..., i] * cp[..., i - 1]
        cp[..., i] = c[..., i] / den
        dp[..., i] = (d[..., i] - a[..., i] * dp[..., i - 1]) / den
    x = np.zeros_like(d)
    x[..., -1] = dp[..., -1]
    for i in range(n - 2, -1, -1):
        x[..., i] = dp[..., i] - cp[..., i] * x[..., i + 1]
    return x


def pcr(a, c, d) -> np.ndarray:
    """Host PCR on one unit-diagonal line (oracle for the stage math)."""
    lib = _load()
    a, c, d = map(_as_f64, (a, c, d))
    if lib is not None:
        x = d.copy()
        pd_ = ctypes.POINTER(ctypes.c_double)
        lib.czx_pcr(
            d.shape[0],
            x.ctypes.data_as(pd_),
            a.ctypes.data_as(pd_),
            c.ctypes.data_as(pd_),
        )
        return x
    b = np.ones_like(d)
    return _tdma_py(a, b, c, d)


def write_sph(path, field_kij, org=(0.0, 0.0, 0.0), pitch=(1.0, 1.0, 1.0),
              step=0, time=0.0) -> None:
    """SPH scalar dump (fileout_t, cz_utility.f90:17-47).  ``field_kij`` is
    (K, I, J); SPH wants (i fastest, then j, then k), i.e. transpose to
    (J, I, K) memory order then write i-fastest == our (K, J, I) reversed."""
    path = str(path)
    f = np.asarray(field_kij, dtype=np.float32)
    nk, ni, nj = f.shape
    # data[i + imax*(j + jmax*k)] with (imax, jmax, kmax) = (ni, nj, nk)
    data = np.ascontiguousarray(f.transpose(0, 2, 1).reshape(-1))  # k, j, i order
    lib = _load()
    if lib is not None:
        rc = lib.czx_write_sph(
            path.encode(), ni, nj, nk,
            float(org[0]), float(org[1]), float(org[2]),
            float(pitch[0]), float(pitch[1]), float(pitch[2]),
            int(step), float(time),
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise IOError(f"czx_write_sph failed for {path}")
        return
    _write_sph_py(path, ni, nj, nk, org, pitch, step, time, data)


def _write_sph_py(path, ni, nj, nk, org, pitch, step, time, data):
    import struct

    def rec(f, payload: bytes):
        f.write(struct.pack("<i", len(payload)))
        f.write(payload)
        f.write(struct.pack("<i", len(payload)))

    with open(path, "wb") as f:
        rec(f, struct.pack("<ii", 1, 1))
        rec(f, struct.pack("<iii", ni, nj, nk))
        rec(f, struct.pack("<fff", *[float(v) for v in org]))
        rec(f, struct.pack("<fff", *[float(v) for v in pitch]))
        rec(f, struct.pack("<if", int(step), float(time)))
        rec(f, data.astype("<f4").tobytes())


def read_sph(path):
    """Read back a scalar SPH file -> (field_kij, org, pitch, step, time)."""
    import struct

    with open(path, "rb") as f:
        def rec():
            (n,) = struct.unpack("<i", f.read(4))
            payload = f.read(n)
            f.read(4)
            return payload

        sv, dt = struct.unpack("<ii", rec())
        ni, nj, nk = struct.unpack("<iii", rec())
        org = struct.unpack("<fff", rec())
        pitch = struct.unpack("<fff", rec())
        step, time = struct.unpack("<if", rec())
        data = np.frombuffer(rec(), dtype="<f4").reshape(nk, nj, ni)
    return data.transpose(0, 2, 1), org, pitch, step, time


def write_history(path, residuals) -> None:
    """Residual history file in the reference's exact format."""
    path = str(path)
    res = _as_f64(residuals)
    lib = _load()
    if lib is not None:
        rc = lib.czx_write_history(
            path.encode(),
            res.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            res.shape[0],
        )
        if rc == 0:
            return
    with open(path, "w") as f:
        f.write("Itration      Residual\n")
        for i, r in enumerate(res, start=1):
            f.write("%6d, %13.6e\n" % (i, r))
