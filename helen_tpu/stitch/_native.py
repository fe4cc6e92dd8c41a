"""ctypes binding for the native stitch library (native/helen_stitch.cpp).

Replaces the reference's pybind11 HELEN module (helen/modules/src/
pybind_api.cpp) — pybind11 is not available in this toolchain, so the native
layer exposes a C ABI and this module loads it with ctypes. The shared object
is built on demand with g++ and cached beside the source; set
HELEN_TPU_NATIVE_DIR to relocate the build dir.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

def _find_src() -> str:
    """Locate the native source: env override, repo checkout, or the
    pip-installed data_files location (setup.py installs it under
    ``<sys.prefix>/helen_tpu_native/``)."""
    import sys

    candidates = []
    env = os.environ.get("HELEN_TPU_NATIVE_SRC")
    if env:
        candidates.append(env)
    candidates.append(os.path.abspath(os.path.join(
        os.path.dirname(__file__), "..", "..", "native", "helen_stitch.cpp")))
    candidates.append(os.path.join(sys.prefix, "helen_tpu_native",
                                   "helen_stitch.cpp"))
    for c in candidates:
        if os.path.exists(c):
            return c
    raise FileNotFoundError(
        "helen_stitch.cpp not found; looked in: " + ", ".join(candidates)
    )


_SRC = _find_src()

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class HelenAlignmentStruct(ctypes.Structure):
    _fields_ = [
        ("score", ctypes.c_int32),
        ("score2", ctypes.c_int32),
        ("ref_begin", ctypes.c_int32),
        ("ref_end", ctypes.c_int32),
        ("query_begin", ctypes.c_int32),
        ("query_end", ctypes.c_int32),
        ("ref_end2", ctypes.c_int32),
        ("cigar_len", ctypes.c_int32),
    ]


def _build_dir() -> str:
    d = os.environ.get("HELEN_TPU_NATIVE_DIR") or os.path.join(os.path.dirname(_SRC), "build")
    try:
        os.makedirs(d, exist_ok=True)
        probe = os.path.join(d, f".w{os.getpid()}")
        with open(probe, "w"):
            pass
        os.unlink(probe)
    except OSError:
        # system installs put the source beside a read-only prefix
        d = os.path.join(os.path.expanduser("~"), ".cache", "helen_tpu", "native")
        os.makedirs(d, exist_ok=True)
    return d


def _cpu_token() -> str:
    """Short id of this host's CPU. The library builds with -march=native,
    so a .so cached in a repo checkout shared across heterogeneous hosts
    (multi-host polish on a network filesystem) must be keyed per CPU —
    otherwise an AVX-512 build SIGILLs on an older neighbor."""
    import hashlib
    import platform

    ident = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags", "Features")):
                    ident.append(line.strip())
                    if len(ident) >= 3:
                        break
    except OSError:
        pass
    return hashlib.sha1("\n".join(ident).encode()).hexdigest()[:10]


def _so_path() -> str:
    return os.path.join(_build_dir(), f"libhelen_stitch-{_cpu_token()}.so")


def build_native(force: bool = False) -> str:
    """Compile the native library if missing or older than its source."""
    so = _so_path()
    if (
        not force
        and os.path.exists(so)
        and os.path.getmtime(so) >= os.path.getmtime(_SRC)
    ):
        return so
    tmp = so + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-std=c++17", "-march=native", "-shared", "-fPIC",
        _SRC, "-o", tmp,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"native stitch library failed to compile "
            f"(exit {proc.returncode}): {' '.join(cmd)}\n{proc.stderr}"
        )
    os.replace(tmp, so)
    return so


def get_lib() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(build_native())
            lib.helen_ssw_align.restype = ctypes.c_int
            lib.helen_ssw_align.argtypes = [
                ctypes.c_char_p, ctypes.c_int32,  # ref
                ctypes.c_char_p, ctypes.c_int32,  # query
                ctypes.c_int32, ctypes.c_int32,   # match, mismatch
                ctypes.c_int32, ctypes.c_int32,   # gap open, extend
                ctypes.c_int32,                   # mask_len
                ctypes.c_int32,                   # report_cigar
                ctypes.POINTER(HelenAlignmentStruct),
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32,
            ]
            lib.helen_rle_expand.restype = ctypes.c_int32
            lib.helen_rle_expand.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int32,
                ctypes.c_char_p, ctypes.c_int32,
            ]
            # test hook: 1 forces the scalar scan kernel, 0 the SIMD-eligible
            # path, -1 resets to the HELEN_SSW_SCALAR env default
            lib.helen_ssw_set_scalar.restype = None
            lib.helen_ssw_set_scalar.argtypes = [ctypes.c_int]
            lib.helen_banded_edit_distance.restype = ctypes.c_int64
            lib.helen_banded_edit_distance.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_int64,
            ]
            _lib = lib
    return _lib
