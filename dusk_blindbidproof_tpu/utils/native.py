"""ctypes binding to the native host core (native/strobe.cc).

The reference's transcript layer is native Rust (`merlin` over `keccak`,
/root/reference/Cargo.lock:399-407); this framework's equivalent is a small
C++ shared library driven from Python.  The library is built lazily with g++
if missing (a few hundred ms, cached next to the source); any failure falls
back to the pure-Python implementation in utils/keccak.py / utils/merlin.py,
which stays as the bit-exactness cross-check.

Set BLINDBID_NO_NATIVE=1 to force the pure-Python path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

log = logging.getLogger("blindbid.native")

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SRC = os.path.abspath(os.path.join(_NATIVE_DIR, "strobe.cc"))
_SO = os.path.abspath(os.path.join(_NATIVE_DIR, "libbbnative.so"))


class CStrobeState(ctypes.Structure):
    # must match `struct Strobe128` in native/strobe.cc
    _fields_ = [
        ("state", ctypes.c_uint8 * 200),
        ("pos", ctypes.c_uint8),
        ("pos_begin", ctypes.c_uint8),
        ("cur_flags", ctypes.c_uint8),
    ]


def _build() -> None:
    subprocess.run(
        ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO, _SRC],
        check=True,
        capture_output=True,
        timeout=120,
    )


def _load():
    if os.environ.get("BLINDBID_NO_NATIVE"):
        return None
    try:
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            _build()
        lib = ctypes.CDLL(_SO)
    except Exception as exc:  # noqa: BLE001 - any failure -> Python fallback
        log.warning("native transcript core unavailable (%s); using Python", exc)
        return None
    lib.bb_keccak_f1600.argtypes = [ctypes.c_char_p]
    lib.bb_strobe_init.argtypes = [
        ctypes.POINTER(CStrobeState), ctypes.c_char_p, ctypes.c_size_t,
    ]
    for name in ("bb_strobe_meta_ad", "bb_strobe_ad", "bb_strobe_key"):
        fn = getattr(lib, name)
        fn.argtypes = [
            ctypes.POINTER(CStrobeState), ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_int,
        ]
        fn.restype = ctypes.c_int
    lib.bb_strobe_prf.argtypes = [
        ctypes.POINTER(CStrobeState), ctypes.c_char_p, ctypes.c_size_t,
        ctypes.c_int,
    ]
    lib.bb_strobe_prf.restype = ctypes.c_int
    return lib


LIB = _load()


class NativeStrobe128:
    """Drop-in replacement for utils.merlin.Strobe128 backed by C++."""

    __slots__ = ("c",)

    def __init__(self, protocol_label: bytes):
        self.c = CStrobeState()
        LIB.bb_strobe_init(
            ctypes.byref(self.c), protocol_label, len(protocol_label)
        )

    def _check(self, rc: int) -> None:
        if rc == -1:
            raise ValueError("continued op with changed flags")
        if rc:
            raise ValueError("strobe op failed")

    def meta_ad(self, data: bytes, more: bool) -> None:
        self._check(LIB.bb_strobe_meta_ad(
            ctypes.byref(self.c), data, len(data), int(more)))

    def ad(self, data: bytes, more: bool) -> None:
        self._check(LIB.bb_strobe_ad(
            ctypes.byref(self.c), data, len(data), int(more)))

    def prf(self, n: int, more: bool) -> bytes:
        out = ctypes.create_string_buffer(n)
        self._check(LIB.bb_strobe_prf(
            ctypes.byref(self.c), out, n, int(more)))
        return out.raw

    def key(self, data: bytes, more: bool) -> None:
        self._check(LIB.bb_strobe_key(
            ctypes.byref(self.c), data, len(data), int(more)))

    def clone(self) -> "NativeStrobe128":
        s = NativeStrobe128.__new__(NativeStrobe128)
        s.c = CStrobeState()
        ctypes.memmove(
            ctypes.byref(s.c), ctypes.byref(self.c), ctypes.sizeof(CStrobeState)
        )
        return s


def native_available() -> bool:
    return LIB is not None
