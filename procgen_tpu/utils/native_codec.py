"""ctypes bindings for the native state codec (native/statecodec.cpp).

Falls back to NumPy when the shared library is missing (e.g. a host without
the toolchain); `python -m procgen_tpu.utils.native_codec` rebuilds it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# dev checkout: built in-tree under native/; installed wheel: prebuilt
# copy shipped as package data (setup.py BuildPyWithNative)
_LIB_PATH = os.path.join(
    os.path.dirname(_PKG_DIR), "native", "libstatecodec.so"
)
_WHEEL_LIB_PATH = os.path.join(_PKG_DIR, "data", "libstatecodec.so")

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    path = _LIB_PATH
    if not os.path.exists(path):
        src_dir = os.path.dirname(path)
        if os.path.exists(os.path.join(src_dir, "Makefile")):
            try:
                subprocess.run(["make", "-C", src_dir], check=True,
                               capture_output=True)
            except Exception:
                pass
    if not os.path.exists(path) and os.path.exists(_WHEEL_LIB_PATH):
        path = _WHEEL_LIB_PATH  # installed wheel: prebuilt package data
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.blob_size.restype = ctypes.c_int64
    lib.blob_size.argtypes = [ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.pack_states.restype = None
    lib.unpack_states.restype = ctypes.c_int64
    lib.mt19937_to_text.restype = ctypes.c_int64
    lib.mt19937_from_text.restype = ctypes.c_int64
    lib.fnv1a_32.restype = ctypes.c_uint32
    lib.fnv1a_32.argtypes = [ctypes.c_char_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def pack_states(leaves: list[np.ndarray], num_envs: int) -> list[bytes]:
    """Per-env blobs from batched leaves (leading axis num_envs)."""
    lib = _load()
    flat = [np.ascontiguousarray(a).reshape(num_envs, -1) for a in leaves]
    sizes = np.array([a[0].nbytes for a in flat], np.int64)
    if lib is None:
        out = []
        for e in range(num_envs):
            parts = [b"PGTPU001"]
            for a in flat:
                raw = a[e].tobytes()
                parts.append(len(raw).to_bytes(4, "little"))
                parts.append(raw)
            parts.append((0xCAFECAFE).to_bytes(4, "little"))
            out.append(b"".join(parts))
        return out

    n = len(flat)
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in flat]
    )
    csizes = sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    bs = lib.blob_size(csizes, n)
    buf = np.empty(num_envs * bs, np.uint8)
    lib.pack_states(
        ptrs, csizes, n, num_envs,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    raw = buf.tobytes()
    return [raw[e * bs : (e + 1) * bs] for e in range(num_envs)]


def unpack_states(blobs: list[bytes], leaves: list[np.ndarray], num_envs: int):
    """In-place fill of batched leaves from per-env blobs."""
    lib = _load()
    flat = [a.reshape(num_envs, -1) for a in leaves]
    sizes = np.array([a[0].nbytes for a in flat], np.int64)
    if lib is None:
        for e, blob in enumerate(blobs):
            assert blob[:8] == b"PGTPU001", "bad state blob"
            off = 8
            for a in flat:
                (n,) = np.frombuffer(blob, np.uint32, 1, off)
                off += 4
                a[e] = np.frombuffer(
                    blob, a.dtype, a[0].size, off
                ).reshape(a[0].shape)
                off += int(n)
            (marker,) = np.frombuffer(blob, np.uint32, 1, off)
            assert marker == 0xCAFECAFE, "truncated state blob"
        return

    joined = np.frombuffer(b"".join(blobs), np.uint8)
    n = len(flat)
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for a in flat]
    )
    csizes = sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    rc = lib.unpack_states(
        joined.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        csizes, n, num_envs, ptrs,
    )
    if rc != 0:
        raise ValueError(f"malformed state blob for env {rc - 1}")


def mt19937_to_text(mt: np.ndarray, pos: int) -> str:
    """libstdc++ `ostream << engine` format (randgen.cpp:100-114)."""
    lib = _load()
    if lib is None:
        return " ".join(str(int(x)) for x in mt) + f" {pos}"
    buf = ctypes.create_string_buffer(624 * 11 + 16)
    mt = np.ascontiguousarray(mt, np.uint32)
    k = lib.mt19937_to_text(
        mt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_int64(pos), buf, ctypes.c_int64(len(buf)),
    )
    assert k > 0
    return buf.raw[:k].decode()


def mt19937_from_text(text: str) -> tuple[np.ndarray, int]:
    lib = _load()
    if lib is None:
        parts = text.split()
        return np.array(parts[:624], np.uint32), int(parts[624])
    mt = np.empty(624, np.uint32)
    pos = ctypes.c_int64()
    rc = lib.mt19937_from_text(
        text.encode(),
        mt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.byref(pos),
    )
    if rc != 0:
        raise ValueError("bad mt19937 text")
    return mt, int(pos.value)


if __name__ == "__main__":
    subprocess.run(["make", "-C", os.path.dirname(_LIB_PATH)], check=True)
    print("built", _LIB_PATH, "available:", available())
