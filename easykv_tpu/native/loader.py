"""ctypes binding for the native mmap safetensors reader
(native/safetensors_mmap.cc).

Tensors are exposed as zero-copy numpy views into the file mapping — no JSON
parsing in Python, no per-tensor copies, and `jax.device_put` streams pages
straight from the OS page cache to HBM. Falls back to building the .so with
`make` (g++) on first use.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsafetensors_mmap.so"))

_DTYPES = {
    "F64": np.dtype(np.float64),
    "F32": np.dtype(np.float32),
    "F16": np.dtype(np.float16),
    "I64": np.dtype(np.int64),
    "I32": np.dtype(np.int32),
    "I16": np.dtype(np.int16),
    "I8": np.dtype(np.int8),
    "U8": np.dtype(np.uint8),
    "BOOL": np.dtype(np.bool_),
}


def _bf16_dtype():
    import ml_dtypes

    return np.dtype(ml_dtypes.bfloat16)


def _np_dtype(st_dtype: str) -> np.dtype:
    if st_dtype == "BF16":
        return _bf16_dtype()
    try:
        return _DTYPES[st_dtype]
    except KeyError:
        raise ValueError(f"unsupported safetensors dtype {st_dtype!r}") from None


class _MmapView(np.ndarray):
    """ndarray subclass whose instances pin the owning SafetensorsFile.

    Views derived from an _MmapView keep it alive through their `.base`
    chain, so the mmap cannot be unmapped while any view circulates.
    """

    _st_owner = None


_lib = None


def _load_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
    lib = ctypes.CDLL(_SO_PATH)
    lib.st_open.restype = ctypes.c_void_p
    lib.st_open.argtypes = [ctypes.c_char_p]
    lib.st_error.restype = ctypes.c_char_p
    lib.st_error.argtypes = [ctypes.c_void_p]
    lib.st_num_tensors.restype = ctypes.c_int64
    lib.st_num_tensors.argtypes = [ctypes.c_void_p]
    lib.st_tensor_name.restype = ctypes.c_char_p
    lib.st_tensor_name.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.st_tensor_info.restype = ctypes.c_int
    lib.st_tensor_info.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.st_tensor_data.restype = ctypes.c_void_p
    lib.st_tensor_data.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
    lib.st_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class SafetensorsFile:
    """Zero-copy reader for one .safetensors file."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._h = self._lib.st_open(path.encode())
        err = self._lib.st_error(self._h)
        if err:
            msg = err.decode()
            self.close()
            raise OSError(f"{path}: {msg}")

    def close(self):
        if getattr(self, "_h", None):
            self._lib.st_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def keys(self) -> Iterator[str]:
        n = self._lib.st_num_tensors(self._h)
        for i in range(n):
            yield self._lib.st_tensor_name(self._h, i).decode()

    def tensor(self, name: str) -> np.ndarray:
        """Zero-copy view into the mapping.

        The returned array (an ndarray subclass) holds a reference to this
        SafetensorsFile, so the mapping stays alive as long as the view —
        or any view derived from it — circulates. Calling close() while
        views are live still invalidates them; close() is for explicit
        early release only.
        """
        dtype_buf = ctypes.create_string_buffer(16)
        shape = (ctypes.c_int64 * 8)()
        nbytes = ctypes.c_int64()
        ndim = self._lib.st_tensor_info(self._h, name.encode(), dtype_buf,
                                        shape, ctypes.byref(nbytes))
        if ndim < 0:
            raise KeyError(name)
        ptr = self._lib.st_tensor_data(self._h, name.encode())
        dt = _np_dtype(dtype_buf.value.decode())
        shp = tuple(shape[i] for i in range(ndim))
        buf = (ctypes.c_char * nbytes.value).from_address(ptr)
        arr = np.frombuffer(buf, dtype=dt).reshape(shp).view(_MmapView)
        arr._st_owner = self
        arr.flags.writeable = False
        return arr

    def items(self) -> Iterator[Tuple[str, np.ndarray]]:
        for k in self.keys():
            yield k, self.tensor(k)


def load_safetensors_dir(path: str) -> Tuple[Dict[str, np.ndarray], list]:
    """Load all *.safetensors under `path` as zero-copy views.

    Returns (tensors, open_files); the caller must keep `open_files` alive
    while the views are in use (e.g. until device_put completes).
    """
    files = []
    tensors: Dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".safetensors"):
            continue
        f = SafetensorsFile(os.path.join(path, fname))
        files.append(f)
        for k in f.keys():
            tensors[k] = f.tensor(k)
    if not files:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    return tensors, files
