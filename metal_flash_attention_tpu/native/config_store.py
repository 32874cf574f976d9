"""ctypes binding for the native config store.

The Python face of `src/config_store.cpp` (reference analog:
`Documentation/CppReference/GEMM/GEMMShaderCache.hpp:28-44` plus the
hash pipeline of `ccv_nnc_mfa_hash.hpp`).  pybind11 is not in this
image, so the binding is plain ctypes over an extern-C API.
"""

from __future__ import annotations

import ctypes
from typing import Optional

from metal_flash_attention_tpu.native.build import build_native

MFA_TPU_OK = 0
MFA_TPU_ERR_PRECONDITION = 1
MFA_TPU_ERR_NOT_FOUND = 2
MFA_TPU_ERR_IO = 3


class NativeError(RuntimeError):
    pass


def _load() -> ctypes.CDLL:
    lib = ctypes.CDLL(build_native())
    lib.mfa_tpu_last_error.restype = ctypes.c_char_p
    lib.mfa_tpu_store_insert.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32]
    lib.mfa_tpu_store_insert.restype = ctypes.c_int
    lib.mfa_tpu_store_lookup.argtypes = [
        ctypes.c_char_p, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32)]
    lib.mfa_tpu_store_lookup.restype = ctypes.c_int
    lib.mfa_tpu_store_size.restype = ctypes.c_uint32
    lib.mfa_tpu_store_save.argtypes = [ctypes.c_char_p]
    lib.mfa_tpu_store_save.restype = ctypes.c_int
    lib.mfa_tpu_store_load.argtypes = [ctypes.c_char_p]
    lib.mfa_tpu_store_load.restype = ctypes.c_int
    lib.mfa_tpu_hash_bytes.argtypes = [ctypes.c_char_p, ctypes.c_uint32]
    lib.mfa_tpu_hash_bytes.restype = ctypes.c_uint64
    lib.mfa_tpu_combine64.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    lib.mfa_tpu_combine64.restype = ctypes.c_uint64
    return lib


class ConfigStore:
    """Process-wide native store (lock-free readers, insert-only)."""

    _instance: "ConfigStore | None" = None

    def __init__(self) -> None:
        self._lib = _load()

    @classmethod
    def get(cls) -> "ConfigStore":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def _err(self) -> str:
        return self._lib.mfa_tpu_last_error().decode(errors="replace")

    def insert(self, key: str, blocks: tuple[int, int]) -> None:
        kb = key.encode()
        rc = self._lib.mfa_tpu_store_insert(
            kb, len(kb), int(blocks[0]), int(blocks[1]))
        if rc != MFA_TPU_OK:
            raise NativeError(self._err())

    def lookup(self, key: str) -> Optional[tuple[int, int]]:
        kb = key.encode()
        bq = ctypes.c_uint32()
        bkv = ctypes.c_uint32()
        rc = self._lib.mfa_tpu_store_lookup(
            kb, len(kb), ctypes.byref(bq), ctypes.byref(bkv))
        if rc == MFA_TPU_ERR_NOT_FOUND:
            return None
        if rc != MFA_TPU_OK:
            raise NativeError(self._err())
        return (bq.value, bkv.value)

    def __len__(self) -> int:
        return int(self._lib.mfa_tpu_store_size())

    def save(self, path: str) -> None:
        rc = self._lib.mfa_tpu_store_save(path.encode())
        if rc != MFA_TPU_OK:
            raise NativeError(self._err())

    def load(self, path: str) -> None:
        rc = self._lib.mfa_tpu_store_load(path.encode())
        if rc != MFA_TPU_OK:
            raise NativeError(self._err())

    # hash self-test hooks
    def hash_bytes(self, data: bytes) -> int:
        return int(self._lib.mfa_tpu_hash_bytes(data, len(data)))

    def combine64(self, seed: int, v: int) -> int:
        return int(self._lib.mfa_tpu_combine64(seed, v))
