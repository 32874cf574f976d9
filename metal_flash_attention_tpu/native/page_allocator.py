"""ctypes binding for the native page allocator
(`src/page_allocator.cpp`), plus a pure-Python fallback with the same
interface so the paged serving path works without a C++ toolchain.
"""

from __future__ import annotations

import ctypes
import threading

from metal_flash_attention_tpu.native.build import build_native

MFA_TPU_OK = 0
MFA_TPU_ERR_NOT_FOUND = 2


class PagerError(RuntimeError):
    pass


class NativePageAllocator:
    """Thread-safe page allocator over a fixed pool.  Page 0 is the
    null page and never handed out."""

    def __init__(self, num_pages: int, page_size: int) -> None:
        self._lib = ctypes.CDLL(build_native())
        self._lib.mfa_tpu_last_error.restype = ctypes.c_char_p
        self._lib.mfa_tpu_pager_create.argtypes = [ctypes.c_uint32] * 2
        self._lib.mfa_tpu_pager_create.restype = ctypes.c_uint64
        self._lib.mfa_tpu_pager_destroy.argtypes = [ctypes.c_uint64]
        self._lib.mfa_tpu_pager_reserve.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32)]
        self._lib.mfa_tpu_pager_release.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64]
        self._lib.mfa_tpu_pager_pages.argtypes = [
            ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32)]
        self._lib.mfa_tpu_pager_free_count.argtypes = [ctypes.c_uint64]
        self._lib.mfa_tpu_pager_free_count.restype = ctypes.c_uint32
        self._lib.mfa_tpu_pager_retain_pages.argtypes = [
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint32]
        self._lib.mfa_tpu_pager_release_pages.argtypes = [
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint32]
        self._lib.mfa_tpu_pager_refcount.argtypes = [
            ctypes.c_uint64, ctypes.c_uint32]
        self._lib.mfa_tpu_pager_refcount.restype = ctypes.c_uint32
        self._id = self._lib.mfa_tpu_pager_create(num_pages, page_size)
        if self._id == 0:
            raise PagerError(self._err())
        self.num_pages = num_pages
        self.page_size = page_size

    def _err(self) -> str:
        return self._lib.mfa_tpu_last_error().decode(errors="replace")

    def reserve(self, seq: int, num_tokens: int) -> list[int]:
        """Grow `seq` to cover `num_tokens`; returns NEW page ids."""
        cap = (num_tokens // self.page_size) + 2
        out = (ctypes.c_uint32 * cap)()
        n = ctypes.c_uint32()
        rc = self._lib.mfa_tpu_pager_reserve(
            self._id, seq, num_tokens, out, cap, ctypes.byref(n))
        if rc != MFA_TPU_OK:
            raise PagerError(self._err())
        return list(out[:n.value])

    def release(self, seq: int) -> None:
        self._lib.mfa_tpu_pager_release(self._id, seq)

    def pages(self, seq: int) -> list[int]:
        out = (ctypes.c_uint32 * self.num_pages)()
        n = ctypes.c_uint32()
        rc = self._lib.mfa_tpu_pager_pages(
            self._id, seq, out, self.num_pages, ctypes.byref(n))
        if rc != MFA_TPU_OK:
            raise PagerError(self._err())
        return list(out[:n.value])

    def retain(self, pages) -> None:
        """Add one ref to each page (shared-prefix borrow / cache pin).
        Every page must be live; fails without side effects."""
        arr = (ctypes.c_uint32 * len(pages))(*pages)
        rc = self._lib.mfa_tpu_pager_retain_pages(
            self._id, arr, len(pages))
        if rc != MFA_TPU_OK:
            raise PagerError(self._err())

    def release_pages(self, pages) -> None:
        """Drop one ref from each page; frees pages that hit zero."""
        arr = (ctypes.c_uint32 * len(pages))(*pages)
        rc = self._lib.mfa_tpu_pager_release_pages(
            self._id, arr, len(pages))
        if rc != MFA_TPU_OK:
            raise PagerError(self._err())

    def refcount(self, page: int) -> int:
        return int(self._lib.mfa_tpu_pager_refcount(self._id, page))

    @property
    def free_pages(self) -> int:
        return int(self._lib.mfa_tpu_pager_free_count(self._id))

    def __del__(self):
        try:
            self._lib.mfa_tpu_pager_destroy(self._id)
        except Exception:
            pass


class PythonPageAllocator:
    """Fallback with identical semantics."""

    def __init__(self, num_pages: int, page_size: int) -> None:
        if num_pages < 2 or page_size <= 0:
            raise PagerError("pager needs >= 2 pages, positive size")
        self.num_pages = num_pages
        self.page_size = page_size
        self._free = list(range(1, num_pages))
        self._seqs: dict[int, list[int]] = {}
        self._rc = [0] * num_pages
        self._lock = threading.Lock()

    def reserve(self, seq: int, num_tokens: int) -> list[int]:
        need = -(-num_tokens // self.page_size)
        with self._lock:
            pages = self._seqs.setdefault(seq, [])
            grow = need - len(pages)
            if grow <= 0:
                return []
            if grow > len(self._free):
                raise PagerError(
                    f"pool exhausted: need {grow}, {len(self._free)} free")
            new = [self._free.pop() for _ in range(grow)]
            for pg in new:
                self._rc[pg] = 1
            pages.extend(new)
            return new

    def release(self, seq: int) -> None:
        with self._lock:
            for pg in self._seqs.pop(seq, []):
                self._rc[pg] -= 1
                if self._rc[pg] == 0:
                    self._free.append(pg)

    def retain(self, pages) -> None:
        with self._lock:
            for pg in pages:
                if not (1 <= pg < self.num_pages) or self._rc[pg] == 0:
                    raise PagerError(f"retain of free page {pg}")
            for pg in pages:
                self._rc[pg] += 1

    def release_pages(self, pages) -> None:
        with self._lock:
            for pg in pages:
                if not (1 <= pg < self.num_pages) or self._rc[pg] == 0:
                    raise PagerError(f"double free of page {pg}")
            for pg in pages:
                self._rc[pg] -= 1
                if self._rc[pg] == 0:
                    self._free.append(pg)

    def refcount(self, page: int) -> int:
        with self._lock:
            return self._rc[page] if 0 <= page < self.num_pages else 0

    def pages(self, seq: int) -> list[int]:
        with self._lock:
            return list(self._seqs.get(seq, []))

    @property
    def free_pages(self) -> int:
        with self._lock:
            return len(self._free)


def make_page_allocator(num_pages: int, page_size: int):
    """Native allocator when the toolchain allows, Python otherwise."""
    try:
        return NativePageAllocator(num_pages, page_size)
    except Exception:
        return PythonPageAllocator(num_pages, page_size)
