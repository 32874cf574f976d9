"""Build driver for the native runtime library.

Compiles `src/*.cpp` into `libmfa_tpu.so` with g++ when the sources
are newer than the binary — the moral analog of the reference's
runtime Metal compilation with CLI fallback
(`Utilities/MTLLibraryCompiler.swift:55-164`): compile at first use,
cache the artifact, degrade gracefully when no toolchain exists.
"""

from __future__ import annotations

import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(_HERE, "src")
_LIB_NAME = "libmfa_tpu.so"
_BUILD_LOCK = threading.Lock()


def native_lib_path() -> str:
    return os.path.join(_HERE, _LIB_NAME)


def _sources() -> list[str]:
    return sorted(
        os.path.join(_SRC_DIR, f)
        for f in os.listdir(_SRC_DIR)
        if f.endswith(".cpp")
    )


def _needs_rebuild(lib: str, sources: list[str]) -> bool:
    if not os.path.exists(lib):
        return True
    lib_mtime = os.path.getmtime(lib)
    deps = sources + [
        os.path.join(_SRC_DIR, f)
        for f in os.listdir(_SRC_DIR)
        if f.endswith(".hpp")
    ]
    return any(os.path.getmtime(s) > lib_mtime for s in deps)


def build_native(force: bool = False) -> str:
    """Build (if stale) and return the shared library path.

    Raises RuntimeError when no C++ toolchain is available or the
    compile fails — callers treat that as "no native store".
    """
    lib = native_lib_path()
    sources = _sources()
    with _BUILD_LOCK:
        if not force and not _needs_rebuild(lib, sources):
            return lib
        cmd = [
            "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
            "-Wall", "-Wextra",
            "-o", lib + ".tmp", *sources,
        ]
        try:
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired) as e:
            raise RuntimeError(f"native build unavailable: {e}") from e
        if proc.returncode != 0:
            raise RuntimeError(
                f"native build failed:\n{proc.stderr}")
        os.replace(lib + ".tmp", lib)
    return lib
