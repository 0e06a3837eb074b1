"""Lazy builder for the native extensions (g++ -> .so, ctypes-loaded)."""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))


def build_lib(name: str, sources: list[str], extra_flags=()) -> str | None:
    """Compile (once) and return the .so path, or None if no toolchain."""
    so_path = os.path.join(_DIR, f"lib{name}.so")
    srcs = [os.path.join(_DIR, s) for s in sources]
    if os.path.exists(so_path) and all(
            os.path.getmtime(so_path) > os.path.getmtime(s) for s in srcs):
        return so_path
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", "-std=c++17",
           *extra_flags, *srcs, "-o", so_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return so_path
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import warnings
        warnings.warn(f"native build of {name} failed ({e}); using fallback")
        return None


def build_exe(name: str, sources: list[str], extra_flags=()) -> str | None:
    """Compile (once) a standalone native tool; returns its path or None.

    Strict mtime (exe STRICTLY newer than sources): a checkout sets equal
    mtimes, and a stale (possibly foreign-arch) artifact must lose that tie
    and be rebuilt."""
    exe_path = os.path.join(_DIR, name)
    srcs = [os.path.join(_DIR, s) for s in sources]
    if os.path.exists(exe_path) and all(
            os.path.getmtime(exe_path) > os.path.getmtime(s) for s in srcs):
        return exe_path
    cmd = ["g++", "-O2", "-std=c++17", *extra_flags, *srcs, "-o", exe_path]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return exe_path
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        import warnings
        warnings.warn(f"native build of {name} failed ({e})")
        return None
