"""Build-on-demand for the native runtime pieces (native/*.cpp).

Prebuilt .so binaries are NOT committed (they are arch-specific and not
reviewable); the first import that needs one invokes `make -C native
<lib>.so` and falls back to the pure-Python implementations if the
toolchain is unavailable.
"""

from __future__ import annotations

import os
import subprocess

_NATIVE_DIR = os.path.abspath(os.path.join(
    os.path.dirname(__file__), "..", "..", "native"))


def ensure_native_built(so_name: str) -> str | None:
    """Return the absolute path of native/<so_name>, building it if needed.

    Returns None if the library can't be produced (no toolchain / no
    sources) — callers fall back to their Python paths.
    """
    path = os.path.join(_NATIVE_DIR, so_name)
    if os.path.exists(path):
        return path
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR, so_name],
            capture_output=True, timeout=120, check=False,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    return path if os.path.exists(path) else None
