"""Named transient render-target registry.

Analog of RTRegistry (gfx/rt_registry.hpp:44-183): a host-side pool of named
device arrays with ensure_transient_* helpers that (re)allocate on size or
kind change and count rebuilds (the reference's Phase-G soak asserts bounded
rebuild counts — same counter here).
"""

from __future__ import annotations

import jax.numpy as jnp

_KINDS = {
    "color_ldr": (jnp.uint8, 3, 0),
    "color_hdr": (jnp.float32, 3, 0.0),
    "color_hdr4": (jnp.float32, 4, 0.0),
    "depth": (jnp.float32, 0, 1.0),
    "motion": (jnp.float32, 2, 0.0),
    "shadow": (jnp.float32, 0, 1.0),
    "tid": (jnp.int32, 0, -1),
}


class RTRegistry:
    def __init__(self, width: int = 0, height: int = 0):
        self._extent = (height, width)
        self._targets: dict = {}
        self._meta: dict = {}
        self.rebuild_count = 0

    def extent(self):
        return self._extent

    def resize(self, height: int, width: int) -> None:
        if (height, width) != self._extent:
            self._extent = (height, width)
            self._targets.clear()
            self._meta.clear()
            self.rebuild_count += 1

    def ensure_transient(self, name: str, kind: str,
                         height: int | None = None,
                         width: int | None = None):
        """Get-or-create a named target; reallocates (and counts a rebuild)
        when the size or kind changed (rt_registry.hpp:98-180)."""
        if kind not in _KINDS:
            raise KeyError(f"unknown RT kind '{kind}'")
        h = self._extent[0] if height is None else height
        w = self._extent[1] if width is None else width
        dtype, channels, clear = _KINDS[kind]
        shape = (h, w) if channels == 0 else (h, w, channels)
        meta = (kind, shape)
        if self._meta.get(name) != meta:
            if name in self._meta:
                self.rebuild_count += 1
            self._targets[name] = jnp.full(shape, clear, dtype)
            self._meta[name] = meta
        return self._targets[name]

    def set(self, name: str, value) -> None:
        """Store a produced frame value under a name (functional update)."""
        self._targets[name] = value
        self._meta.setdefault(name, ("external", value.shape))

    def get(self, name: str):
        return self._targets.get(name)

    def valid(self, name: str) -> bool:
        return name in self._targets

    def names(self):
        return tuple(self._targets)
