"""TLSF offset allocator — Python wrapper over the native implementation
(native/tlsf.cpp; reference Utils/Allocator.h:626-1102).

Manages offsets into an externally-owned arena (the reference uses it for
64MB GPU heap pages; here it disciplines host staging arenas for asset
uploads). A pure-Python free-list fallback keeps the API available without
the native library."""

from __future__ import annotations

from ..native import load


class TlsfAllocator:
    def __init__(self, size: int, min_block: int = 256):
        self._lib = load()
        self.size = size
        self.min_block = min_block
        if self._lib is not None:
            self._h = self._lib.tlsf_create(size, min_block)
        else:
            self._h = None
            self._free = [(0, size)]  # sorted (offset, size) fallback
            self._allocs: dict[int, int] = {}
            self._used = 0

    def alloc(self, size: int, align: int = 1) -> int | None:
        """Returns an offset, or None when the arena can't satisfy it."""
        if self._h is not None:
            off = self._lib.tlsf_alloc(self._h, max(size, 1), align)
            return None if off < 0 else int(off)
        return self._alloc_py(max(size, 1), align)

    def free(self, offset: int) -> bool:
        if self._h is not None:
            return bool(self._lib.tlsf_free(self._h, offset))
        return self._free_py(offset)

    @property
    def used(self) -> int:
        if self._h is not None:
            return int(self._lib.tlsf_used(self._h))
        return self._used

    def __del__(self):
        if getattr(self, "_h", None) is not None and self._lib is not None:
            self._lib.tlsf_destroy(self._h)
            self._h = None

    # -- pure-python fallback (first-fit with merge) --------------------------
    def _alloc_py(self, size, align):
        size = (size + self.min_block - 1) // self.min_block * self.min_block
        for i, (off, sz) in enumerate(self._free):
            aligned = (off + align - 1) // align * align
            head = aligned - off
            if head + size <= sz:
                del self._free[i]
                if head:
                    self._free.insert(i, (off, head))
                tail = sz - head - size
                if tail:
                    self._free.append((aligned + size, tail))
                    self._free.sort()
                self._allocs[aligned] = size
                self._used += size
                return aligned
        return None

    def _free_py(self, offset):
        size = self._allocs.pop(offset, None)
        if size is None:
            return False
        self._used -= size
        self._free.append((offset, size))
        self._free.sort()
        merged = []
        for off, sz in self._free:
            if merged and merged[-1][0] + merged[-1][1] == off:
                merged[-1] = (merged[-1][0], merged[-1][1] + sz)
            else:
                merged.append((off, sz))
        self._free = merged
        return True
