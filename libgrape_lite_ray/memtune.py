"""Keep freed heap memory process-resident.

Virtualized hosts with virtio *free page reporting* (visible as "Free
page reporting enabled" in dmesg) hand every page the guest kernel
frees back to the hypervisor; re-faulting such a page later costs
~40us (~25 MB/s of fresh memory) instead of a normal minor fault.
Glibc's default malloc serves every large (>=128 KiB) allocation from
a fresh ``mmap`` and ``munmap``s it on free, so a NumPy-heavy
superstep loop (new temp arrays every round) runs an
allocate->report->cold-refault treadmill that measured 20-100x slower
than DRAM on this class of host.

``keep_heap_resident()`` turns the treadmill off for the calling
process: all allocations come from the sbrk heap (``M_MMAP_MAX=0``)
and the heap never shrinks (``M_TRIM_THRESHOLD=INT_MAX``), so freed
pages stay mapped, stay host-backed, and are reused at DRAM speed.
The cost is that process RSS stays at its high-water mark — the right
trade for long-lived fragment actors and batch workers whose peak
working set is bounded by design (CSR shards + per-round temps).

This is also the correct configuration on real multi-node clusters
with memory ballooning, and harmless elsewhere (steady-state RSS of a
superstep engine is its peak anyway).  Opt out with
``LGR_NO_MALLOC_TUNE=1``.
"""

from __future__ import annotations

import ctypes
import os

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3
_M_MMAP_MAX = -4

_done = False


def keep_heap_resident() -> bool:
    """Apply the malloc tuning to the current process (idempotent).

    Returns True if the tuning was applied (or already active)."""
    global _done
    if _done:
        return True
    if os.environ.get("LGR_NO_MALLOC_TUNE"):
        return False
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        ok = (libc.mallopt(_M_TRIM_THRESHOLD, ctypes.c_int(2**31 - 1))
              and libc.mallopt(_M_MMAP_THRESHOLD, ctypes.c_int(2**31 - 1))
              and libc.mallopt(_M_MMAP_MAX, ctypes.c_int(0)))
        _done = bool(ok)
        return _done
    except Exception:  # non-glibc platform: nothing to tune
        return False
