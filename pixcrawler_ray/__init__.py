"""pixcrawler_ray — a Ray-Data-native URL-frontier + fetch-scheduler engine.

A from-scratch rebuild of the data-processing capabilities of
``alaamer12/PixCrawler`` (reference, read-only at ``/root/reference``) on top of
``ray.data.Dataset``: every stage is a ``map_batches`` transform over zero-copy
Arrow batches, stateful stages (URL-seen shards, politeness scheduler) are
actor pools, and wide steps (dedup, budget, rename) are ``groupby`` shuffles
keyed as documented in SURVEY.md §7.4.

The reference's architecture (Celery + FastAPI + filesystem,
``builder/_generator.py``, ``celery_core/``) is deliberately NOT reproduced;
only its observable semantics are: canonical crawl ordering
(``builder/_generator.py:1205-1280``), URL-seen / resume semantics
(``builder/progress.py:37-154``), budget caps (``builder/_engine.py:580-644``),
dedup keep-first (``validator/integrity.py:348-426``), and deterministic
per-url extraction (the per-row invariant from BASELINE.json).
"""

__version__ = "0.1.0"


def _tune_allocator() -> None:
    """Keep large numpy buffers on the heap instead of fresh mmaps.

    On this sandbox's hypervisor, first-touch page faults on newly mmapped
    regions run ~2 orders of magnitude slower than warm pages (measured:
    16M-element numpy ops take 14-25 s on first touch, ~50 ms warm). glibc
    malloc serves >128 KiB allocations via mmap by default, so every large
    batch allocation in every worker pays the fault storm repeatedly.
    Raising M_MMAP_THRESHOLD (and disabling trim) makes the allocator retain
    and reuse those pages. Runs at import time in every Ray worker that
    loads this package; harmless no-op elsewhere.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(ctypes.c_int(-3), ctypes.c_int(1 << 30))  # M_MMAP_THRESHOLD: big allocs on heap
        libc.mallopt(ctypes.c_int(-4), ctypes.c_int(1 << 30))  # M_TRIM_THRESHOLD: never trim back
        libc.mallopt(ctypes.c_int(-2), ctypes.c_int(1 << 24))  # M_TOP_PAD: grow heap in 16M steps
    except Exception:
        pass
    try:
        # Arrow buffers come from Arrow's own jemalloc pool, which purges
        # dirty pages back to the OS by default — same fault storm on the
        # next batch. Never decay; Arrow working sets here are bounded.
        import pyarrow as _pa

        _pa.jemalloc_set_decay_ms(-1)
    except Exception:
        pass


_tune_allocator()
