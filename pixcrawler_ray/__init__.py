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
