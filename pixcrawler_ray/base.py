"""User-extension surface (SURVEY §2.9) — the rebuild's plug-in points.

Reference surfaces and their equivalents here:

- ``IDownloader`` ABC (``builder/_base.py:5-32``) -> :class:`FetcherProtocol`
  (swap the corpus-join fetcher for a real HTTP fetcher).
- ``ISearchEngineDownloader`` marker (``builder/_base.py:34-35``) ->
  :class:`ExpansionStrategy` (per-engine frontier expansion).
- ``KeywordGenerator`` Protocol (``builder/_base.py:38-101``) ->
  :class:`KeywordGenerator` (predefined strategy ships; AI strategies plug
  in; the reference disables AI in its own production path,
  ``backend/services/crawl_job.py:388-391``).
- Validation strategy ABC + FAST/MEDIUM/SLOW levels
  (``validator/level.py:186-267``) -> :data:`VALIDATION_LEVELS` registry of
  batch predicates.
- ``WorkflowStep`` / ``WorkflowDefinition``
  (``backend/services/job_orchestrator.py:30-104``) -> a pipeline is a plain
  list of Dataset transforms; Ray's streaming executor replaces the
  orchestrator (retries, dependencies, backpressure are built in).
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import pyarrow as pa


@runtime_checkable
class FetcherProtocol(Protocol):
    """A fetch stage: frontier Arrow batch -> fetched Arrow batch.

    Must append ``status:int32, warc_ts:timestamp[us], html:binary`` and be a
    callable class (actor pool) so connections / indexes are built once per
    actor (``__init__``) and reused per batch (``__call__``).
    """

    def __call__(self, batch: pa.Table) -> pa.Table: ...


@runtime_checkable
class ExpansionStrategy(Protocol):
    """Engine plug-in: work-unit batch -> candidate-frontier batch."""

    def __call__(self, units: pa.Table, n_docs: int) -> pa.Table: ...


@runtime_checkable
class KeywordGenerator(Protocol):
    """Keyword-expansion plug-in (builder/_base.py:38-101 shape)."""

    def generate(self, category: str, count: int) -> list[str]: ...

    @property
    def name(self) -> str: ...


class PredefinedKeywordGenerator:
    """Template-based generation — the reference's production path
    (~1 s vs 3+ min for AI; ``backend/services/crawl_job.py:387-391``)."""

    name = "predefined"

    def generate(self, category: str, count: int) -> list[str]:
        from pixcrawler_ray.functions.variations import select_variations
        return select_variations("keyword_gen", category, category,
                                 max_images=count * 5)[:count]


def _valid_fast(t: pa.Table) -> pa.Table:
    """FAST: structural validity only (html parsed)."""
    return t.filter(t.column("valid"))


def _valid_medium(t: pa.Table) -> pa.Table:
    """MEDIUM: FAST + non-empty text."""
    import pyarrow.compute as pc
    mask = pc.and_(t.column("valid"),
                   pc.greater(pc.utf8_length(t.column("text")), 0))
    return t.filter(mask)


def _valid_slow(t: pa.Table) -> pa.Table:
    """SLOW: MEDIUM + content hash recomputation check."""
    import hashlib

    import pyarrow.compute as pc
    mask = pc.and_(t.column("valid"),
                   pc.greater(pc.utf8_length(t.column("text")), 0))
    t = t.filter(mask)
    ok = [hashlib.md5((x or "").encode()).digest() == bytes(m)
          for x, m in zip(t.column("text").to_pylist(),
                          t.column("content_md5").to_pylist())]
    return t.filter(pa.array(ok))


VALIDATION_LEVELS: dict[str, Callable[[pa.Table], pa.Table]] = {
    "fast": _valid_fast,
    "medium": _valid_medium,
    "slow": _valid_slow,
}


def validate(extracted_ds, level: str = "fast"):
    """Apply a validation level as a map_batches stage (validator/level.py)."""
    fn = VALIDATION_LEVELS[level]
    return extracted_ds.map_batches(fn, batch_format="pyarrow")
