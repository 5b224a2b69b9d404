"""ST5 — the AI keyword client, re-expressed against a LOCAL deterministic
language backend.

The reference wraps g4f in a network client (``builder/_keywords.py:91-220``)
that its production path DISABLES for latency ("180-300x" slower than
templates, ``backend/services/crawl_job.py:387-391``). This environment has
no network either, so what this module makes REAL is the part the reference
actually exercises in production: the CLIENT INFRASTRUCTURE — per-attempt
timeout, bounded retries with exponential backoff capped at 600 s
(``celery_core/base.py:315-426``: 3 retries, 60 s base, 2^attempt), and the
deterministic fallback to the predefined template generator on exhaustion.
Latency is accounted in VIRTUAL time (the politeness-stage convention), so
tests pin the exact attempt/backoff schedule instead of sleeping.

The backend is a seeded hash-chain "LM": it walks a fixed descriptor
vocabulary by chaining FNV hashes of (category, step), which makes the
generated keywords deterministic, category-dependent and distinct from the
template set — a stand-in with the same call shape a real model client has
(generate(category, count) -> phrases).

Flakiness model: attempt ``a`` for ``category`` fails iff
``fnv1a64(category|a) % fail_mod == 0`` (default 1 in 4) — deterministic,
so the retry path is replayable and the exhaustion path is constructible
in tests by choosing ``fail_mod=1``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from pixcrawler_ray.functions.hashing import hash64_array

# celery_core/base.py:315-426 parity
MAX_RETRIES = 3
BACKOFF_BASE_S = 60.0
BACKOFF_CAP_S = 600.0
# crawl_job.py:387-391: AI generation is "180-300x" the ~1 s template path
AI_LATENCY_BASE_S = 180.0
AI_LATENCY_SPREAD_S = 120.0

_VOCAB = (
    "studio", "macro", "aerial", "vintage", "portrait", "closeup",
    "outdoor", "night", "minimal", "candid", "profile", "action",
    "group", "wild", "urban", "natural", "detailed", "classic",
)


def _h(s: str) -> int:
    return int(hash64_array([s.encode("utf-8")])[0])


@dataclass
class LocalLMKeywordClient:
    """``KeywordGenerator`` (base.py) implementation with client semantics.

    ``stats`` records the virtual schedule: attempts, retries, backoff and
    generation seconds, and whether the fallback fired per category.
    """

    fail_mod: int = 4
    max_retries: int = MAX_RETRIES
    stats: dict = field(default_factory=lambda: {
        "attempts": 0, "retries": 0, "fallbacks": 0,
        "virtual_seconds": 0.0, "per_category": {}})

    name = "ai_local"

    def _attempt_fails(self, category: str, attempt: int) -> bool:
        return _h(f"{category}|{attempt}") % self.fail_mod == 0

    def _backend_generate(self, category: str, count: int) -> list[str]:
        state = _h(category)
        out, seen = [], set()
        step = 0
        while len(out) < count and step < 8 * count:
            state = _h(f"{category}|{state}|{step}")
            kw = f"{category} {_VOCAB[state % len(_VOCAB)]}"
            if kw not in seen:
                seen.add(kw)
                out.append(kw)
            step += 1
        return out

    def generate(self, category: str, count: int) -> list[str]:
        cat_stats = {"attempts": 0, "fallback": False,
                     "virtual_seconds": 0.0}
        for attempt in range(self.max_retries + 1):
            self.stats["attempts"] += 1
            cat_stats["attempts"] += 1
            # per-attempt generation latency (always paid — a timeout or
            # backend error surfaces after the wait, like a real client)
            lat = AI_LATENCY_BASE_S + (
                _h(f"lat|{category}|{attempt}") % int(AI_LATENCY_SPREAD_S))
            cat_stats["virtual_seconds"] += lat
            if not self._attempt_fails(category, attempt):
                self.stats["virtual_seconds"] += cat_stats["virtual_seconds"]
                self.stats["per_category"][category] = cat_stats
                return self._backend_generate(category, count)
            if attempt < self.max_retries:
                self.stats["retries"] += 1
                backoff = min(BACKOFF_BASE_S * (2 ** attempt),
                              BACKOFF_CAP_S)
                cat_stats["virtual_seconds"] += backoff
        # exhaustion -> deterministic fallback to the production path
        # (crawl_job.py:387-391: predefined templates)
        from pixcrawler_ray.functions.variations import generate_keywords

        self.stats["fallbacks"] += 1
        cat_stats["fallback"] = True
        self.stats["virtual_seconds"] += cat_stats["virtual_seconds"]
        self.stats["per_category"][category] = cat_stats
        return generate_keywords(category)[:count] or [category]
