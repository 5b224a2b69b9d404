"""Keyword variation templates + deterministic selection (M1/M2, D3).

The reference ships 433 hand-written templates in 18 families
(``builder/_predefined_variations.py:4-571``, set-union deduped at 545-571)
and selects ``min(len(v), max(3, max_num // 5))`` of them after a
``random.shuffle`` (``builder/_engine.py:64-80``). This rebuild does NOT copy
the template text; it generates its own family grid programmatically and
replaces the shuffle with a seeded permutation keyed by
``(dataset, category, keyword)`` so ordering is reproducible under any
parallelism (SURVEY §7.5 item 1).
"""

from __future__ import annotations

import numpy as np

from pixcrawler_ray.functions.hashing import hash64

_PREFIXES = ["", "high quality ", "professional ", "beautiful ", "real ", "hd "]
_SUFFIXES = ["", " photo", " image", " picture", " photography", " closeup",
             " wallpaper", " portrait"]

# family grid -> 6*8 = 48 distinct templates; "{kw}" (identity) sorts first.
TEMPLATES: list[str] = sorted(
    {f"{p}{{kw}}{s}" for p in _PREFIXES for s in _SUFFIXES},
    key=lambda t: (t != "{kw}", t),
)


def num_variations(max_images: int, available: int | None = None) -> int:
    """``min(len(templates), max(3, max_images // 5))`` — _engine.py:64-80."""
    n = max(3, max_images // 5)
    return min(available if available is not None else len(TEMPLATES), n)


def select_variations(dataset: str, category: str, keyword: str,
                      max_images: int) -> list[str]:
    """Seeded deterministic permutation, then head-N (replaces random.shuffle).

    Seed = stable hash of (dataset, category, keyword) so the same config
    always yields the same variation order on any worker.
    """
    seed = hash64(f"{dataset}\x00{category}\x00{keyword}") & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(TEMPLATES))
    n = num_variations(max_images)
    return [TEMPLATES[i].format(kw=keyword) for i in order[:n]]


# M6 — deterministic keyword generator. The reference calls a g4f chat model
# (builder/_keywords.py:93-138) and then cleans/dedupes the reply, always
# inserting the category first (builder/_keywords.py:200-224). A remote AI
# model is out of scope here (ST5, no network), so generation is a fixed
# template grid over the category name — same downstream contract: a cleaned,
# order-stable list with the category itself first.
GENERATED_KEYWORD_TEMPLATES: list[str] = [
    "{cat}",
    "{cat} photo",
    "{cat} image",
    "high quality {cat}",
    "{cat} close up",
    "{cat} wallpaper",
    "{cat} illustration",
    "professional {cat} photography",
    "{cat} detailed",
    "{cat} examples",
]


def generate_keywords(category: str) -> list[str]:
    """M6 — deterministic stand-in for the reference's AI keyword generation.

    Mirrors ``_clean_and_deduplicate_keywords`` (builder/_keywords.py:200-224):
    strip, drop empties, order-preserving dedup, category first.
    """
    out: list[str] = []
    seen: set[str] = set()
    for t in GENERATED_KEYWORD_TEMPLATES:
        kw = t.format(cat=category).strip()
        if kw and kw not in seen:
            seen.add(kw)
            out.append(kw)
    return out


def validate_keyword(kw: str) -> bool:
    """M4 — mirror of ``validate_keywords`` (builder/_keywords.py:223-256)."""
    kw = kw.strip()
    if len(kw) < 2 or len(kw) > 100:
        return False
    return not any(c in kw for c in '[<>:"/\\|?*]')


def sanitize_keyword(kw: str) -> str:
    """M5 — path-safe keyword (builder/_generator.py:1247)."""
    return kw.replace("/", "_").replace("\\", "_")


def alternative_term(keyword: str, retry_count: int) -> str:
    """M3 — deterministic retry-term generator (builder/_keywords.py:293-697).

    The reference combines 18 term families under strategies chosen
    progressively by retry count; this rebuild keeps the *shape* (progressive
    strategy by retry index, seeded per (keyword, retry)) with its own 18
    modifier families — none copied from the reference's literal lists.
    """
    strategies = [
        lambda k: f"{k} stock",
        lambda k: f"best {k}",
        lambda k: f"{k} gallery",
        lambda k: f"{k} collection",
        lambda k: f"free {k} images",
        lambda k: f"{k} examples",
        lambda k: f"top {k}",
        lambda k: f"{k} archive",
        lambda k: f"{k} catalogue",
        lambda k: f"curated {k}",
        lambda k: f"{k} showcase",
        lambda k: f"{k} portfolio",
        lambda k: f"assorted {k}",
        lambda k: f"{k} library",
        lambda k: f"{k} selection",
        lambda k: f"premium {k}",
        lambda k: f"{k} compilation",
        lambda k: f"popular {k}",
    ]
    idx = (retry_count + hash64(f"{keyword}\x00{retry_count}")) % len(strategies)
    return strategies[int(idx)](keyword)
