"""Dolma-shape attribute tagging + mixing (Soldaini et al. 2024, "Dolma:
an Open Corpus..."; same architecture in RedPajama-v2's quality signals):
TAGGERS write per-doc attribute tables SEPARATE from the corpus, a MIXER
joins them back and applies a boolean rule. The point at 100 TB: attributes
are small fixed-width tables, so re-running a filter sweep (new thresholds,
new rule combinations) never re-reads or re-writes the text — only the
tagging pass, run once per tagger, touches the corpus.

Distributed shape:
- each tagger is one streaming ``map_batches`` pass over ``documents``
  (the ``dup`` tagger adds one md5-keyed exchange for the first-occurrence
  flag) writing partitioned parquet under ``out_dir/attr={name}/`` with the
  repo's atomic rename-as-marker commit (``_DONE``) — resume skips complete
  taggers, the same granule as the crawl epochs (state/checkpoint.py);
- the mixer unions the (lazy-read) attribute tables with the doc spine,
  tagged, and pivots + filters inside ONE doc-keyed exchange — attributes
  never join pairwise, so rule changes cost exactly one exchange over
  fixed-width rows regardless of how many taggers participate.

Reference analog: the validator's per-image quality checks feeding the
keep/quarantine decision (``validator/integrity.py``), decoupled here the
way Dolma decouples tagging from mixing.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from pixcrawler_ray.sources.readers import read_table

# mixer rule defaults (documented; SQL oracle mirrors them verbatim)
MIX_MIN_TOKENS = 5
MIX_MAX_TOKENS = 10_000
MIX_MAX_EMAILS = 1


def _attr_textstat(sf_dir: str):
    """(doc_id, n_tokens, n_chars) — the token_stats whitespace rule."""
    from pixcrawler_ray.stages.textstats import token_stats_batch

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(token_stats_batch, batch_format="pyarrow") \
        .map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "n_tokens": t.column("n_tokens").cast(pa.int64()),
            "n_chars": t.column("n_chars_computed").cast(pa.int64())}),
        batch_format="pyarrow")


def _attr_pii(sf_dir: str):
    """(doc_id, n_emails, n_phones, n_ips) — the pii_scrub counts (on the
    deterministic contact trailer; textprep.pii_scrub docstring)."""
    from pixcrawler_ray.stages.textprep import pii_scrub

    return pii_scrub(sf_dir).map_batches(
        lambda t: t.select(["doc_id", "n_emails", "n_phones", "n_ips"]),
        batch_format="pyarrow")


def _attr_dup(sf_dir: str, num_buckets: int = 16):
    """(doc_id, is_first) — exact-dup first-occurrence flag: one md5-keyed
    exchange, per-bucket min-doc_id comparison (every row keeps a flag,
    unlike exact_dedup which drops losers)."""
    from pixcrawler_ray.stages.dedup import _md5_hexdigests
    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def add_md5(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "md5": pa.array(_md5_hexdigests(
                t.column("text").to_pylist()), type=pa.string())})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        first = g.groupby("md5", sort=False)["doc_id"].transform("min")
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype(np.int64),
            "is_first": (g["doc_id"] == first)})

    return per_bucket(ds.map_batches(add_md5, batch_format="pyarrow"),
                      ["md5"], kernel, num_buckets=num_buckets)


TAGGERS = {"textstat": _attr_textstat, "pii": _attr_pii, "dup": _attr_dup}


def tag_attributes(sf_dir: str, out_dir: str,
                   taggers: tuple[str, ...] = ("textstat", "pii", "dup"),
                   fail_after: int | None = None) -> dict[str, str]:
    """Run each tagger once, committing ``out_dir/attr={name}/`` atomically
    (write to ``_tmp-{name}``, drop ``_DONE``, rename). A re-run skips
    complete taggers — the test hook ``fail_after`` raises after N commits
    to exercise exactly that resume path. Returns name -> committed dir."""
    os.makedirs(out_dir, exist_ok=True)
    paths, committed = {}, 0
    for name in taggers:
        final = os.path.join(out_dir, f"attr={name}")
        if os.path.exists(os.path.join(final, "_DONE")):
            paths[name] = final
            continue
        if fail_after is not None and committed >= fail_after:
            raise RuntimeError(f"simulated crash before tagger {name}")
        tmp = os.path.join(out_dir, f"_tmp-{name}")
        shutil.rmtree(tmp, ignore_errors=True)
        TAGGERS[name](sf_dir).write_parquet(tmp)
        open(os.path.join(tmp, "_DONE"), "w").close()
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)
        paths[name] = final
        committed += 1
    return paths


def mix_corpus(sf_dir: str, attr_dir: str,
               min_tokens: int = MIX_MIN_TOKENS,
               max_tokens: int = MIX_MAX_TOKENS,
               max_emails: int = MIX_MAX_EMAILS,
               num_buckets: int = 16):
    """Mixer: keep docs with min_tokens <= n_tokens <= max_tokens AND
    n_emails <= max_emails AND is_first (exact-dup survivors). Reads ONLY
    the committed attribute tables + the (doc_id, lang) spine; the rule
    pivots and filters inside one doc-keyed exchange. Output
    (doc_id, lang, n_tokens)."""
    import ray.data as rd

    from pixcrawler_ray.stages.shuffle import per_bucket

    spine = read_table(sf_dir, "documents", columns=["doc_id", "lang"])

    def tag_spine(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "src": pa.array(["spine"] * n, type=pa.string()),
            "lang": t.column("lang").cast(pa.string()),
            "v": pa.array(np.zeros(n, dtype=np.int64))})

    def tag_attr(src: str, col: str):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            v = t.column(col)
            if pa.types.is_boolean(v.type):
                v = pc.cast(v, pa.int64())
            return pa.table({
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "src": pa.array([src] * n, type=pa.string()),
                "lang": pa.array([""] * n, type=pa.string()),
                "v": v.cast(pa.int64())})
        return f

    def attr_ds(name: str):
        return rd.read_parquet(os.path.join(attr_dir, f"attr={name}"),
                               file_extensions=["parquet"])

    both = (spine.map_batches(tag_spine, batch_format="pyarrow")
            .union(attr_ds("textstat").map_batches(
                tag_attr("tok", "n_tokens"), batch_format="pyarrow"))
            .union(attr_ds("pii").map_batches(
                tag_attr("email", "n_emails"), batch_format="pyarrow"))
            .union(attr_ds("dup").map_batches(
                tag_attr("first", "is_first"), batch_format="pyarrow")))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        piv = (g.pivot_table(index="doc_id", columns="src", values="v",
                             aggfunc="first"))
        lang = (g[g["src"] == "spine"].set_index("doc_id")["lang"])
        keep = piv[(piv["tok"] >= min_tokens) & (piv["tok"] <= max_tokens)
                   & (piv["email"] <= max_emails) & (piv["first"] == 1)]
        return pd.DataFrame({
            "doc_id": keep.index.to_numpy(dtype=np.int64),
            "lang": lang.reindex(keep.index).to_numpy(dtype=object),
            "n_tokens": keep["tok"].to_numpy(dtype=np.int64)})

    return per_bucket(both, ["doc_id"], kernel, num_buckets=num_buckets)
