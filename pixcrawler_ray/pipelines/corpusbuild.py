"""End-to-end training-corpus build — the composed pipeline a user of the
reference's SDK would actually run to turn a raw page corpus into training
shards, chained from the repo's own stages:

  stage 1  curation sweep     (fused quality/repetition/lang gate + exact
                               keep-first dedup — pipelines/curation.py)
  stage 2  segment dedup      (CCNet-shape 12-word segment keep-first +
                               reassembly — stages/textprep.py)
  stage 3  WebDataset shards  (deterministic USTAR tar shards + manifest —
                               pipelines/shards.py)

Each stage commits its output as an atomically-renamed parquet directory;
the RENAME IS THE MARKER (``os.rename`` is atomic, and the tmp dir is
never named like a committed one), so there is no crash window between
"data committed" and "marked done" — a preempted build resumes at the
FIRST incomplete stage and never recomputes a finished one, including
stage 3, whose manifest is itself a committed parquet directory re-read
on resume (stage-granular recovery — the partition-granular variant
inside a stage is what ``state.checkpoint.write_partitioned`` /
``resumable_curation`` already demonstrate; a 100 TB build composes
both). The tar stage additionally reuses ``write_tar_shards``' per-file
resume, so even a crash inside stage 3 only rewrites missing shards.

Stage boundaries are plain ``documents`` parquet directories readable by
``sources.readers.read_table``, so every intermediate is itself queryable
by any operator in the repo — the lakehouse contract (reference analog:
the chunked dataset layout of `docs/CHUNK_ORCHESTRATION_GUIDE.md`).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa


def _commit_dataset(ds, stage_dir: str, name: str) -> None:
    """Write ``ds`` as ``stage_dir/name`` via tmp-dir + atomic rename —
    presence of the final directory IS the commit marker."""
    os.makedirs(stage_dir, exist_ok=True)
    tmp = os.path.join(stage_dir, f"_tmp_{name}")
    final = os.path.join(stage_dir, name)
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)


def _committed(stage_dir: str, name: str) -> bool:
    return os.path.isdir(os.path.join(stage_dir, name))


def build_training_corpus(sf_dir: str, out_dir: str,
                          samples_per_shard: int = 32,
                          fail_stage: int | None = None):
    """Run the 3-stage build; return (manifest_dataset, stage_report).

    ``fail_stage`` (test hook): raise just BEFORE running that stage, so
    tests can assert the resume skips every earlier stage and the final
    shards are byte-identical to an uninterrupted run.
    """
    import ray.data as rd

    from pixcrawler_ray.pipelines.curation import curated_dataset
    from pixcrawler_ray.pipelines.shards import write_tar_shards
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.textprep import segment_dedup

    s1 = os.path.join(out_dir, "stage1_curated")
    s2 = os.path.join(out_dir, "stage2_segdedup")
    s3 = os.path.join(out_dir, "stage3_shards")
    report: dict[str, int | bool] = {}

    # ---- stage 1: curation gate + exact dedup -> documents dir ----
    if _committed(s1, "documents"):
        report["stage1_skipped"] = True
    else:
        if fail_stage == 1:
            raise RuntimeError("simulated crash before stage 1")
        cur = curated_dataset(sf_dir).map_batches(
            lambda t: pa.table({
                "doc_id": t.column("seq").cast(pa.int64()),
                "lang": t.column("keyword").cast(pa.string()),
                "text": t.column("text").cast(pa.string())}),
            batch_format="pyarrow")
        _commit_dataset(cur, s1, "documents")
        report["stage1_skipped"] = False
    report["stage1_rows"] = read_table(s1, "documents").count()

    # ---- stage 2: segment-level dedup over the curated survivors ----
    if _committed(s2, "documents"):
        report["stage2_skipped"] = True
    else:
        if fail_stage == 2:
            raise RuntimeError("simulated crash before stage 2")
        seg = segment_dedup(s1).map_batches(
            lambda t: pa.table({
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "text": t.column("clean_text").cast(pa.string())}),
            batch_format="pyarrow")
        _commit_dataset(seg, s2, "documents")
        report["stage2_skipped"] = False
    report["stage2_rows"] = read_table(s2, "documents").count()

    # ---- stage 3: WebDataset tar shards (per-file resume inside) ----
    if _committed(s3, "manifest"):
        # finished build: the committed manifest short-circuits the whole
        # stage — nothing is re-read, re-shuffled or re-packed
        report["stage3_skipped"] = True
        manifest = rd.read_parquet(os.path.join(s3, "manifest"))
    else:
        if fail_stage == 3:
            raise RuntimeError("simulated crash before stage 3")
        report["stage3_skipped"] = False
        os.makedirs(s3, exist_ok=True)
        docs = read_table(s2, "documents")

        def to_payload(t: pa.Table) -> pa.Table:
            # Arrow strings are already utf-8 — the binary cast is zero-copy
            return pa.table({
                "doc_id": t.column("doc_id"),
                "payload": t.column("text").cast(pa.binary())})

        manifest = write_tar_shards(
            docs.map_batches(to_payload, batch_format="pyarrow"), s3,
            key_col="doc_id", payload_col="payload",
            samples_per_shard=samples_per_shard,
            name_suffix=".txt").materialize()
        _commit_dataset(manifest, s3, "manifest")
    report["n_shards"] = manifest.count()
    return manifest, report


def build_from_crawl(config, sf_dir: str, out_dir: str,
                     samples_per_shard: int = 32,
                     fail_stage: int | None = None, **crawl_kw):
    """The COMPLETE web→training-shards path — the composition the north
    rule describes end to end: stage 0 runs the multi-generation crawl
    (frontier → politeness → fetch → extract → retry/budget), recovers
    doc ids from the crawled urls (the deterministic url rule), keeps
    valid extractions, dedups to one row per document (min seq), enriches
    (lang, source) via ONE doc-keyed bucketed join against the corpus
    metadata table, and commits the result as a documents-shaped parquet
    dir; stages 1–3 are exactly :func:`build_training_corpus` over that
    dir (curation gate → segment dedup → tar shards), inheriting its
    rename-as-marker stage resume. ``fail_stage=0`` crashes before the
    crawl; 1–3 pass through to the inner build.

    Every stage boundary is a queryable documents dir — a re-run after
    any crash resumes at the first incomplete stage and the final shards
    are byte-identical (pytest-asserted).
    """
    import pyarrow.compute as pc

    from pixcrawler_ray.pipelines.crawl import run_crawl
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import bucketed_join, keep_first_by

    s0 = os.path.join(out_dir, "stage0_crawl")
    report: dict[str, int | bool] = {}
    if _committed(s0, "documents"):
        report["stage0_skipped"] = True
    else:
        if fail_stage == 0:
            raise RuntimeError("simulated crash before stage 0")
        crawled = run_crawl(config, sf_dir, **crawl_kw)

        def project(t: pa.Table) -> pa.Table:
            m = pc.extract_regex(t.column("url"), r"/doc/(?P<id>[0-9]+)$")
            doc = pc.struct_field(m, "id").cast(pa.int64())
            keep = pc.and_(pc.is_valid(doc),
                           pc.fill_null(t.column("valid"), False))
            out = pa.table({"doc_id": doc,
                            "seq": t.column("seq").cast(pa.int64()),
                            "text": t.column("text").cast(pa.string())})
            return out.filter(keep)

        meta = read_table(sf_dir, "documents",
                          columns=["doc_id", "lang", "source"])
        joined = bucketed_join(
            crawled.map_batches(project, batch_format="pyarrow"),
            meta, on="doc_id", num_buckets=16)
        docs = keep_first_by(joined, ["doc_id"], "seq",
                             num_buckets=16).map_batches(
            lambda t: t.select(["doc_id", "lang", "source", "text"]),
            batch_format="pyarrow")
        _commit_dataset(docs, s0, "documents")
        report["stage0_skipped"] = False
    report["stage0_rows"] = read_table(s0, "documents").count()

    manifest, inner = build_training_corpus(
        s0, out_dir, samples_per_shard=samples_per_shard,
        fail_stage=fail_stage if (fail_stage or 0) >= 1 else None)
    report.update(inner)
    return manifest, report
