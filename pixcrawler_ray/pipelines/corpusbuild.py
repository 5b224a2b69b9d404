"""End-to-end training-corpus build — the composed pipeline a user of the
reference's SDK would actually run to turn a raw page corpus into training
shards, chained from the repo's own stages:

  stage 1  curation sweep     (fused quality/repetition/lang gate + exact
                               keep-first dedup — pipelines/curation.py)
  stage 2  segment dedup      (CCNet-shape 12-word segment keep-first +
                               reassembly — stages/textprep.py)
  stage 3  WebDataset shards  (deterministic USTAR tar shards + manifest —
                               pipelines/shards.py)

Each stage commits its output as an atomically-renamed parquet directory
with a ``_DONE`` marker; a preempted build resumes at the FIRST incomplete
stage and never recomputes a finished one (stage-granular recovery — the
partition-granular variant inside a stage is what
``state.checkpoint.write_partitioned`` / ``resumable_curation`` already
demonstrate; a 100 TB build composes both). The tar stage additionally
reuses ``write_tar_shards``' per-file resume, so even a crash inside
stage 3 only rewrites missing shards.

Stage boundaries are plain ``documents`` parquet directories readable by
``sources.readers.read_table``, so every intermediate is itself queryable
by any operator in the repo — the lakehouse contract (reference analog:
the chunked dataset layout of `docs/CHUNK_ORCHESTRATION_GUIDE.md`).
"""

from __future__ import annotations

import os

import pyarrow as pa


def _done(d: str) -> bool:
    return os.path.exists(os.path.join(d, "_DONE"))


def _mark(d: str) -> None:
    open(os.path.join(d, "_DONE"), "w").close()


def _commit_documents(ds, stage_dir: str) -> None:
    """Write ``ds`` as ``stage_dir/documents`` via tmp-dir + atomic rename."""
    import shutil

    os.makedirs(stage_dir, exist_ok=True)
    tmp = os.path.join(stage_dir, "_tmp_documents")
    final = os.path.join(stage_dir, "documents")
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(tmp, final)
    _mark(stage_dir)


def build_training_corpus(sf_dir: str, out_dir: str,
                          samples_per_shard: int = 32,
                          fail_stage: int | None = None):
    """Run the 3-stage build; return (manifest_dataset, stage_report).

    ``fail_stage`` (test hook): raise just BEFORE running that stage, so
    tests can assert the resume skips every earlier stage and the final
    shards are byte-identical to an uninterrupted run.
    """
    from pixcrawler_ray.pipelines.curation import curated_dataset
    from pixcrawler_ray.pipelines.shards import write_tar_shards
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.textprep import segment_dedup

    s1 = os.path.join(out_dir, "stage1_curated")
    s2 = os.path.join(out_dir, "stage2_segdedup")
    s3 = os.path.join(out_dir, "stage3_shards")
    report: dict[str, int | bool] = {}

    # ---- stage 1: curation gate + exact dedup -> documents dir ----
    if _done(s1):
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
        _commit_documents(cur, s1)
        report["stage1_skipped"] = False
    report["stage1_rows"] = read_table(s1, "documents").count()

    # ---- stage 2: segment-level dedup over the curated survivors ----
    if _done(s2):
        report["stage2_skipped"] = True
    else:
        if fail_stage == 2:
            raise RuntimeError("simulated crash before stage 2")
        seg = segment_dedup(s1).map_batches(
            lambda t: pa.table({
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "text": t.column("clean_text").cast(pa.string())}),
            batch_format="pyarrow")
        _commit_documents(seg, s2)
        report["stage2_skipped"] = False
    report["stage2_rows"] = read_table(s2, "documents").count()

    # ---- stage 3: WebDataset tar shards (per-file resume inside) ----
    if fail_stage == 3 and not _done(s3):
        raise RuntimeError("simulated crash before stage 3")
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
    _mark(s3)
    report["n_shards"] = manifest.count()
    return manifest, report
