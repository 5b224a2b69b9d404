"""S6 — label/metadata sinks in four formats + category index + tiering.

Reference: ``LabelGenerator.generate_dataset_labels`` writes one label file
per image in txt/json/csv/yaml plus dataset metadata and a sorted category
index (``builder/_generator.py:576-1040``); hot/cold tiering splits the first
N files (``backend/services/dataset_processing_pipeline.py:488-534``). Here
labels are a columnar projection written once per format (a directory of part
files, not a file per record), the index is a tiny driver-side table, and
tiering is a split write by rank.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc

from pixcrawler_ray.stages.shuffle import window_rank


def label_projection(extracted_ds):
    """extracted -> labels table: seq_name per (category, keyword) by seq
    (M13 sequential rename as a window projection)."""
    ranked = window_rank(extracted_ds, ["category", "keyword"],
                         [("seq", True)], rank_col="rank_in_kw")

    def project(t: pa.Table) -> pa.Table:
        names = [f"{r + 1:04d}" for r in t.column("rank_in_kw").to_pylist()]
        return pa.table({
            "category": t.column("category"),
            "keyword": t.column("keyword"),
            "url": t.column("url"),
            "seq_name": pa.array(names, type=pa.string()),
            "size": t.column("html_bytes"),
            "valid": t.column("valid"),
        })

    return ranked.map_batches(project, batch_format="pyarrow")


# file-per-row formats (txt) refuse to fan out beyond this many files: the
# reference writes one label file per image, which is fine for post-budget
# survivors (keywords x max_images) but must never be pointed at an
# unbudgeted corpus — millions of tiny files would crush any filesystem.
MAX_FILE_PER_ROW_LABELS = int(os.environ.get(
    "GRAFT_MAX_FILE_PER_ROW_LABELS", str(200_000)))


def write_labels(labels_ds, out_dir: str,
                 formats: tuple[str, ...] = ("parquet", "json", "csv",
                                             "yaml", "txt")):
    """Multi-format label sink — all four reference formats
    (txt/json/csv/yaml, ``builder/_generator.py:896-1040``) plus parquet:
    parquet/json/csv via the native Ray sinks, yaml as a distributed
    per-block writer (one yaml document list per block file; gated on PyYAML
    availability), txt as the reference's per-image label file (one
    ``<category>_<keyword>_<seq_name>.txt`` per row, written distributed per
    block — fine at label scale, since labels are the post-budget survivors,
    not the raw frontier)."""
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for fmt in formats:
        path = os.path.join(out_dir, f"labels_{fmt}")
        if fmt == "parquet":
            labels_ds.write_parquet(path)
        elif fmt == "json":
            labels_ds.write_json(path)
        elif fmt == "csv":
            labels_ds.write_csv(path)
        elif fmt == "yaml":
            try:
                import yaml as _yaml  # noqa: F401
            except ImportError:       # keep the sink optional
                continue
            os.makedirs(path, exist_ok=True)

            def dump_block(t: pa.Table, _path=path) -> pa.Table:
                import uuid

                import yaml as _y
                rows = t.to_pylist()
                fname = os.path.join(_path,
                                     f"part-{uuid.uuid4().hex}.yaml")
                with open(fname, "w") as f:
                    _y.safe_dump(rows, f, sort_keys=True)
                return pa.table({"written": pa.array([len(rows)],
                                                     type=pa.int64())})

            labels_ds.map_batches(dump_block, batch_format="pyarrow").count()
        elif fmt == "txt":
            n = labels_ds.count()
            if n > MAX_FILE_PER_ROW_LABELS:
                raise ValueError(
                    f"txt labels write one file per row; {n} rows exceeds "
                    f"MAX_FILE_PER_ROW_LABELS={MAX_FILE_PER_ROW_LABELS} "
                    "(file-per-row formats are for post-budget survivors — "
                    "use parquet/csv/json for unbudgeted datasets, or raise "
                    "GRAFT_MAX_FILE_PER_ROW_LABELS explicitly)")
            os.makedirs(path, exist_ok=True)

            def dump_txt(t: pa.Table, _path=path) -> pa.Table:
                for r in t.to_pylist():
                    fname = os.path.join(
                        _path,
                        f"{r['category']}_{r['keyword']}_{r['seq_name']}.txt")
                    with open(fname, "w") as f:
                        for k in ("category", "keyword", "url", "seq_name",
                                  "size", "valid"):
                            f.write(f"{k}: {r[k]}\n")
                return pa.table({"written": pa.array([t.num_rows],
                                                     type=pa.int64())})

            labels_ds.map_batches(dump_txt, batch_format="pyarrow").count()
        written.append(path)
    return written


def category_index(labels_ds) -> dict[str, int]:
    """A10 — ``{category: id}`` over sorted names (builder/_generator.py:702-736)."""
    cats = sorted(labels_ds.unique("category"))
    return {c: i for i, c in enumerate(cats)}


def dataset_metadata(labels_ds, dataset_name: str, label_format: str) -> dict:
    """Dataset-level metadata record (builder/_generator.py:662-700)."""
    n = labels_ds.count()
    idx = category_index(labels_ds)
    return {
        "dataset_name": dataset_name,
        "categories_count": len(idx),
        "images_count": n,
        "label_format": label_format,
        "category_index": idx,
    }


def hot_cold_split(labels_ds, hot_threshold: int):
    """S10 — first ``hot_threshold`` rows per keyword -> hot, rest -> cold
    (rank-based split: seq_name IS the per-keyword rank, zero-padded)."""
    import pyarrow.compute as pc

    def is_hot(t: pa.Table, hot=hot_threshold) -> pa.Table:
        ranks = pc.cast(t.column("seq_name"), pa.int64())
        return t.filter(pc.less_equal(ranks, hot))

    def is_cold(t: pa.Table, hot=hot_threshold) -> pa.Table:
        ranks = pc.cast(t.column("seq_name"), pa.int64())
        return t.filter(pc.greater(ranks, hot))

    return (labels_ds.map_batches(is_hot, batch_format="pyarrow"),
            labels_ds.map_batches(is_cold, batch_format="pyarrow"))


def write_tiered(labels_ds, out_dir: str, hot_threshold: int):
    hot, cold = hot_cold_split(labels_ds, hot_threshold)
    hot.write_parquet(os.path.join(out_dir, "hot"))
    cold.write_parquet(os.path.join(out_dir, "cold"))
    return os.path.join(out_dir, "hot"), os.path.join(out_dir, "cold")
