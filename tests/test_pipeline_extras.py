"""Labels, tiering, compression, report, validation levels, retry rounds."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from pixcrawler_ray import base
from pixcrawler_ray.pipelines import compress, crawl, labels
from pixcrawler_ray.state import checkpoint, metrics
from pixcrawler_ray.stages.expand import CrawlConfig

CFG = {
    "dataset_name": "extras_fixture",
    "categories": {"cats": ["cat"], "dogs": ["dog"]},
    "options": {"max_images": 10},
}


@pytest.fixture(scope="module")
def extracted(sf_tiny):
    cfg = CrawlConfig.from_dict(CFG)
    idx = crawl.pages_index_ref(sf_tiny)
    ex, _ = crawl.crawl_generation(cfg, sf_tiny, idx, budget_per_round=8)
    return ex.materialize()


def test_labels_and_category_index(extracted, tmp_path):
    lab = labels.label_projection(extracted)
    rows = lab.take_all()
    assert {r["category"] for r in rows} <= {"cats", "dogs"}
    # per (category, keyword) names are 0001..000k dense
    by_kw = {}
    for r in rows:
        by_kw.setdefault((r["category"], r["keyword"]), []).append(
            r["seq_name"])
    for names in by_kw.values():
        assert sorted(names) == [f"{i + 1:04d}" for i in range(len(names))]
    idx = labels.category_index(labels.label_projection(extracted))
    assert idx == {c: i for i, c in enumerate(sorted(idx))}
    meta = labels.dataset_metadata(labels.label_projection(extracted),
                                   "extras_fixture", "parquet")
    assert meta["images_count"] == len(rows)
    paths = labels.write_labels(labels.label_projection(extracted),
                                str(tmp_path),
                                formats=("parquet", "csv", "yaml", "txt"))
    assert all(os.path.exists(p) for p in paths)
    # txt sink: one per-image label file per row, reference naming
    import glob as _glob
    tdir = [p for p in paths if p.endswith("labels_txt")][0]
    tfiles = _glob.glob(os.path.join(tdir, "*.txt"))
    assert len(tfiles) == len(rows)
    assert open(sorted(tfiles)[0]).read().startswith("category: ")
    # yaml sink round-trips: every label row present across the block files
    import glob

    import yaml as _yaml
    ydir = [p for p in paths if p.endswith("labels_yaml")][0]
    yrows = []
    for f in sorted(glob.glob(os.path.join(ydir, "*.yaml"))):
        with open(f) as fh:
            yrows.extend(_yaml.safe_load(fh))
    assert len(yrows) == len(rows)
    assert {r["url"] for r in yrows} == {r["url"] for r in rows}


def test_hot_cold_tiering(extracted, tmp_path):
    lab = labels.label_projection(extracted)
    hot_dir, cold_dir = labels.write_tiered(lab, str(tmp_path), hot_threshold=3)
    hot = pq.read_table(hot_dir)
    assert hot.num_rows > 0
    assert all(int(x) <= 3 for x in hot.column("seq_name").to_pylist())


def test_validation_levels(extracted):
    fast = base.validate(extracted, "fast").count()
    medium = base.validate(extracted, "medium").count()
    slow = base.validate(extracted, "slow").count()
    assert fast >= medium >= slow
    assert slow > 0  # md5 recomputation agrees -> nothing dropped vs medium
    assert slow == medium


def test_compression_sinks(extracted, tmp_path):
    out = compress.write_compressed_parquet(
        extracted.select_columns(["url", "seq", "text"]),
        str(tmp_path / "zstd"), codec="zstd")
    t = pq.read_table(out)
    assert t.num_rows == extracted.count()
    arch = compress.archive_output(out)
    assert os.path.exists(arch) and os.path.getsize(arch) > 0


def test_report_rendering(extracted, tmp_path):
    mc = metrics.MetricsCollector()
    mc.record("extract", 100, extracted.count(), wall_s=1.0)
    out_dir = str(tmp_path / "chk")
    rows = checkpoint.write_partitioned(extracted, out_dir, num_partitions=2)
    md = metrics.render_report(mc.table(), rows, "extras_fixture")
    assert "# Crawl report — extras_fixture" in md
    assert "extract" in md and "| 0 |" in md


def test_keyword_plan_modes_and_stats():
    """M6/D1/A5 — reference union semantics (builder/_keywords.py:36-89)
    under each keyword_generation mode, plus the generation statistics."""
    from pixcrawler_ray.functions.variations import generate_keywords
    from pixcrawler_ray.stages.expand import keyword_generation_stats

    def cfg(mode, kws):
        return CrawlConfig.from_dict({
            "dataset_name": "kg", "categories": {"cats": kws},
            "options": {"max_images": 5, "keyword_generation": mode}})

    gen = generate_keywords("cats")
    # no keywords + auto/enabled -> generated; disabled -> [category]
    assert cfg("auto", []).keyword_plan()["cats"]["keywords"] == gen
    assert cfg("disabled", []).keyword_plan()["cats"]["keywords"] == ["cats"]
    # keywords + enabled -> user first, then generated not already present
    plan = cfg("enabled", ["tabby", gen[0]]).keyword_plan()["cats"]
    assert plan["keywords"][:2] == ["tabby", gen[0]]
    assert plan["keywords"][2:] == [g for g in gen if g != gen[0]]
    assert plan["generation_occurred"]
    # keywords + auto/disabled -> unchanged
    assert cfg("auto", ["tabby"]).keyword_plan()["cats"]["keywords"] \
        == ["tabby"]
    # A5 stats reconcile with the plan
    st = keyword_generation_stats(cfg("enabled", ["tabby"]))
    assert st["total_categories"] == 1
    assert st["categories_with_generation"] == 1
    assert st["total_original_keywords"] == 1
    assert st["total_generated_keywords"] == len(gen)
    assert st["total_final_keywords"] == 1 + len(gen)


def test_keyword_generator_protocol():
    gen = base.PredefinedKeywordGenerator()
    assert isinstance(gen, base.KeywordGenerator)
    out = gen.generate("cats", 5)
    assert len(out) == 5 and len(set(out)) == 5
    assert out == gen.generate("cats", 5)  # deterministic


def test_retry_rounds_fill_budget(sf_tiny):
    """Alternative-term retries must increase under-budget keywords
    (monotone non-decreasing counts; never exceed max_images)."""
    cfg = CrawlConfig.from_dict({
        "dataset_name": "retry_fixture",
        "categories": {"cats": ["cat"]},
        "options": {"max_images": 60, "max_retries": 2},
    })
    base_out = crawl.run_crawl(cfg, sf_tiny, budget_per_round=8).materialize()
    full = crawl.run_crawl_with_retries(cfg, sf_tiny, budget_per_round=8)
    n_base = base_out.count()
    n_full = full.count()
    assert n_full >= n_base
    counts = {}
    for r in full.select_columns(["keyword"]).take_all():
        counts[r["keyword"]] = counts.get(r["keyword"], 0) + 1
    assert all(v <= 60 for v in counts.values())
    # cumulative dedup closure: the incremental merge must leave no
    # duplicate content_md5 or phash across rounds
    rows = full.select_columns(["content_md5", "phash"]).take_all()
    md5s = [r["content_md5"] for r in rows]
    phs = [r["phash"] for r in rows]
    assert len(md5s) == len(set(md5s))
    assert len(phs) == len(set(phs))


def test_retry_rounds_with_shortfall(sf_tiny):
    """Budget ABOVE what round 0 can deliver -> retry rounds actually run,
    exercising the cumulative anti-seen broadcast (regression: uint64
    phashes >= 2^63 overflowed the default pa.array int64 inference)."""
    cfg = CrawlConfig.from_dict({
        "dataset_name": "shortfall_fixture",
        "categories": {"cats": ["cat"]},
        "options": {"max_images": 500, "max_retries": 1},
    })
    base_out = crawl.run_crawl(cfg, sf_tiny, budget_per_round=8).materialize()
    full = crawl.run_crawl_with_retries(cfg, sf_tiny, budget_per_round=8)
    rows = full.select_columns(["content_md5", "phash", "keyword"]).take_all()
    n_base = base_out.count()
    assert n_base < 500, "fixture must leave a shortfall"
    assert len(rows) >= n_base
    assert any(r["phash"] >= 2 ** 63 for r in rows)   # branch is exercised
    md5s = [r["content_md5"] for r in rows]
    phs = [r["phash"] for r in rows]
    assert len(md5s) == len(set(md5s))
    assert len(phs) == len(set(phs))


def test_ingest_formats_roundtrip(sf_tiny, tmp_path):
    """jsonl and csv ingests of the documents table must produce the same
    rows as the parquet read (external-corpus ingestion path)."""
    import duckdb

    from pixcrawler_ray.sources.readers import ingest_table, read_table

    jsonl = str(tmp_path / "docs.jsonl")
    csvp = str(tmp_path / "docs.csv")
    con = duckdb.connect()
    con.execute(f"COPY (SELECT doc_id, lang FROM "
                f"read_parquet('{sf_tiny}/documents.parquet') ORDER BY doc_id)"
                f" TO '{jsonl}'")
    con.execute(f"COPY (SELECT doc_id, lang FROM "
                f"read_parquet('{sf_tiny}/documents.parquet') ORDER BY doc_id)"
                f" TO '{csvp}' (HEADER)")

    base = (read_table(sf_tiny, "documents", columns=["doc_id", "lang"])
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    for path in (jsonl, csvp):
        got = (ingest_table(path, columns=["doc_id", "lang"])
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        assert got[["doc_id", "lang"]].equals(base[["doc_id", "lang"]])


def test_range_join_matches_bruteforce(sf_tiny):
    """Bucketed-interval range join == pandas theta-join brute force, at a
    non-default window so the oracle isn't the only witness."""
    import pandas as pd

    from pixcrawler_ray.pipelines.relational import q_events_range_attrib
    from pixcrawler_ray.sources.readers import read_table

    got = (q_events_range_attrib(sf_tiny, window_minutes=240).to_pandas()
           .sort_values(["event_id", "anchor_id"]).reset_index(drop=True))
    ev = read_table(sf_tiny, "events",
                    columns=["event_id", "user_id", "ts",
                             "event_type"]).to_pandas()
    an = ev[ev["event_type"] == "purchase"].rename(
        columns={"event_id": "anchor_id", "ts": "anchor_ts"})
    m = ev.merge(an[["anchor_id", "user_id", "anchor_ts"]], on="user_id")
    w = pd.Timedelta(minutes=240)
    m = m[(m["ts"] > m["anchor_ts"]) & (m["ts"] <= m["anchor_ts"] + w)]
    exp = (m[["event_id", "user_id", "anchor_id", "anchor_ts"]]
           .sort_values(["event_id", "anchor_id"]).reset_index(drop=True))
    assert len(exp) > 0          # the fixture corpus produces matches
    pd.testing.assert_frame_equal(
        got[["event_id", "user_id", "anchor_id", "anchor_ts"]], exp,
        check_dtype=False)


def test_range_join_bucket_invariance(sf_tiny):
    """The (user, tile) exchange width must not change the joined set —
    the partitioning-correctness witness for the replicate-to-2-tiles plan."""
    from pixcrawler_ray.pipelines.relational import q_events_range_attrib

    a = (q_events_range_attrib(sf_tiny, num_buckets=3).to_pandas()
         .sort_values(["event_id", "anchor_id"]).reset_index(drop=True))
    b = (q_events_range_attrib(sf_tiny, num_buckets=17).to_pandas()
         .sort_values(["event_id", "anchor_id"]).reset_index(drop=True))
    assert len(a) > 0 and a.equals(b)


def test_rollup_levels_consistent(sf_tiny):
    """ROLLUP grouping sets: finest level must re-aggregate exactly to the
    per-lang and grand-total levels, for both measures."""
    from pixcrawler_ray.pipelines.relational import q_rollup_lang_source

    df = q_rollup_lang_source(sf_tiny)
    for section in ("rollup_docs", "rollup_tokens"):
        s = df[df["section"] == section]
        fine = s[~s["grp"].str.contains(r"\*")]
        lang = s[s["grp"].str.endswith("|*") & ~s["grp"].str.startswith("*")]
        total = s[s["grp"] == "*|*"]
        assert len(total) == 1
        assert fine["n"].sum() == total["n"].iloc[0]
        assert lang["n"].sum() == total["n"].iloc[0]
        fine_by_lang = (fine.assign(lang=fine["grp"].str.split("|").str[0])
                        .groupby("lang")["n"].sum())
        got = dict(zip(lang["grp"].str.split("|").str[0], lang["n"]))
        assert dict(fine_by_lang) == got


def test_pagerank_mass_conserved(sf_tiny):
    """Damped integer PageRank must conserve total mass exactly every
    round (the residue pool redistributes fully), and must differ from
    the undamped propagation (the damping actually does something)."""
    from pixcrawler_ray.stages.graph import (INIT_MASS, link_mass,
                                             pagerank_mass)

    pr = pagerank_mass(sf_tiny, rounds=3).to_pandas()
    lm = link_mass(sf_tiny, rounds=3).to_pandas()
    n = len(pr)
    assert pr["mass"].sum() == INIT_MASS * n
    assert lm["mass"].sum() == INIT_MASS * n
    assert set(pr["doc_id"]) == set(lm["doc_id"])
    merged = pr.merge(lm, on="doc_id", suffixes=("_pr", "_lm"))
    assert (merged["mass_pr"] != merged["mass_lm"]).any()


def test_exact_quantiles_multipass(sf_tiny):
    """Bracket refinement must be EXACT regardless of bin budget: a tiny
    num_bins forces several refinement passes; compare against the sorted
    quantile_disc rule computed in-memory."""
    import math

    import numpy as np
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.profile import exact_quantiles

    v = pq.read_table(f"{sf_tiny}/events.parquet",
                      columns=["value"]).column("value").to_numpy()
    cents = np.sort(np.round(v * 100).astype(np.int64))
    qs = (0.01, 0.25, 0.5, 0.9, 0.999)
    exp = [cents[max(0, math.ceil(q * len(cents)) - 1)] for q in qs]
    got = exact_quantiles(sf_tiny, qs=qs, num_bins=4)
    assert list(got["value_i"]) == exp
    got2 = exact_quantiles(sf_tiny, qs=qs, num_bins=4096)
    assert list(got2["value_i"]) == exp


def test_pps_sampling_properties(sf_tiny):
    """Systematic PPS: ~k docs kept, pick indices strictly increasing
    along the shuffle order, empty docs never selected, and the kept set
    is invariant in the exchange width."""
    from pixcrawler_ray.stages.sample import sample_pps_systematic

    a = (sample_pps_systematic(sf_tiny, k=100, num_buckets=3).to_pandas()
         .sort_values("pick_idx").reset_index(drop=True))
    b = (sample_pps_systematic(sf_tiny, k=100, num_buckets=16).to_pandas()
         .sort_values("pick_idx").reset_index(drop=True))
    assert a.equals(b)
    assert 0 < len(a) <= 101
    assert (a["n_tokens"] > 0).all()
    assert a["pick_idx"].is_monotonic_increasing
    assert a["pick_idx"].is_unique


def test_zorder_locality_and_pruning(sf_tiny):
    """Z-order layout: same (lang-hash, length-bucket) cell => same Morton
    key; and a single-lang predicate touches a strict subset of file
    buckets (the pruning payoff that motivates the layout)."""
    from pixcrawler_ray.stages.layout import zorder_layout
    from pixcrawler_ray.sources.readers import read_table

    z = zorder_layout(sf_tiny).to_pandas()
    docs = read_table(sf_tiny, "documents",
                      columns=["doc_id", "lang"]).to_pandas()
    m = z.merge(docs, on="doc_id")
    n_buckets = m["file_bucket"].nunique()
    per_lang = m.groupby("lang")["file_bucket"].nunique()
    assert (per_lang < n_buckets).all()      # every lang prunes something
    assert (z["file_bucket"].to_numpy() == (z["z"].to_numpy() >> 12)).all()


def test_compact_partitions_roundtrip(sf_tiny, tmp_path):
    """Compaction must preserve rows exactly, hit the target file count,
    and skip already-committed groups on rerun (resume)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.layout import compact_partitions

    src = tmp_path / "small"
    os.makedirs(src)
    for i in range(10):
        pq.write_table(
            pa.table({"a": list(range(i * 100, i * 100 + 100))}),
            str(src / f"part-{i:03d}.parquet"))
    out = str(tmp_path / "compact")
    n_in, n_out = compact_partitions(str(src), out, target_rows=300)
    assert (n_in, n_out) == (10, 4)           # 300+300+300+100
    got = pq.read_table(out)
    assert sorted(got.column("a").to_pylist()) == list(range(1000))
    # resume: nothing rewritten
    mtimes = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out)}
    compact_partitions(str(src), out, target_rows=300)
    assert mtimes == {f: os.path.getmtime(os.path.join(out, f))
                      for f in os.listdir(out)}


def test_upsert_latest_semantics(sf_tiny):
    """CDC upsert: updated keys surface the latest version, tombstoned
    keys vanish, untouched keys stay at v1; bucket-width invariant."""
    from pixcrawler_ray.stages.dedup import upsert_documents
    from pixcrawler_ray.sources.readers import read_table

    got = upsert_documents(sf_tiny).to_pandas()
    ids = read_table(sf_tiny, "documents",
                     columns=["doc_id"]).to_pandas()["doc_id"]
    view = dict(zip(got["doc_id"], got["ver"]))
    for d in ids:
        if d % 31 == 4:
            assert d not in view          # deleted
        elif d % 5 == 0:
            assert view[d] == 2           # updated
        else:
            assert view[d] == 1           # untouched
    assert len(got) == len(got["doc_id"].unique())


def test_image_caption_stats_bucket_invariant(ray_session, sf_tiny):
    """The caption aggregation is one img-keyed exchange; its result must
    be invariant in the bucket count, and internally consistent (a caption
    can't have more distinct hosts than references; first_doc must be a
    doc that references the image)."""
    import pandas as pd
    from pixcrawler_ray.pipelines.crawl_queries import image_caption_stats

    a = (image_caption_stats(sf_tiny, num_buckets=4).to_pandas()
         .sort_values("img").reset_index(drop=True))
    b = (image_caption_stats(sf_tiny, num_buckets=17).to_pandas()
         .sort_values("img").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a.n_hosts <= a.n_refs).all()
    assert (a.first_caplen >= 0).all()
    # every first_doc actually links the image (arithmetic replay)
    for img, fd in zip(a.img.head(50), a.first_doc.head(50)):
        links = [f"http://img.example.com/i/{(fd * 31 + j * 17) % 1000}"
                 for j in range(fd % 4)]
        assert any(img.rsplit(".", 1)[0] == u for u in links), (img, fd)


def test_boilerplate_filter_drops_all_frequent_segments(ray_session,
                                                        sf_tiny):
    """boilerplate_filter must drop EVERY occurrence of a segment whose
    global count >= min_df (vs segment_dedup's keep-first), be bucket-
    invariant, and never keep more segments than the doc has."""
    import pandas as pd
    from collections import Counter
    from pixcrawler_ray.stages.textprep import (boilerplate_filter,
                                                explode_segments)
    from pixcrawler_ray import corpus  # noqa: F401 (fixture parity)
    from pixcrawler_ray.sources.readers import read_table

    a = (boilerplate_filter(sf_tiny, min_df=3, num_buckets=4).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (boilerplate_filter(sf_tiny, min_df=3, num_buckets=13).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert (a.n_kept <= a.n_segs).all() and (a.n_kept > 0).all()
    # serial replay: global segment counts, then per-doc surviving text
    docs = read_table(sf_tiny, "documents",
                      columns=["doc_id", "text"]).to_pandas()
    import pyarrow as pa
    segs = explode_segments(pa.Table.from_pandas(docs)).to_pandas()
    cnt = Counter(segs.seg_text)
    keep = segs[segs.seg_text.map(cnt) < 3]
    exp = (keep.sort_values(["doc_id", "seg_idx"])
           .groupby("doc_id")["seg_text"].agg(" ".join))
    got = dict(zip(a.doc_id, a.clean_text))
    assert got == exp.to_dict()


def test_token_budget_cut_boundary(ray_session, sf_tiny):
    """The cut takes whole docs in Lehmer order while the inclusive prefix
    fits: total <= budget, and the FIRST excluded doc in rank order would
    overflow it."""
    from pixcrawler_ray.stages.textprep import (scan_prefix_tokens,
                                                token_budget_cut)

    budget = 5_000
    cut = (token_budget_cut(sf_tiny, budget_tokens=budget).to_pandas()
           .sort_values("shuffle_rank"))
    assert (cut.cum_end <= budget).all()
    assert (cut.cum_end == cut.n_tokens.cumsum()).all()   # contiguous run?
    full = (scan_prefix_tokens(sf_tiny).to_pandas()
            .sort_values("shuffle_rank").reset_index(drop=True))
    included = set(cut.doc_id)
    excl = full[~full.doc_id.isin(included)]
    if len(excl):
        first_out = excl.iloc[0]
        assert first_out.prefix_before + first_out.n_tokens > budget
        # the cut is a PREFIX of the shuffle order: every included rank
        # precedes the first excluded rank
        assert (cut.shuffle_rank < first_out.shuffle_rank).all()


def test_upsert_as_of_time_travel(ray_session, sf_tiny):
    """VERSION AS OF semantics: as_of=1 is the untouched base snapshot
    (every doc at v1, deletes invisible); as_of=2 applies the updates but
    not the v3 tombstones; current view (no as_of) drops the tombstoned
    keys."""
    from pixcrawler_ray.stages.dedup import upsert_documents

    v1 = upsert_documents(sf_tiny, as_of=1).to_pandas()
    v2 = upsert_documents(sf_tiny, as_of=2).to_pandas()
    cur = upsert_documents(sf_tiny).to_pandas()
    n = len(v1)
    assert (v1.ver == 1).all()
    assert set(v2.doc_id) == set(v1.doc_id)          # deletes not yet
    assert (v2[v2.doc_id % 5 == 0].ver == 2).all()   # updates applied
    assert (v2[v2.doc_id % 5 != 0].ver == 1).all()
    deleted = set(v1.doc_id[v1.doc_id % 31 == 4])
    assert set(cur.doc_id) == set(v1.doc_id) - deleted
    assert n == len(v2) == len(cur) + len(deleted)


def test_connected_components_fixpoint_and_doubling(sf_tiny):
    """Hash-to-min CC must converge to the closed-form components
    (component == doc_id % 97 over the intra-class path/chord graph),
    be invariant to the bucket count, and converge in logarithmically
    few rounds (the pointer doubling is real: a residue-class path of
    length L must close in O(log L) rounds, not L)."""
    import math

    from pixcrawler_ray.stages.graph import connected_components

    stats = {}
    got = (connected_components(sf_tiny, stats=stats).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    n = len(got)
    assert n > 97, "fixture must span several residue classes"
    assert (got["component"] == got["doc_id"] % 97).all()
    # path length per class is ceil(n/97); doubling halves remaining
    # depth per round (+1 detect round, +small propagation constant)
    path_len = -(-n // 97)
    assert stats["rounds"] <= 2 * math.ceil(math.log2(path_len)) + 3

    other = (connected_components(sf_tiny, num_buckets=3).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    assert (other["component"] == got["component"]).all()


def test_anchor_text_index_serial_parity(sf_tiny):
    """Distributed anchor-text aggregation must equal the serial
    replication of the edge rule, and be invariant to bucket count."""
    import numpy as np
    import pandas as pd
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.graph import (ADDS, MULTS,
                                             anchor_text_index)

    got = (anchor_text_index(sf_tiny).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    t = pq.read_table(f"{sf_tiny}/documents.parquet",
                      columns=["doc_id", "text"])
    n = t.num_rows
    d = t.column("doc_id").to_numpy().astype(np.int64)
    sp = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(t.column("text")))
    first = (pc.binary_join(pc.list_slice(sp, 0, 1), "")
             .to_pandas().to_numpy(dtype=object))
    k = 1 + d % 3
    rows = {}
    for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
        for i in np.flatnonzero(k > j):
            tgt = int((d[i] * mu + ad) % n)
            rows.setdefault(tgt, []).append(f"{first[i]}-{j}")
    exp = pd.DataFrame({
        "doc_id": sorted(rows),
        "n_inlinks": [len(rows[t_]) for t_ in sorted(rows)],
        "anchors": ["|".join(sorted(set(rows[t_]))) for t_ in sorted(rows)],
    })
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)

    alt = (anchor_text_index(sf_tiny, num_buckets=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(alt, got)


def test_watermarked_windows_straggler_semantics(sf_tiny):
    """The late side output is exactly the straggler events displaced past
    the allowed lateness (here: all of them — 1/10 of the stream), the
    on-time/late split is a partition of the full stream, and the result
    is invariant to the exchange bucket count."""
    from pixcrawler_ray.pipelines.relational import (WM_STRAGGLER_MOD,
                                                     q_events_watermarked)

    a = (q_events_watermarked(sf_tiny, num_buckets=3).to_pandas()
         .sort_values(["kind", "event_type", "window_start"])
         .reset_index(drop=True))
    b = (q_events_watermarked(sf_tiny, num_buckets=13).to_pandas()
         .sort_values(["kind", "event_type", "window_start"])
         .reset_index(drop=True))
    assert a.equals(b)

    import pyarrow.parquet as pq
    n = pq.read_table(sf_tiny + "/events.parquet",
                      columns=["event_id"]).num_rows
    late_n = int(a[a["kind"] == "late"]["n_events"].sum())
    on_n = int(a[a["kind"] == "watermarked"]["n_events"].sum())
    assert late_n + on_n == n
    # sf events are spaced ~minutes apart, so every straggler (displaced
    # WM_JIT positions ~ hours of event time) lands past the 60-min delay
    assert late_n == sum(1 for i in range(n) if i % WM_STRAGGLER_MOD == 3)


def test_watermarked_windows_delay_param_matches_duckdb(sf_tiny):
    """The allowed-lateness parameter must bind on both sides: replay the
    aggregate at a non-default delay against DuckDB directly."""
    import duckdb

    from pixcrawler_ray.pipelines.relational import q_events_watermarked

    got = (q_events_watermarked(sf_tiny, delay_minutes=30).to_pandas()
           .sort_values(["kind", "event_type", "window_start"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_tiny}/events.parquet')")
    exp = con.execute("""
WITH wm AS (
  SELECT event_type, ts, value,
         MAX(ts) OVER (ORDER BY event_id
                         + CASE WHEN event_id % 10 = 3 THEN 40 ELSE 0 END,
                       event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS mx
  FROM events)
SELECT CASE WHEN mx IS NOT NULL AND mx - ts > INTERVAL 30 MINUTE
            THEN 'late' ELSE 'watermarked' END AS kind,
       event_type, date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM wm GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""").df()
    assert len(got) == len(exp)
    assert (got["kind"].to_numpy() == exp["kind"].to_numpy()).all()
    assert (got["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()
    assert (got["sum_value_cents"].to_numpy()
            == exp["sum_value_cents"].to_numpy()).all()
