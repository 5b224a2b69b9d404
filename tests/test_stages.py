"""Unit tests for individual stages: shuffle ops, bloom, seen shards,
minhash/simhash, simsearch recall, textstats, multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from pixcrawler_ray.functions.bloom import BloomFilter
from pixcrawler_ray.functions.minhash import (
    jaccard, lsh_band_keys, minhash_signature, simhash64, word_shingles)
from pixcrawler_ray.stages.shuffle import (
    bucketed_join, keep_first_by, keep_first_n, window_rank)


def test_bloom_no_false_negatives():
    bf = BloomFilter(capacity=5000, fpr=0.01)
    keys = np.arange(0, 10000, 2, dtype=np.uint64)
    bf.add_many(keys)
    assert bf.contains_many(keys).all()
    absent = np.arange(1, 10001, 2, dtype=np.uint64)
    fpr = bf.contains_many(absent).mean()
    assert fpr < 0.05


def test_keep_first_by_matches_pandas():
    rng = np.random.default_rng(1)
    df = pd.DataFrame({"k": rng.integers(0, 50, 1000),
                       "seq": rng.permutation(1000),
                       "v": rng.normal(size=1000)})
    ds = rd.from_pandas(df)
    got = keep_first_by(ds, ["k"], "seq", num_buckets=8).to_pandas()
    want = df.sort_values("seq").drop_duplicates("k")
    assert len(got) == len(want)
    got_map = dict(zip(got.k, got.seq))
    want_map = dict(zip(want.k, want.seq))
    assert got_map == want_map


def test_keep_first_n_budget():
    df = pd.DataFrame({"k": [1] * 10 + [2] * 3, "seq": list(range(10)) + [20, 21, 22]})
    ds = rd.from_pandas(df)
    got = keep_first_n(ds, ["k"], "seq", 4, num_buckets=4).to_pandas()
    by_k = got.groupby("k")["seq"].apply(sorted).to_dict()
    assert by_k == {1: [0, 1, 2, 3], 2: [20, 21, 22]}


def test_window_rank():
    df = pd.DataFrame({"k": ["a", "a", "b", "a", "b"],
                       "seq": [5, 1, 7, 3, 2]})
    ds = rd.from_pandas(df)
    got = window_rank(ds, ["k"], [("seq", True)], rank_col="r",
                      num_buckets=2).to_pandas()
    m = {(r.k, r.seq): r.r for r in got.itertuples()}
    assert m == {("a", 1): 0, ("a", 3): 1, ("a", 5): 2,
                 ("b", 2): 0, ("b", 7): 1}


def test_bucketed_join_inner_and_anti():
    left = rd.from_pandas(pd.DataFrame(
        {"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]}))
    right = rd.from_pandas(pd.DataFrame(
        {"k": [2, 4, 5], "rv": [20, 40, 50]}))
    inner = bucketed_join(left, right, on="k", how="inner",
                          num_buckets=4).to_pandas()
    assert sorted(zip(inner.k, inner.lv, inner.rv)) == [
        (2, "b", 20), (4, "d", 40)]
    anti = bucketed_join(left, right, on="k", how="anti",
                         num_buckets=4).to_pandas()
    assert sorted(anti.k) == [1, 3]
    semi = bucketed_join(left, right, on="k", how="semi",
                         num_buckets=4).to_pandas()
    assert sorted(semi.k) == [2, 4]


def test_minhash_approximates_jaccard():
    a = "the quick brown fox jumps over the lazy dog and runs away fast"
    b = "the quick brown fox jumps over the lazy cat and runs away fast"
    sa, sb = word_shingles(a), word_shingles(b)
    true_j = jaccard(np.sort(sa), np.sort(sb))
    ma = minhash_signature(sa, 256)
    mb = minhash_signature(sb, 256)
    est = (ma == mb).mean()
    assert abs(est - true_j) < 0.15
    # identical docs -> identical signatures and band keys
    assert (minhash_signature(sa, 128) == minhash_signature(
        word_shingles(a), 128)).all()
    assert (lsh_band_keys(ma) == lsh_band_keys(ma)).all()


def test_simhash_properties():
    a = simhash64("spark table join merge sort hash batch stream")
    b = simhash64("spark table join merge sort hash batch stream")
    c = simhash64("completely different words entirely unrelated content here")
    assert a == b
    assert a != c
    assert simhash64("") == 0


def test_minhash_lsh_finds_planted_near_dups(tmp_path, sf_tiny):
    """Plant near-identical docs; LSH must surface them as candidates."""
    import pyarrow.parquet as pq
    from pixcrawler_ray.stages.dedup import dedup_minhash

    base = pq.read_table(f"{sf_tiny}/documents.parquet").to_pandas().head(50)
    clone = base.head(5).copy()
    clone["doc_id"] = clone["doc_id"] + 10000   # near-identical clones
    planted = pd.concat([base, clone], ignore_index=True)
    d = tmp_path / "planted"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(planted, preserve_index=False),
                   str(d / "documents.parquet"))
    survivors, verified = dedup_minhash(str(d), threshold=0.9)
    surv_ids = set(survivors.to_pandas().doc_id)
    dropped = set(planted.doc_id) - surv_ids
    # every clone dies (keep-first keeps the lower doc_id original); the base
    # corpus may contain genuine near-dups of its own, so subset not equality
    assert set(clone.doc_id) <= dropped
    assert set(base.head(5).doc_id) <= surv_ids


def test_minhash_dedup_matches_serial_oracle(sf_tiny):
    """Distributed verify + min-label clustering must equal a straight serial
    MinHash-LSH dedup (signatures -> bands -> pairs -> jaccard -> union-find)
    over the same corpus."""
    import pyarrow.parquet as pq
    from pixcrawler_ray.functions.minhash import (
        lsh_band_keys, minhash_signature_batch)
    from pixcrawler_ray.stages.dedup import dedup_minhash

    threshold, k, perms, bands = 0.8, 3, 128, 16
    docs = pq.read_table(f"{sf_tiny}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    ids = docs.doc_id.to_numpy()
    sigs = minhash_signature_batch([t or "" for t in docs.text], perms, k)
    buckets: dict[tuple, list[int]] = {}
    for i, did in enumerate(ids):
        for band, key in enumerate(lsh_band_keys(sigs[i], bands)):
            buckets.setdefault((band, int(key)), []).append(int(did))
    cand = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))
    text_of = dict(zip(docs.doc_id, docs.text))
    parent: dict[int, int] = {}

    def find(v):
        parent.setdefault(v, v)
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for a, b in sorted(cand):
        sa = np.sort(word_shingles(text_of[a] or "", k))
        sb = np.sort(word_shingles(text_of[b] or "", k))
        if jaccard(sa, sb) >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    serial_dropped = {d for d in parent if find(d) != d}
    serial_survivors = set(ids) - serial_dropped

    survivors, _ = dedup_minhash(sf_tiny, threshold=threshold,
                                 num_perms=perms, shingle_k=k, bands=bands)
    assert set(survivors.to_pandas().doc_id) == serial_survivors


def test_simsearch_ivf_recall(sf_tiny):
    from pixcrawler_ray.stages.simsearch import topk_bruteforce, topk_ivf
    exact = topk_bruteforce(sf_tiny, [0, 5], k=10)
    approx = topk_ivf(sf_tiny, [0, 5], k=10, n_cells=8, nprobe=4)
    for q in (0, 5):
        e = set(exact[exact.query_vec_id == q].vec_id)
        a = set(approx[approx.query_vec_id == q].vec_id)
        assert len(e & a) / len(e) >= 0.5   # recall@10 with half the cells


def test_fingerprint_containment_planted(tmp_path):
    """MOSS-style containment: a doc built as 7's text + 3's text + 11's
    text must pair with exactly those three at threshold 0.8 — Jaccard
    would miss these (the big doc's fingerprint set is 3x larger)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.textstats import fingerprint_containment

    rng = np.random.default_rng(5)
    words = [f"w{int(x)}" for x in rng.integers(0, 5000, size=6000)]
    docs = [" ".join(words[i * 140:i * 140 + 120]) for i in range(40)]
    docs.append(docs[7] + " " + docs[3] + " " + docs[11])    # doc 40
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs),
                  "lang": pa.array(["en"] * len(docs))}),
        str(tmp_path / "documents.parquet"))
    out = fingerprint_containment(str(tmp_path), threshold=0.8).take_all()
    assert {(r["doc_a"], r["doc_b"]) for r in out} \
        == {(3, 40), (7, 40), (11, 40)}


def test_extract_vectorized_matches_scalar(sf_tiny):
    """The Arrow-kernel extract core must equal extract_one row-for-row on
    corpus pages AND adversarial html (entities, truncation, bad links,
    uppercase extensions, unicode, null); non-utf8 payloads fall back."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pixcrawler_ray import corpus
    from pixcrawler_ray import extract as ex

    docs = pq.read_table(f"{sf_tiny}/documents.parquet")
    pages = corpus.pages_batch(docs.combine_chunks()).select(["html"])
    weird = pa.table({"html": pa.array([
        b"", None,
        b"<html><head><title>doc 1</title></head><body>"
        b"<p>a &amp;lt; b &amp;amp; c</p></body></html>",
        b"<p>no end tag",
        b'<html><head><title>x</title></head><body><p>t</p>'
        b'<img src="a.jpg"/><img src="b.txt"/><img src="noquote/>'
        b'</body></html>',
        b"<html><head><title>doc 13</title></head><bo",
        '<html><head><title>u</title></head><body><p>é café '
        '&lt;tag&gt;</p></body></html>'.encode(),
        b'<html><head><title>q</title></head><body><p>x</p>'
        b'<img src="A.JPG"/><img src="z.webp"/></body></html>',
    ], type=pa.binary())})
    for tbl in (pages, weird):
        vec = ex._extract_columns_vectorized(tbl)
        assert vec is not None
        texts_a, links_arr, raw_arr, valid_a, sizes_a = vec
        for i, h in enumerate(tbl.column("html").to_pylist()):
            h = h or b""
            t, ln, v = ex.extract_one(h)
            assert texts_a[i].as_py() == t
            assert raw_arr[i].as_py() == len(ln)
            assert links_arr[i].as_py() == ex.filter_image_links(ln)
            assert valid_a[i].as_py() == v
            assert sizes_a[i].as_py() == len(h)
    bad = pa.table({"html": pa.array([b"\xff\xfe<html>", b"ok"],
                                     type=pa.binary())})
    assert ex._extract_columns_vectorized(bad) is None
    assert ex.extract_batch(bad).column("valid").to_pylist() == [False,
                                                                 False]


def test_textstats_vectorized_matches_python_semantics():
    """The Arrow-kernel token/quality stats must equal the Python
    str.split()/re.findall reference on every edge case the oracle SQL
    guards (empty, whitespace-only, null, unicode, leading/trailing)."""
    import re

    import pyarrow as pa

    from pixcrawler_ray.stages import textstats as ts

    texts = ["", " ", "a  b", "a\tb\ncc", "héllo wörld!",
             "the cat and the hat x", None, "one", "the the the the the",
             "  leading", "trailing  ", "a" * 30 + " b"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    out = ts.token_stats_batch(t)
    q = ts.quality_score_batch(t)
    tok_re = re.compile(r"[a-zA-Z]+|[0-9]+|[^\sa-zA-Z0-9]")
    for i, x in enumerate(texts):
        words = (x or "").split()
        assert out.column("n_tokens")[i].as_py() == len(words)
        assert out.column("n_bpe_tokens")[i].as_py() \
            == len(tok_re.findall(x or ""))
        assert q.column("n_tokens")[i].as_py() == len(words)
        assert q.column("stop_hits")[i].as_py() \
            == sum(1 for w in words if w in ts._STOPWORDS)
        assert q.column("max_word_len")[i].as_py() \
            == max((len(w) for w in words), default=0)
        assert q.column("sum_word_len")[i].as_py() \
            == sum(len(w) for w in words)


def test_repetition_stats_matches_python_reference():
    """The vectorized repetition kernel must equal a plain-Python Counter
    reference (distinct tokens, max adjacent-bigram count) on edge cases."""
    from collections import Counter

    import pyarrow as pa

    from pixcrawler_ray.stages import textstats as ts

    texts = ["", " ", None, "one", "a a a a", "a b a b a b",
             "x y z", "the the cat cat cat", "solo pair pair solo solo",
             "a  b\t b  a"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts)})
    out = ts.repetition_stats_batch(t)
    for i, x in enumerate(texts):
        words = (x or "").split()
        bigrams = Counter(zip(words, words[1:]))
        assert out.column("n_tokens")[i].as_py() == len(words)
        assert out.column("n_distinct_tokens")[i].as_py() == len(set(words))
        assert out.column("dup_tokens")[i].as_py() \
            == len(words) - len(set(words))
        assert out.column("top_bigram_count")[i].as_py() \
            == (max(bigrams.values()) if bigrams else 0)
        dup = len(words) - len(set(words))
        top = max(bigrams.values()) if bigrams else 0
        assert out.column("rep_ok")[i].as_py() \
            == (2 * dup <= len(words) and 5 * top <= len(words))


def test_url_canonicalization_rules():
    """RFC 3986 syntax normalization: fragment strip, scheme/host lowering,
    default-port removal, empty-path -> '/'; non-URLs pass through."""
    import pyarrow as pa

    from pixcrawler_ray.stages.urlnorm import canonicalize_urls

    cases = {
        "http://Host.Example.COM/a/b": "http://host.example.com/a/b",
        "HTTP://HOST.EXAMPLE.COM:80/a": "http://host.example.com/a",
        "https://h.example.com:443/x?q=1#frag": "https://h.example.com/x?q=1",
        "http://h.example.com": "http://h.example.com/",
        "http://h.example.com#only-frag": "http://h.example.com/",
        "http://h.example.com:8080/a": "http://h.example.com:8080/a",
        "https://h.example.com:80/a": "https://h.example.com:80/a",
        "http://h.example.com/A/B?Q=Mixed": "http://h.example.com/A/B?Q=Mixed",
        "not a url": "not a url",
        "": "",
    }
    got = canonicalize_urls(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_link_mass_conserves_and_converges(sf_tiny):
    """Integer mass propagation must conserve total mass exactly at every
    round count (each node ships 3*floor(m/3) and keeps the remainder)."""
    from pixcrawler_ray.stages.graph import INIT_MASS, link_mass

    for rounds in (1, 3):
        t = link_mass(sf_tiny, rounds=rounds).to_pandas()
        assert t["mass"].sum() == len(t) * INIT_MASS
        assert (t["mass"] >= 0).all()


def test_hits_matches_serial_spec(sf_tiny):
    """Distributed 2-exchange HITS == a serial numpy power iteration over
    the same arithmetic edge set (unnormalized integer updates), with a
    full (hub, auth) row pair for every node — zero-in-degree nodes must
    keep an auth=0 row via the ground rows."""
    import numpy as np
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.graph import ADDS, MULTS, hits_scores

    n = pq.read_table(sf_tiny + "/documents.parquet",
                      columns=["doc_id"]).num_rows
    d = np.arange(n, dtype=np.int64)
    k = 1 + d % 3
    src, tgt = [], []
    for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
        sel = k > j
        src.append(d[sel])
        tgt.append((d[sel] * mu + ad) % n)
    src, tgt = np.concatenate(src), np.concatenate(tgt)
    h = np.ones(n, dtype=np.int64)
    for _ in range(2):
        a = np.zeros(n, dtype=np.int64)
        np.add.at(a, tgt, h[src])
        h2 = np.zeros(n, dtype=np.int64)
        np.add.at(h2, src, a[tgt])
        h = h2

    res = hits_scores(sf_tiny, rounds=2).to_pandas()
    hub = res[res.section == "hub"].set_index("doc_id")["score"]
    auth = res[res.section == "auth"].set_index("doc_id")["score"]
    assert len(hub) == n and len(auth) == n
    assert (hub.loc[d].to_numpy() == h).all()
    assert (auth.loc[d].to_numpy() == a).all()


def test_opic_matches_serial_spec_and_conserves(sf_tiny):
    """Distributed OPIC (bounded top-k select + one keyed cash exchange
    per round) == a serial numpy replay of the Abiteboul 2003 rule, and
    total cash is invariant every round (integer conservation)."""
    import numpy as np
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.graph import (ADDS, INIT_MASS, MULTS,
                                             opic_importance)

    n = pq.read_table(sf_tiny + "/documents.parquet",
                      columns=["doc_id"]).num_rows
    K, R = 50, 3
    d = np.arange(n, dtype=np.int64)
    k = 1 + d % 3
    cash = np.full(n, INIT_MASS, dtype=np.int64)
    hist = np.zeros(n, dtype=np.int64)
    for _ in range(R):
        order = np.lexsort((d, -cash))
        sel = np.zeros(n, dtype=bool)
        sel[order[:K]] = True
        share = np.where(sel, cash // k, 0)
        dist = k * share
        new_cash = cash - dist
        hist = hist + dist
        for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
            m = sel & (k > j)
            np.add.at(new_cash, (d[m] * mu + ad) % n, share[m])
        cash = new_cash

    res = (opic_importance(sf_tiny, rounds=R, k_crawl=K)
           .to_pandas().set_index("doc_id").sort_index())
    assert len(res) == n
    assert (res["cash"].to_numpy() == cash).all()
    assert (res["hist"].to_numpy() == hist).all()
    assert res["cash"].sum() == INIT_MASS * n


def test_host_graph_matches_serial_spec(sf_tiny):
    """Host-graph rollup == a serial pandas aggregation of the projected
    edge list, including the two stats the SQL row omits (distinct
    in-hosts, self-loops)."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.graph import ADDS, MULTS, _host_of, host_graph

    n = pq.read_table(sf_tiny + "/documents.parquet",
                      columns=["doc_id"]).num_rows
    d = np.arange(n, dtype=np.int64)
    k = 1 + d % 3
    hs, ht = [], []
    for j, (mu, ad) in enumerate(zip(MULTS, ADDS)):
        sel = k > j
        hs.append(_host_of(d[sel]))
        ht.append(_host_of((d[sel] * mu + ad) % n))
    e = pd.DataFrame({"s": np.concatenate(hs), "t": np.concatenate(ht)})
    exp = pd.DataFrame({
        "n_out_edges": e.groupby("s").size(),
        "n_out_hosts": e.groupby("s")["t"].nunique(),
        "n_in_edges": e.groupby("t").size(),
        "n_in_hosts": e.groupby("t")["s"].nunique(),
        "n_self": e[e.s == e.t].groupby("s").size(),
    }).fillna(0).astype(np.int64)

    got = host_graph(sf_tiny).to_pandas().set_index("host_id").sort_index()
    assert len(got) == len(exp)
    for col in exp.columns:
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
    assert (got["host"] == "h" + got.index.astype(str)
            + ".example.com").all()


def test_bpe_counter_matches_scalar_and_merges():
    """BpeCounter batch counts == per-word scalar spec; spot-check known
    merges (the->1 token via t+h then th+e; unmergeable stays chars)."""
    from pixcrawler_ray.functions.bpe import BpeCounter, bpe_word

    assert bpe_word("the") == ["the"]
    assert bpe_word("xqz") == ["x", "q", "z"]
    assert bpe_word("") == []
    texts = ["the cat", "standing orders", None, "", "xqz the the",
             "in er an re"]
    got = BpeCounter().count_texts(texts)
    for i, x in enumerate(texts):
        expect = sum(len(bpe_word(w)) for w in (x or "").split())
        assert got[i] == expect


def test_kmv_sketch_exact_small_and_bounded_error():
    """KMV: exact when cardinality <= k; bounded relative error when
    estimating; merge-order invariant (associative partials)."""
    import numpy as np
    import pandas as pd

    from pixcrawler_ray.stages.sketch import kmv_estimate, kmv_partial

    rng = np.random.default_rng(7)
    # deterministic 'hashes': uniform uint64 draws stand in for hash values
    small = rng.integers(0, 2**64, size=40, dtype=np.uint64)
    est, exact = kmv_estimate(
        kmv_partial(np.zeros(40, dtype=object), small, k=64), k=64)
    assert exact and est == len(np.unique(small))

    big = rng.integers(0, 2**64, size=20000, dtype=np.uint64)
    true_n = len(np.unique(big))
    p1 = kmv_partial(np.zeros(10000, dtype=object), big[:10000], k=64)
    p2 = kmv_partial(np.zeros(10000, dtype=object), big[10000:], k=64)
    merged_ab = pd.concat([p1, p2])
    merged_ba = pd.concat([p2, p1])
    est_ab, exact_ab = kmv_estimate(merged_ab, k=64)
    est_ba, _ = kmv_estimate(merged_ba, k=64)
    assert est_ab == est_ba and not exact_ab        # order-invariant merge
    assert abs(est_ab - true_n) / true_n < 0.5      # ~4 sigma at k=64


def test_distinct_urls_per_host_vs_exact(sf_tiny):
    """The distributed sketch must be exact for every host with <= k URLs
    and within KMV error for the hot host."""
    import numpy as np

    from pixcrawler_ray import corpus
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.sketch import distinct_urls_per_host

    out = distinct_urls_per_host(sf_tiny, k=64).to_pandas()
    ids = (read_table(sf_tiny, "documents", columns=["doc_id"])
           .to_pandas()["doc_id"].to_numpy())
    url, host = corpus.urls_hosts_arrow(ids)
    import pandas as pd
    truth = (pd.DataFrame({"host": host.to_pylist(),
                           "url": url.to_pylist()})
             .groupby("host")["url"].nunique())
    merged = out.set_index("host").join(truth.rename("true_n"))
    exact = merged[merged["is_exact"]]
    assert (exact["n_distinct_est"] == exact["true_n"]).all()
    approx = merged[~merged["is_exact"]]
    if len(approx):
        rel = (approx["n_distinct_est"] - approx["true_n"]).abs() \
            / approx["true_n"]
        assert (rel < 0.5).all()


def test_link_mass_resumable_crash_equals_uninterrupted(sf_tiny, tmp_path):
    """Crash after round 1, resume, and match both the uninterrupted
    checkpointed run and the non-checkpointed pipeline exactly."""
    import pytest

    from pixcrawler_ray.stages.graph import link_mass, link_mass_resumable

    out = str(tmp_path / "lm")
    with pytest.raises(RuntimeError, match="simulated crash"):
        link_mass_resumable(sf_tiny, out, rounds=3, fail_after_round=1)
    resumed = (link_mass_resumable(sf_tiny, out, rounds=3).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
    direct = (link_mass(sf_tiny, rounds=3).to_pandas()
              .sort_values("doc_id").reset_index(drop=True))
    assert resumed.equals(direct)


def test_robots_txt_roundtrip_matches_rule():
    """Parsing the synthesized robots.txt bytes must recover exactly the
    rule the gate applies (disallow mask + crawl delay) for every host."""
    import numpy as np
    import pyarrow as pa

    from pixcrawler_ray import corpus
    from pixcrawler_ray.stages.robots import parse_robots_batch, robots_txt_for

    hid = np.arange(500, dtype=np.int64)
    t = pa.table({"host_id": pa.array(hid),
                  "robots_txt": pa.array(robots_txt_for(hid).tolist(),
                                         type=pa.string())})
    parsed = parse_robots_batch(t)
    dis = parsed.column("disallow_prefix").to_pylist()
    delay = parsed.column("crawl_delay").to_numpy()
    expect = corpus.robots_disallowed_host(hid)
    assert [p == "/private/" for p in dis] == expect.tolist()
    assert (delay == 1 + hid % 3).all()


def test_embedding_srp_pairs_planted(tmp_path):
    """SRP-LSH must recover planted near-duplicates with exact precision.

    The shipped testdata has no high-cosine pairs (max pairwise cosine
    ~0.48), so plant them: 200 seeded Gaussian vectors plus 20 noisy copies
    at cosine > 0.99. Every planted pair must surface (recall 1.0 at this
    threshold by the Charikar band bound) and nothing else may (pairs are
    cosine-verified in-bucket, so precision is exact, not probabilistic)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.dedup import embedding_srp_pairs

    rng = np.random.default_rng(3)
    base = rng.standard_normal((200, 32))
    dups = base[:20] + 0.02 * rng.standard_normal((20, 32))
    mat = np.concatenate([base, dups])
    ids = np.arange(len(mat), dtype=np.int64)
    pq.write_table(
        pa.table({"vec_id": ids,
                  "embedding": pa.array([list(map(float, v)) for v in mat],
                                        type=pa.list_(pa.float32())),
                  "label": pa.array(np.zeros(len(mat), dtype=np.int32))}),
        str(tmp_path / "embeddings.parquet"))
    got = {(r["vec_a"], r["vec_b"])
           for r in embedding_srp_pairs(str(tmp_path),
                                        threshold=0.98).take_all()}
    # exact ground truth on the tiny planted table (through the same
    # float32 storage rounding the pipeline reads)
    mat = mat.astype(np.float32).astype(np.float64)
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ai, bi = np.nonzero(np.triu(n @ n.T >= 0.98, k=1))
    exact = {(int(min(a, b)), int(max(a, b))) for a, b in zip(ai, bi)}
    planted = {(i, 200 + i) for i in range(20)}
    assert planted <= exact          # sanity: the plant actually worked
    assert got == exact


def test_simsearch_ivf_partitioned_matches_scan(sf_tiny, tmp_path):
    """The cell-partitioned layout (build once, prune at read) must return
    EXACTLY the scan-based IVF's neighbors for the same fit parameters —
    partition pruning changes which bytes are read, never the math."""
    from pixcrawler_ray.stages.simsearch import (
        build_ivf_index,
        topk_ivf,
        topk_ivf_partitioned,
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(sf_tiny, idx, n_cells=8, sample_rows=4096)
    part = topk_ivf_partitioned(idx, sf_tiny, [0, 5], k=10, nprobe=4)
    scan = topk_ivf(sf_tiny, [0, 5], k=10, n_cells=8, nprobe=4,
                    sample_rows=4096)
    cols = ["query_vec_id", "vec_id", "rank"]
    assert sorted(map(tuple, part[cols].to_numpy())) \
        == sorted(map(tuple, scan[cols].to_numpy()))
    assert len(part) == 20


def test_multimodal_plumbing(sf_tiny):
    from pixcrawler_ray import corpus
    from pixcrawler_ray.stages import multimodal as mm
    media = mm.media_from_pages(corpus.pages_dataset(sf_tiny))
    feats = mm.decode_features(media).take(20)
    assert all(len(f["features"]) == 4 for f in feats)
    assert all(f["decode_ok"] for f in feats)
    with pytest.raises(NotImplementedError):
        mm.FakeDecoder(strict=True)._decode(b"payload")


def test_multimodal_resize_and_frame_sample(sf_tiny):
    """Resize emits dst×dst block means (arithmetic checked against numpy);
    frame sampling explodes video rows deterministically and only those."""
    import numpy as np

    from pixcrawler_ray import corpus
    from pixcrawler_ray.stages import multimodal as mm

    media = mm.media_from_pages(corpus.pages_dataset(sf_tiny)).materialize()
    rows = media.take(30)
    rz = mm.resize_media(media, dst_size=8).take(30)
    by_id = {r["media_id"]: r for r in rz}
    dec = mm.FakeDecoder(target_size=32)
    for r in rows[:5]:
        img = dec._decode(r["payload"]).astype(np.float64)
        want = img.reshape(8, 4, 8, 4).mean((1, 3)).ravel()
        got = np.array(by_id[r["media_id"]]["resized"])
        assert np.allclose(got, want)
        assert by_id[r["media_id"]]["resized_dim"] == 8

    frames = mm.sample_frames(media, frame_bytes=256, stride=2,
                              max_frames=3).take_all()
    vids = {r["media_id"]: r["payload"] for r in media.take_all()
            if r["media_type"] == "video"}
    assert {f["media_id"] for f in frames} == set(vids)
    for f in frames:
        payload = vids[f["media_id"]]
        chunk = f["frame_idx"] * 2          # stride 2
        assert f["frame_payload"] == payload[chunk * 256:(chunk + 1) * 256]
        assert f["frame_idx"] < 3


def test_politeness_shard_actor_matches_batch_rule():
    import ray
    from pixcrawler_ray.stages.politeness import PolitenessShard
    shard = PolitenessShard.remote(budget_per_round=2)
    hosts = ["a", "a", "a", "b", "a", "b", "b"]
    rounds = ray.get(shard.admit.remote(hosts))
    # a: ranks 0,1,2,3 -> rounds 0,0,1,1 ; b: 0,0,1
    assert list(rounds) == [0, 0, 1, 0, 1, 0, 1]


def test_politeness_shard_delay_matches_batch_rule(sf_tiny):
    """The streaming shard with respect_crawl_delay must reproduce the
    delay-aware batch schedule exactly: budget shrinks to
    max(budget // (1 + host_id % 3), 1) per host."""
    import ray

    from pixcrawler_ray.stages.politeness import PolitenessShard

    shard = PolitenessShard.remote(budget_per_round=6,
                                   respect_crawl_delay=True)
    # h1 delay=2 -> budget 3; h2 delay=3 -> budget 2; h3 delay=1 -> budget 6
    hosts = (["h1.example.com"] * 7 + ["h2.example.com"] * 5
             + ["h3.example.com"] * 7)
    rounds = ray.get(shard.admit.remote(hosts))
    expect = ([k // 3 for k in range(7)] + [k // 2 for k in range(5)]
              + [k // 6 for k in range(7)])
    assert list(rounds) == expect
    ray.kill(shard)


def test_batch_fingerprints_match_scalar(sf_tiny):
    """simhash64_batch / minhash_signature_batch must be value-identical to
    the scalar reference implementations."""
    import pyarrow.parquet as pq
    from pixcrawler_ray.functions.minhash import (
        minhash_signature, minhash_signature_batch, simhash64,
        simhash64_batch, word_shingles)

    texts = pq.read_table(f"{sf_tiny}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()[:200]
    texts += ["", "one", "two words", "a b c d"]
    batch = simhash64_batch(texts, k=2)
    for i, t in enumerate(texts):
        assert int(batch[i]) == simhash64(t, k=2), (i, t[:40])
    sigs = minhash_signature_batch(texts, 64, k=3)
    for i, t in enumerate(texts):
        want = minhash_signature(word_shingles(t, 3), 64)
        assert (sigs[i] == want).all(), (i, t[:40])


def test_rolling_fingerprints_batch_matches_scalar(sf_tiny):
    import pyarrow.parquet as pq
    from pixcrawler_ray.functions.hashing import (
        rolling_fingerprint, rolling_fingerprints_batch)

    texts = pq.read_table(f"{sf_tiny}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()[:100]
    texts += ["", "hi", "seven b"]
    batch = rolling_fingerprints_batch(texts)
    for t, b in zip(texts, batch):
        assert [int(x) for x in b] == [int(x)
                                       for x in rolling_fingerprint(t or "")]


def test_quality_lr_margin_matches_spec(ray_session, sf_tiny):
    """The linear-classifier margin is exactly the documented integer dot
    product over the already-verified quality/repetition signals."""
    from pixcrawler_ray.stages import textstats as ts

    df = ts.quality_repetition(sf_tiny).to_pandas()
    want = (50 * df["n_tokens"] + 200 * df["stop_hits"]
            - 30 * df["dup_tokens"] - 2 * df["sum_word_len"] - 1000)
    assert (df["lr_margin"] == want).all()
    assert (df["lr_ok"] == (want > 0)).all()
    assert df["lr_ok"].any() and not df["lr_ok"].all()   # non-degenerate


def test_simsearch_pq_recall_and_refine(sf_tiny):
    """PQ/ADC (Jegou-shape) quality bounds: the pure code scan recalls
    >=0.8 of the exact top-10 at m=32/ksub=128; the ADC+R refined path
    (exact cosine over the 50-candidate shortlist) recalls >=0.95; both
    are deterministic run-to-run; codes are m bytes per vector."""
    from pixcrawler_ray.stages.simsearch import (
        PQCodebook,
        _sample_embeddings,
        pq_encode,
        topk_bruteforce,
        topk_pq,
    )

    exact = topk_bruteforce(sf_tiny, [0, 1, 2], k=10)
    adc = topk_pq(sf_tiny, [0, 1, 2], k=10)
    ref = topk_pq(sf_tiny, [0, 1, 2], k=10, refine=50)

    def rec(df):
        hits = 0
        for q in (0, 1, 2):
            e = set(exact[exact.query_vec_id == q].vec_id)
            a = set(df[df.query_vec_id == q].vec_id)
            hits += len(e & a)
        return hits / len(exact)

    assert rec(adc) >= 0.8
    assert rec(ref) >= 0.95
    # deterministic (seeded fit + argmin encode): rerun == first run
    adc2 = topk_pq(sf_tiny, [0, 1, 2], k=10)
    assert adc.equals(adc2)
    # the persisted artifact is m bytes/vector
    book = PQCodebook.fit(_sample_embeddings(sf_tiny, 4096))
    codes = pq_encode(sf_tiny, book).take_batch(5, batch_format="pyarrow")
    assert codes["code"].type == pa.list_(pa.uint8(), book.m)


def test_dedup_best_rep_planted_cluster(ray_session, tmp_path):
    """A planted 3-member near-dup cluster must keep exactly the member
    with the highest lr_margin (not the min doc_id)."""
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.dedup import dedup_best_rep
    from pixcrawler_ray.stages.textstats import quality_repetition

    # three near-identical docs (one shingle-set), plus unrelated docs.
    # doc 12 carries extra stopword-rich text -> highest margin.
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = {
        10: base,
        11: base,
        12: base + " and the of to in is",
        20: "totally different content here about rockets",
        21: "yet another unrelated document on gardening",
    }
    sf = tmp_path / "planted"
    sf.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(sorted(docs), type=pa.int64()),
                  "text": pa.array([docs[k] for k in sorted(docs)])}),
        str(sf / "documents.parquet"))
    kept = set(dedup_best_rep(str(sf), threshold=0.5).to_pandas()["doc_id"])
    m = (quality_repetition(str(sf)).to_pandas()
         .set_index("doc_id")["lr_margin"])
    assert m[12] > m[10] == m[11]
    assert kept == {12, 20, 21}, kept


def test_semdedup_matches_serial_spec(ray_session, sf_tiny):
    """The distributed SemDeDup sweep must equal the plain serial greedy:
    same seeded centroids, ascending-centroid-similarity visit order, drop
    at cosine >= eps against the kept set."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.dedup import semdedup
    from pixcrawler_ray.stages.simsearch import IVFIndex, _sample_embeddings

    eps, n_clusters = 0.4, 16
    out = (semdedup(sf_tiny, n_clusters=n_clusters, eps=eps,
                    sweep_block=7)   # tiny blocks: exercise the chain
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    t = pq.read_table(f"{sf_tiny}/embeddings.parquet").to_pandas()
    idx = IVFIndex.fit(_sample_embeddings(sf_tiny, 4096), n_clusters, seed=7)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = mat @ idx.centroids.T
    cid = np.argmax(sims, axis=1)
    cs = np.rint(sims[np.arange(len(cid)), cid] * 1e6).astype(np.int64)
    ids = t["vec_id"].to_numpy()

    kept = {}
    for c in np.unique(cid):
        rows = np.flatnonzero(cid == c)
        order = rows[np.lexsort((ids[rows], cs[rows]))]
        chosen = []
        for r in order:
            if not chosen or (mat[r] @ mat[chosen].T).max() < eps:
                chosen.append(r)
                kept[ids[r]] = True
            else:
                kept[ids[r]] = False

    exp = pd.DataFrame({
        "vec_id": ids, "cluster_id": cid.astype(np.int64),
        "cent_sim_e6": cs,
        "kept": [kept[i] for i in ids],
    }).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)
    assert (~exp["kept"]).sum() > 0     # the corpus plants embedding dups


def test_kmeans_fit_full_matches_serial_and_is_exact(ray_session, sf_tiny):
    """Integer-quantized Lloyd must be BIT-identical to the serial replay
    (associative int sums => parallelism cannot change the result), at two
    bucket widths."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.simsearch import (_normalize,
                                                 _sample_embeddings,
                                                 kmeans_fit_full)

    k, iters, Q = 8, 3, 1 << 20
    asg_ds, cent = kmeans_fit_full(sf_tiny, k=k, iters=iters)
    asg = (asg_ds.to_pandas().sort_values("vec_id")
           .reset_index(drop=True))

    # serial replay
    rng = np.random.default_rng(7)
    sample = _normalize(_sample_embeddings(sf_tiny, 4096))
    c = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    t = pq.read_table(f"{sf_tiny}/embeddings.parquet").to_pandas()
    m = np.stack([np.asarray(v, dtype=np.float64) for v in t["embedding"]])
    _n = np.linalg.norm(m, axis=1, keepdims=True)
    _n[_n == 0] = 1.0
    m = m / _n
    qm = np.rint(m * Q).astype(np.int64)
    for _ in range(iters):
        qc = np.rint(c * Q).astype(np.int64)
        cid = np.argmax(qm @ qc.T, axis=1)   # integer dots, the exact spec
        for j in range(k):
            sel = cid == j
            if sel.any():
                v = (qm[sel].sum(axis=0).astype(np.float64) / Q) / sel.sum()
                n = np.sqrt((v * v).sum())
                c[j] = v / (n if n > 0 else 1.0)
    exp_cid = np.argmax(qm @ np.rint(c * Q).astype(np.int64).T, axis=1)

    assert np.array_equal(cent, c)            # bit-identical centroids
    exp = pd.DataFrame({"vec_id": t["vec_id"].to_numpy().astype(np.int64),
                        "cluster_id": exp_cid.astype(np.int64)}) \
        .sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(asg, exp)

    asg2_ds, cent2 = kmeans_fit_full(sf_tiny, k=k, iters=iters,
                                     num_buckets=2)
    assert np.array_equal(cent, cent2)


def test_logreg_train_quality_exact_and_separates(ray_session, sf_tiny):
    """The distributed trainer must be BIT-identical to the serial GD
    replay (int64-quantized per-sample gradients sum associatively) and
    must beat the majority-class base rate by a real margin."""
    import numpy as np
    import pandas as pd

    from pixcrawler_ray.stages.classify import (FEATURE_SCALE, FEATURES,
                                                GRAD_Q,
                                                logreg_train_quality)
    from pixcrawler_ray.stages.textstats import quality_repetition

    iters, lr = 20, 10.0
    ds, w = logreg_train_quality(sf_tiny, iters=iters, lr=lr)
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)

    # serial replay
    stats = (quality_repetition(sf_tiny).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    x = stats[list(FEATURES)].to_numpy(dtype=np.float64) / FEATURE_SCALE
    x = np.concatenate([x, np.ones((len(x), 1))], axis=1)
    y = stats["lr_ok"].to_numpy().astype(np.float64)
    wv = np.zeros(x.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ wv)))
        qg = np.rint((p - y)[:, None] * x * GRAD_Q).astype(np.int64)
        wv = wv - lr * (qg.sum(axis=0).astype(np.float64) / GRAD_Q) / len(x)
    assert np.array_equal(w, wv)                     # bit-identical

    # same result at another bucket width
    _, w2 = logreg_train_quality(sf_tiny, iters=iters, lr=lr, num_buckets=2)
    assert np.array_equal(w, w2)

    # full-strength run separates better than always-majority
    ds3, _ = logreg_train_quality(sf_tiny)
    df3 = ds3.to_pandas()
    base = max(df3["label"].mean(), 1 - df3["label"].mean())
    acc = (df3["label"] == df3["pred"]).mean()
    assert acc >= base + 0.05


def test_dsir_scores_matches_serial_and_separates(ray_session, sf_tiny):
    """The DSIR hashed-ngram importance scorer must equal the serial
    replay exactly (integer dot against the quantized log-ratio vector)
    and must rank the target slice above the rest on average."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from pixcrawler_ray.functions.hashing import hash64
    from pixcrawler_ray.stages.classify import (DSIR_FEATS, DSIR_RATIO_Q,
                                                dsir_scores)

    out = (dsir_scores(sf_tiny).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    docs = pq.read_table(f"{sf_tiny}/documents.parquet",
                         columns=["doc_id", "lang", "text"]).to_pandas()
    feats = []
    for txt in docs["text"]:
        ws = [x for x in (txt or "").split(" ") if x]
        v = np.zeros(DSIR_FEATS, dtype=np.int64)
        for wd in ws:
            v[hash64(wd) % DSIR_FEATS] += 1
        feats.append(v)
    m = np.stack(feats)
    is_t = (docs["lang"] == "en").to_numpy()
    ct = m[is_t].sum(axis=0).astype(np.float64) + 1.0
    cr = m.sum(axis=0).astype(np.float64) + 1.0
    ratio_fp = np.rint((np.log(ct / ct.sum()) - np.log(cr / cr.sum()))
                       * DSIR_RATIO_Q).astype(np.int64)
    s = m @ ratio_fp
    exp = pd.DataFrame({"doc_id": docs["doc_id"].to_numpy(np.int64),
                        "lang": docs["lang"], "score_fp": s,
                        "selected": s > 0}) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, exp)
    assert (out.loc[out["lang"] == "en", "score_fp"].mean()
            > out.loc[out["lang"] != "en", "score_fp"].mean())


def test_bucketed_join_outer_matches_pandas(sf_tiny):
    """Full-outer bucketed join == pandas outer merge: matched rows join,
    unmatched rows from BOTH sides survive with NULL padding restored to
    typed integers."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pixcrawler_ray.stages.shuffle import bucketed_join

    l = pd.DataFrame({"k": np.arange(0, 80, 2, dtype=np.int64),
                      "lv": np.arange(40, dtype=np.int64) * 10})
    r = pd.DataFrame({"k": np.arange(0, 120, 3, dtype=np.int64),
                      "rv": np.arange(40, dtype=np.int64) * 7})
    ds = bucketed_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                       how="outer", num_buckets=5)
    sch = ds.schema()
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    exp = (l.merge(r, on="k", how="outer").sort_values("k")
           .reset_index(drop=True))
    assert len(got) == len(exp)
    for c in ("lv", "rv"):
        ge = got[c].fillna(-1).astype(np.int64)
        ee = exp[c].fillna(-1).astype(np.int64)
        assert (ge.to_numpy() == ee.to_numpy()).all()
    # NaN pads restored as typed NULLs at the Arrow layer (pandas widens
    # nullable int64 to float64 on to_pandas — that is a pandas property)
    assert str(dict(zip(sch.names, sch.types))["lv"]) == "int64"


def test_cluster_split_no_leakage_and_covers_corpus(sf_tiny):
    """Leakage-safe split invariants: (1) every document is assigned exactly
    once; (2) both endpoints of every VERIFIED near-dup pair land in the same
    split (the whole point — paraphrases must not straddle the eval
    boundary); (3) the heldout fraction tracks heldout_pct over cluster
    labels; (4) singletons carry their own id as label."""
    import pyarrow.parquet as pq
    from pixcrawler_ray.stages.dedup import (
        dedup_cluster_split, minhash_verified_pairs)

    out = dedup_cluster_split(sf_tiny, threshold=0.8,
                              heldout_pct=10).to_pandas()
    docs = pq.read_table(f"{sf_tiny}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    assert sorted(out.doc_id) == sorted(docs.doc_id)
    assert set(out.split) <= {"train", "heldout"}

    split_of = dict(zip(out.doc_id, out.split))
    label_of = dict(zip(out.doc_id, out.label))
    pairs = minhash_verified_pairs(sf_tiny, threshold=0.8).to_pandas()
    for a, b in zip(pairs.doc_a, pairs.doc_b):
        assert split_of[a] == split_of[b], (a, b)
        assert label_of[a] == label_of[b], (a, b)

    in_pairs = set(pairs.doc_a) | set(pairs.doc_b)
    singles = out[~out.doc_id.isin(in_pairs)]
    assert (singles.label == singles.doc_id).all()

    # fraction check over distinct labels (the hash domain), loose bound
    lab = out.drop_duplicates("label")
    frac = (lab.split == "heldout").mean()
    assert 0.02 < frac < 0.25, frac


def test_resolve_redirects_matches_serial_walk(ray_session, sf_tiny):
    """Pointer doubling must resolve every chain to the same (final, hops,
    loop) as the serial per-node walk, at any bucket count, and within
    ceil(log2(max_depth)) + 1 rounds (max_rounds=2 suffices for depth-3
    chains: after round 1 every pointer is <= 1 hop from terminal)."""
    import pandas as pd
    from pixcrawler_ray.stages.urlnorm import resolve_redirects

    def walk(i):
        cur, hops = i, 0
        while True:
            if cur % 97 == 13:
                return cur, hops, True
            if cur % 8 in (1, 4, 7) and cur >= 3:
                cur, hops = cur - 3, hops + 1
            else:
                return cur, hops, False

    got = (resolve_redirects(sf_tiny).to_pandas()
           .sort_values("doc_id").reset_index(drop=True)
           .astype({"is_loop": bool}))
    n = len(got)
    exp = pd.DataFrame([(i, *walk(i)) for i in range(n)],
                       columns=["doc_id", "final_id", "n_hops", "is_loop"])
    pd.testing.assert_frame_equal(got, exp)
    assert got.n_hops.max() == 3 and got.is_loop.any()
    # logarithmic round count: depth-3 chains resolve within 2 doubling
    # rounds (1 -> 2 -> 4 hops of reach)
    fast = (resolve_redirects(sf_tiny, num_buckets=5, max_rounds=2)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
            .astype({"is_loop": bool}))
    pd.testing.assert_frame_equal(fast, exp)


def test_hll_sketch_error_bound_and_merge_invariance(ray_session, sf_tiny):
    """HLL: per-host estimates within sketch error of exact COUNT
    DISTINCT at two bucket counts (merge invariance), and the raw-HLL
    estimator path within 3 sigma on a 100k-distinct synthetic stream."""
    import numpy as np
    import pandas as pd

    from pixcrawler_ray import corpus
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.sketch import (HLL_P, hll_estimate_frame,
                                              hll_distinct_urls_per_host,
                                              hll_partial)

    a = (hll_distinct_urls_per_host(sf_tiny, num_buckets=4).to_pandas()
         .sort_values("host").reset_index(drop=True))
    b = (hll_distinct_urls_per_host(sf_tiny, num_buckets=11).to_pandas()
         .sort_values("host").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)   # register max merge = invariant

    ids = (read_table(sf_tiny, "documents", columns=["doc_id"])
           .to_pandas()["doc_id"].to_numpy())
    url, host = corpus.urls_hosts_arrow(ids)
    truth = (pd.DataFrame({"host": host.to_pylist(),
                           "url": url.to_pylist()})
             .groupby("host")["url"].nunique())
    j = a.set_index("host").join(truth.rename("true_n"))
    rel = (j["n_distinct_est"] - j["true_n"]).abs() / j["true_n"]
    assert (rel < 0.15).all(), rel.max()   # linear-counting regime

    # raw-HLL regime: 100k distinct values, deterministic hash stream
    rng = np.random.default_rng(7)
    hashes = rng.integers(0, 2**64, size=100_000, dtype=np.uint64)
    part = hll_partial(np.zeros(len(hashes), dtype=object), hashes)
    est = hll_estimate_frame(part)
    m = 1 << HLL_P
    sigma = 1.04 / np.sqrt(m)
    n_uniq = len(np.unique(hashes))
    assert est.method.iloc[0] == "hll"
    assert abs(int(est.n_distinct_est.iloc[0]) - n_uniq) < 3 * sigma * n_uniq
    # splitting the same stream into partials merges to the SAME estimate
    p1 = hll_partial(np.zeros(60_000, dtype=object), hashes[:60_000])
    p2 = hll_partial(np.zeros(40_000, dtype=object), hashes[60_000:])
    est2 = hll_estimate_frame(pd.concat([p1, p2], ignore_index=True))
    assert int(est2.n_distinct_est.iloc[0]) == int(est.n_distinct_est.iloc[0])


def test_cms_sketch_guarantees(ray_session, sf_tiny):
    """Count-Min invariants: every probe estimate >= its exact count; each
    hash row's cell mass == the total token count; rerun-deterministic."""
    import numpy as np
    import pyarrow.parquet as pq

    from pixcrawler_ray.stages.sketch import CMS_D, cms_term_sketch

    out = cms_term_sketch(sf_tiny).to_pandas()
    sk = out[out["section"] == "sketch"]
    est = out[out["section"] == "est"].set_index("term")["cnt"]

    docs = pq.read_table(f"{sf_tiny}/documents.parquet",
                         columns=["text"]).to_pandas()
    words = docs["text"].str.split().explode().dropna()
    words = words[words.str.len() > 0]
    exact = words.value_counts()
    total = int(len(words))

    # each of the d rows conserves total occurrence mass
    row_mass = sk.groupby("j")["cnt"].sum()
    assert len(row_mass) == CMS_D and (row_mass == total).all()

    # CMS one-sided error: estimate never undercounts
    for term, e in est.items():
        assert e >= int(exact.get(term, 0))
    # at least one probe present in the corpus estimates within 5% of exact
    present = [t for t in est.index if exact.get(t, 0) > 0]
    assert present
    errs = [est[t] - exact[t] for t in present]
    assert min(errs) >= 0 and min(errs) <= max(1, 0.05 * max(exact))

    again = cms_term_sketch(sf_tiny).to_pandas()
    assert np.array_equal(
        out.sort_values(["section", "term", "j", "cell"]).to_numpy(),
        again.sort_values(["section", "term", "j", "cell"]).to_numpy())


def test_sitemap_roundtrip_and_bucket_invariance(ray_session, sf_tiny):
    """Every doc appears exactly once across all host sitemaps; parsed
    fields equal the synthesis arithmetic; result invariant to exchange
    width; XML bodies are well-formed urlsets."""
    import numpy as np
    import pyarrow.parquet as pq

    from pixcrawler_ray import corpus
    from pixcrawler_ray.stages.robots import (sitemap_lastmod_priority,
                                              sitemap_parse, sitemap_xml)

    ids = pq.read_table(f"{sf_tiny}/documents.parquet",
                        columns=["doc_id"]).column("doc_id").to_numpy()
    out = (sitemap_parse(sf_tiny).to_pandas()
           .sort_values("url").reset_index(drop=True))
    assert len(out) == len(ids)

    want_urls = np.sort(corpus.urls_for(ids))
    assert (out["url"].to_numpy() == want_urls).all()
    lastmod, pri = sitemap_lastmod_priority(ids)
    order = np.argsort(corpus.urls_for(ids))
    assert (out["lastmod"].to_numpy() == lastmod[order]).all()
    assert (out["priority"].to_numpy() == pri[order]).all()
    hid = corpus.host_ids(ids)
    assert (out["host_id"].to_numpy() == hid[order]).all()

    out2 = (sitemap_parse(sf_tiny, num_buckets=3).to_pandas()
            .sort_values("url").reset_index(drop=True))
    assert out.equals(out2)

    xml = sitemap_xml(sf_tiny).to_pandas()
    assert xml["sitemap_xml"].str.startswith(
        '<?xml version="1.0" encoding="UTF-8"?><urlset>').all()
    assert xml["sitemap_xml"].str.endswith("</urlset>").all()
    assert int(xml["sitemap_xml"].str.count("<loc>").sum()) == len(ids)


def test_trustrank_conserves_and_concentrates_on_seeds(sf_tiny):
    """TrustRank: total mass invariant every round; the teleport residue
    lands only on the closed-form seed set, so the mean seed mass must
    exceed the mean non-seed mass (trust flows outward from seeds)."""
    from pixcrawler_ray.stages.graph import (INIT_MASS, TRUST_SEED_MOD,
                                             trustrank_mass)

    t = trustrank_mass(sf_tiny, rounds=3).to_pandas()
    assert t["mass"].sum() == len(t) * INIT_MASS
    seed = t["doc_id"] % TRUST_SEED_MOD == 0
    assert t.loc[seed, "mass"].mean() > t.loc[~seed, "mass"].mean()


def test_ai_keyword_client_retry_backoff_fallback():
    """ST5 client semantics in virtual time: deterministic output, pinned
    retry/backoff schedule, fallback-to-templates on exhaustion, and
    KeywordGenerator protocol conformance."""
    from pixcrawler_ray.base import KeywordGenerator
    from pixcrawler_ray.functions.aikeywords import (
        AI_LATENCY_BASE_S, BACKOFF_BASE_S, LocalLMKeywordClient)
    from pixcrawler_ray.functions.variations import generate_keywords

    a, b = LocalLMKeywordClient(), LocalLMKeywordClient()
    assert isinstance(a, KeywordGenerator)
    k1, k2 = a.generate("cats", 5), b.generate("cats", 5)
    assert k1 == k2 and len(k1) == 5
    assert all(kw.startswith("cats ") for kw in k1)
    assert a.stats["per_category"]["cats"]["attempts"] >= 1
    # virtual latency: every attempt costs >= the AI base latency
    per = a.stats["per_category"]["cats"]
    assert per["virtual_seconds"] >= per["attempts"] * AI_LATENCY_BASE_S
    # retries (if any) add exponential backoff on top
    if per["attempts"] > 1:
        assert per["virtual_seconds"] >= (
            per["attempts"] * AI_LATENCY_BASE_S + BACKOFF_BASE_S)

    # fail_mod=1: every attempt fails -> exhaustion -> template fallback
    c = LocalLMKeywordClient(fail_mod=1)
    out = c.generate("dogs", 4)
    assert c.stats["fallbacks"] == 1
    assert c.stats["per_category"]["dogs"]["fallback"] is True
    assert c.stats["per_category"]["dogs"]["attempts"] == 4  # 1 + 3 retries
    assert out == generate_keywords("dogs")[:4]


def test_crawl_config_ai_mode_plan():
    """mode 'ai' follows the same union rules as enabled, driven by the
    LM client (fallback keeps the plan total even when flaky)."""
    from pixcrawler_ray.stages.expand import CrawlConfig

    cfg = CrawlConfig.from_dict({
        "dataset_name": "v",
        "categories": {"cats": [], "dogs": ["good dog"]},
        "options": {"keyword_generation": "ai"}})
    plan = cfg.keyword_plan()
    assert plan["cats"]["generation_occurred"]
    assert len(plan["cats"]["keywords"]) > 0
    assert plan["dogs"]["keywords"][0] == "good dog"
    assert len(plan["dogs"]["keywords"]) > 1  # union added generated ones
