"""Robots gating — frontier URLs against per-host disallow rules.

The reference has NO robots.txt handling (verified by grep, SURVEY §0); the
north rule adds it. Rules are the synthetic per-host table from
``corpus.robots_table`` (host ``h{k}`` disallows ``/private/`` iff
``k % 20 == 1``). Disallowed URLs are tagged, not silently dropped — they
become ``status = 403`` rows in the metrics/lineage trail, mirroring how the
reference records permanent errors instead of retrying them
(``builder/_exceptions.py:216-240``).

The rule set is host-keyed and tiny relative to the frontier, so it is a
broadcast lookup inside a stateless ``map_batches`` (no shuffle); in the
streaming scheduler the same check is cached inside the politeness shard
actors (one robots fetch per host, like a real crawler).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pixcrawler_ray import corpus


def _host_ids_from_urls(urls: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Parse ``h{k}.example.com`` back to k — one Arrow regex kernel."""
    import pyarrow.compute as pc

    # urls look like http://h123.example.com/doc/45
    m = pc.extract_regex(urls, r"//h(?P<hid>\d+)\.")
    return pc.cast(pc.struct_field(m, "hid"), pa.int64()).to_numpy()


def robots_mask_batch(batch: pa.Table) -> pa.Table:
    """Append ``robots_allowed: bool`` to a frontier batch."""
    import pyarrow.compute as pc

    if batch.num_rows == 0:
        return batch.append_column("robots_allowed",
                                   pa.array([], type=pa.bool_()))
    if "host_id" in batch.column_names:      # frontier carries the int key
        hid = batch.column("host_id").to_numpy()
    else:
        hid = _host_ids_from_urls(batch.column("url"))
    disallow_host = corpus.robots_disallowed_host(hid)
    is_private = pc.match_substring(batch.column("url"), "/private/")
    allowed = ~(disallow_host
                & is_private.to_numpy(zero_copy_only=False))
    return batch.append_column("robots_allowed", pa.array(allowed))


def apply_robots(frontier_ds, keep_blocked: bool = False):
    """Tag (and by default drop) robots-disallowed frontier rows."""
    ds = frontier_ds.map_batches(robots_mask_batch, batch_format="pyarrow")
    if keep_blocked:
        return ds
    return ds.map_batches(
        lambda t: t.filter(t.column("robots_allowed")).drop_columns(
            ["robots_allowed"]),
        batch_format="pyarrow",
    )
