"""Concat-and-chunk sequence packing via a distributed ordered prefix sum.

The standard LLM pre-training layout concatenates all documents in a fixed
order into one token stream and slices it into fixed-size context windows
("packs"); a document is described by the window its first token lands in
and the window its last token lands in. The primitive underneath is a
GLOBAL ordered prefix sum of per-document token counts — an operator the
engine did not have (running_window's cumsums are per-key, not global).

Distributed shape (no driver data path beyond P scalars):
1. the (key, count) projection is materialized ONCE — it is the narrow
   16-byte/row projection of a possibly huge corpus (token counting over
   text runs exactly once), and three consumers reuse it: the key-range
   aggregate, the per-range totals pass, and the final shuffle;
2. rows route to RANGE partitions (part = (key - min) // ceil(span / P)) —
   ranges, not hashes, because a prefix sum needs partitions that are
   contiguous in key order;
3. a combiner-style partial aggregate computes each range's token total;
   the P totals come to the driver as P scalars and exclusive-scan into
   per-range offsets (the only sequential step — O(P));
4. one groupby(part) shuffle; each range task sorts its rows by key,
   local-cumsums, adds its range offset, and emits
   (key, count, start_off, first_pack, last_pack).

Exactly the SQL ``SUM(n) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)``
semantics, so the gate twin is a plain window query. Zero-token documents
are excluded (they occupy no window; both sides filter n > 0).

At 10^12-turn scale: the shuffled payload is three int64 columns per
document, partition count follows the cluster via resolve_partitions, and
the token stream itself never moves — only its counts do. Reference
analog: none (the reference has no ordered global scan); this generalizes
its per-slice row-major scan order (ccl_marker.py's nested loops) to a
distributed corpus.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import resolve_partitions


def chunk_pack(
    doc_tokens: "rd.Dataset",
    *,
    key: str = "doc_id",
    val: str = "n_tokens",
    cap: int = 2048,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """(key, val, start_off, first_pack, last_pack) for every row with
    ``val`` > 0, where start_off is the exact global prefix sum of ``val``
    in ascending ``key`` order and first/last_pack are the ``cap``-sized
    window indices of the row's first and last token. ``key`` must be a
    unique integer column."""
    assert cap > 0
    P = resolve_partitions(num_partitions)
    in_schema = doc_tokens.schema()
    key_type = dict(zip(in_schema.names, in_schema.types))[key]
    out_schema = pa.schema(
        [
            (key, key_type),
            (val, pa.int64()),
            ("start_off", pa.int64()),
            ("first_pack", pa.int64()),
            ("last_pack", pa.int64()),
        ]
    )

    def keep_pos(batch: pa.Table) -> pa.Table:
        n = batch.column(val).cast(pa.int64())
        t = pa.table({key: batch.column(key), val: n})
        import pyarrow.compute as pc

        return t.filter(pc.greater(n, 0))

    # the narrow projection is materialized once; the expensive upstream
    # (token counting over the full text) never runs twice
    narrow = doc_tokens.map_batches(keep_pos, batch_format="pyarrow").materialize()
    if narrow.count() == 0:
        return rd.from_arrow(out_schema.empty_table())
    kmin = int(narrow.min(key))
    kmax = int(narrow.max(key))
    width = max(1, -((kmin - kmax - 1) // P))  # ceil(span / P), overflow-safe

    def route(batch: pa.Table) -> pa.Table:
        k = batch.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        part = np.minimum((k - kmin) // width, P - 1).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    routed = narrow.map_batches(route, batch_format="pyarrow")

    from ccl_ray.stages.aggregates import partial_sum_agg

    # P scalars to the driver — the exclusive scan is the one sequential step
    totals = partial_sum_agg(routed, ["part"], {val: "tot"}).take_all()
    per_part = np.zeros(P, np.int64)
    for r in totals:
        per_part[int(r["part"])] = int(r["tot"])
    offsets = np.concatenate(([0], np.cumsum(per_part)[:-1]))

    def pack_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        part = int(df["part"].iloc[0])
        k = df[key].values.astype(np.int64)
        n = df[val].values.astype(np.int64)
        order = np.argsort(k, kind="stable")
        k, n = k[order], n[order]
        assert not (k[1:] == k[:-1]).any(), f"chunk_pack: duplicate {key}"
        csum = np.cumsum(n)
        start = offsets[part] + csum - n
        return pa.table(
            {
                key: pa.array(k).cast(key_type),
                val: pa.array(n),
                "start_off": pa.array(start),
                "first_pack": pa.array(start // cap),
                "last_pack": pa.array((start + n - 1) // cap),
            }
        )

    return routed.groupby("part").map_groups(pack_part, batch_format="pandas")


def doc_chunks(
    doc_tokens: "rd.Dataset",
    *,
    max_tokens: int = 512,
    stride: int = 384,
    key: str = "doc_id",
    val: str = "n_tokens",
) -> "rd.Dataset":
    """(doc_id, seg_idx, tok_start, tok_len): context-window chunking of
    overlong documents — segment i starts at i·stride while that is
    inside the document, length min(max_tokens, n − start), so adjacent
    segments overlap by max_tokens − stride. Token-free docs emit no
    segments. Pure per-batch arithmetic on the token-count table (one
    np.repeat fan-out, no exchange, no state) — the streaming-safe shape
    for sharding 100 TB of documents into training windows."""
    import numpy as np
    import pyarrow as pa

    def expand(t: "pa.Table") -> "pa.Table":
        n = t.column(val).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = t.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        k = np.where(n > 0, -(-n // stride), 0)
        rep_id = np.repeat(ids, k)
        rep_n = np.repeat(n, k)
        total = int(k.sum())
        ends = np.cumsum(k)
        seg = np.arange(total) - np.repeat(ends - k, k)
        start = seg * stride
        return pa.table(
            {
                "doc_id": pa.array(rep_id),
                "seg_idx": pa.array(seg.astype(np.int64)),
                "tok_start": pa.array(start.astype(np.int64)),
                "tok_len": pa.array(
                    np.minimum(max_tokens, rep_n - start).astype(np.int64)
                ),
            }
        )

    return doc_tokens.map_batches(expand, batch_format="pyarrow")
