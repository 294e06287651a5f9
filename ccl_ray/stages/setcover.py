"""Greedy maximum-coverage document selection (distributed set cover).

Training-data use: pick k documents that together cover as much of the
corpus vocabulary as possible — the classic (1 − 1/e)-approximate greedy
(Nemhauser-Wolsey-Fisher submodular maximization), made distributed. The
greedy choice is fully deterministic (gain DESC, doc_id ASC), so a k-round
unrolled SQL twin replays the identical selection.

Shape per round (pairs sharded ONCE by hash(term), pinned in plasma):
  1. GAIN — per term-shard: drop covered terms (Arrow is_in against the
     shard's own covered-term array; covered terms live on the shard that
     owns them, never broadcast), count remaining pairs per doc
     (np.unique), route (doc, gain) partials by hash(doc).
  2. ARGMAX — per doc-shard reducer: sum gains across term shards
     (lexsort + reduceat), emit its best (gain DESC, doc ASC) candidate;
     the driver picks among P candidates — only 2·P scalars ever leave
     the cluster per round.
  3. UPDATE — each term shard appends the winner's uncovered terms to its
     covered array and reports how many were new (covered_total is the
     running sum). A doc with zero uncovered terms has no gain row (same
     as the SQL twin's WHERE-filtered GROUP BY), so picked docs never
     re-win and the loop stops early when the corpus is fully covered.

Scale note: per-round driver traffic is O(P); shard state (pairs +
covered) stays put across rounds. Rounds are inherently sequential —
that is the greedy algorithm, not an engine artifact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from ccl_ray.config import EngineConfig
from ccl_ray.functions.hashing import hash_part_np
from ccl_ray.stages.text import TOKEN_RE


@ray.remote
def _explode_block(block: pa.Table, P: int):
    """Distinct (doc_id, term) pairs of one doc block, split by hash(term).
    Each doc's text is one row, so a per-row set() already makes pairs
    globally distinct."""
    import re

    tok = re.compile(TOKEN_RE)
    doc_ids = block.column("doc_id").to_numpy(zero_copy_only=False)
    texts = block.column("text").to_pylist()
    d_out, t_out = [], []
    for d, t in zip(doc_ids, texts):
        ws = sorted(set(tok.findall((t or "").lower())))
        d_out.extend([int(d)] * len(ws))
        t_out.extend(ws)
    if not t_out:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "term": pa.array([], pa.string())})
        return tuple(empty for _ in range(P)) if P > 1 else empty
    tbl = pa.table({"doc_id": pa.array(d_out, pa.int64()),
                    "term": pa.array(t_out, pa.string())})
    parts = hash_part_np(tbl.column("term"), pa.string(), P)
    out = tuple(tbl.filter(pa.array(parts == p)) for p in range(P))
    return out if P > 1 else out[0]


@ray.remote
def _concat_shard(*pieces: pa.Table) -> pa.Table:
    return pa.concat_tables(pieces).combine_chunks()


@ray.remote
def _gain_partials(shard: pa.Table, covered: pa.Array, P: int):
    """Uncovered per-doc gains of one term shard, routed by hash(doc)."""
    if len(covered):
        shard = shard.filter(
            pc.invert(pc.is_in(shard.column("term"), value_set=covered))
        )
    docs = shard.column("doc_id").to_numpy(zero_copy_only=False)
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    if not len(docs):
        return tuple(empty for _ in range(P)) if P > 1 else empty
    u, c = np.unique(docs, return_counts=True)
    parts = hash_part_np(pa.array(u, pa.int64()), pa.int64(), P)
    order = np.argsort(parts, kind="stable")
    u, c, parts = u[order], c[order].astype(np.int64), parts[order]
    bounds = np.searchsorted(parts, np.arange(P + 1))
    out = tuple((u[bounds[p]: bounds[p + 1]], c[bounds[p]: bounds[p + 1]])
                for p in range(P))
    return out if P > 1 else out[0]


@ray.remote
def _argmax_candidate(q: int, P: int, *gain_objs):
    """Best (gain DESC, doc ASC) among this reducer's docs; None if none."""
    pieces = [go[q] for go in gain_objs] if P > 1 else list(gain_objs)
    d = np.concatenate([p[0] for p in pieces]) if pieces else np.empty(0, np.int64)
    if not d.size:
        return None
    g = np.concatenate([p[1] for p in pieces])
    order = np.argsort(d, kind="stable")
    d, g = d[order], g[order]
    new = np.empty(len(d), bool)
    new[0] = True
    new[1:] = d[1:] != d[:-1]
    starts = np.nonzero(new)[0]
    docs = d[starts]
    gains = np.add.reduceat(g, starts)
    best = np.lexsort((docs, -gains))[0]
    return int(gains[best]), int(docs[best])


def _chunks(a) -> list[pa.Array]:
    return list(a.chunks) if isinstance(a, pa.ChunkedArray) else [a]


@ray.remote(num_returns=2)
def _cover_winner(shard: pa.Table, covered: pa.Array, winner_doc: int):
    """(new covered array, #terms newly covered) after taking winner_doc.
    ``covered`` stays a flat Array so it can feed is_in directly next round."""
    wt = shard.filter(pc.equal(shard.column("doc_id"), winner_doc)).column("term")
    if len(covered):
        wt = wt.filter(pc.invert(pc.is_in(wt, value_set=covered)))
    merged = pa.concat_arrays(_chunks(covered) + _chunks(wt))
    return merged, len(wt)


def greedy_max_coverage(
    docs,
    k: int,
    *,
    cfg: EngineConfig | None = None,
) -> pa.Table:
    """k greedy rounds of maximum vocabulary coverage over ``docs``
    (columns doc_id, text). Returns (round, doc_id, gain, covered_total)
    with round 1-based; fewer than k rows when the vocabulary is exhausted
    first (the SQL twin's empty-pick CTE drops the same rounds)."""
    cfg = cfg or EngineConfig()
    P = cfg.num_partitions

    blocks = docs.select_columns(["doc_id", "text"]).to_arrow_refs()
    # fanout: num_returns=P splits each block's tuple into P separate refs,
    # so shard q's concat pulls only its own pieces (no driver round-trip)
    if P > 1:
        pieces = [
            _explode_block.options(num_returns=P).remote(b, P) for b in blocks
        ]
        shards = [_concat_shard.remote(*[pl[p] for pl in pieces]) for p in range(P)]
    else:
        shards = [_concat_shard.remote(*[_explode_block.remote(b, 1) for b in blocks])]

    covered = [ray.put(pa.array([], pa.string())) for _ in range(P)]
    out_rounds: list[tuple[int, int, int, int]] = []
    covered_total = 0
    for rnd in range(1, k + 1):
        if P > 1:
            gain_pieces = [
                _gain_partials.options(num_returns=P).remote(shards[p], covered[p], P)
                for p in range(P)
            ]
            cands = ray.get(
                [
                    _argmax_candidate.remote(q, 1, *[gp[q] for gp in gain_pieces])
                    for q in range(P)
                ]
            )
        else:
            gains = [_gain_partials.remote(shards[0], covered[0], 1)]
            cands = ray.get([_argmax_candidate.remote(0, 1, *gains)])
        cands = [c for c in cands if c is not None]
        if not cands:
            break  # vocabulary exhausted: the SQL twin drops the round too
        best_gain, best_doc = max(cands, key=lambda t: (t[0], -t[1]))
        upd = [_cover_winner.remote(shards[p], covered[p], best_doc) for p in range(P)]
        covered = [u[0] for u in upd]
        covered_total += int(sum(ray.get([u[1] for u in upd])))
        out_rounds.append((rnd, best_doc, best_gain, covered_total))

    return pa.table(
        {
            "round": pa.array([r[0] for r in out_rounds], pa.int64()),
            "doc_id": pa.array([r[1] for r in out_rounds], pa.int64()),
            "gain": pa.array([r[2] for r in out_rounds], pa.int64()),
            "covered_total": pa.array([r[3] for r in out_rounds], pa.int64()),
        }
    )
