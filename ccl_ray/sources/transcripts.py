"""Transcripts: the engine's authoritative input shape (BASELINE.json
input_hint) — generator, reader, vid derivation and edge builder.

Schema: conv_id:string, turn_idx:int32, role:string, text:string,
tool:string (nullable), ts:timestamp[us].

Graph derivation (north_star):
- vertices = turns; vid is derived from (conv_id, turn_idx) WITHOUT a global
  shuffle: conv ids of the form "c<digits>" parse to ``conv_num * 2^22 +
  turn_idx`` (collision-free for <4M turns/conv); arbitrary conv ids fall
  back to a stable 64-bit hash mix (collision probability n^2/2^64 —
  documented tradeoff vs. a dense-rank dictionary join).
- turn-adjacency edges (etype 0) need NO shuffle at all: turn indices are
  contiguous per conversation, so each row with turn_idx>0 emits the edge
  (vid(conv, turn-1), vid(conv, turn)) inside map_batches.
- shared-tool co-occurrence (etype 1) is star-expanded per (tool, salt)
  sub-group — O(k) edges instead of the O(k^2) clique, with salting so one
  hot tool never lands in a single task — and the sub-hubs of a tool are
  chained by a second, tiny groupby. Component structure is invariant to
  the salt count (tested).

The per-turn text invariant: (conv_id, turn_idx) -> vid is injective and
recorded in the vertices table, so per-turn text equality under stable
(conv_id, turn_idx) ordering is preserved through any relabeling.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.functions.hashing import hash_strings_np, stable_hash64_np

_TURN_BITS = 22  # up to 4M turns per conversation in the parsed fast path

TOOLS = ["search", "python", "browser", "calculator", "sql", "bash", "editor", "mail"]


def generate_transcripts(
    out_path: str,
    n_convs: int = 1000,
    mean_turns: int = 12,
    seed: int = 42,
    rows_per_file: int = 2_000_000,
) -> str:
    """Deterministic synthetic transcripts parquet (seeded, vectorized).

    Zipf-like tool distribution manufactures hub skew (FIXTURES.md F1).
    Returns the output path (a directory of part files).
    """
    rng = np.random.RandomState(seed)
    turns_per_conv = 2 + rng.poisson(mean_turns, n_convs).astype(np.int64)
    conv_num = np.repeat(np.arange(n_convs, dtype=np.int64), turns_per_conv)
    n = len(conv_num)
    starts = np.concatenate([[0], np.cumsum(turns_per_conv)[:-1]])
    turn_idx = (np.arange(n, dtype=np.int64) - starts[conv_num]).astype(np.int32)

    roles = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    tool_rank = rng.zipf(1.6, n) - 1
    has_tool = (roles == "assistant") & (rng.random(n) < 0.45)
    tool = np.where(has_tool, np.array(TOOLS, dtype=object)[np.minimum(tool_rank, len(TOOLS) - 1)], None)

    conv_id_vocab = np.char.add("c", np.char.zfill(np.arange(n_convs).astype("U10"), 6))
    conv_ids = conv_id_vocab[conv_num]
    h = stable_hash64_np(conv_num * np.int64(1 << _TURN_BITS) + turn_idx)
    # fully vectorized deterministic text: "t-<conv>-<turn>-<hash mod>"
    text = np.char.add(
        np.char.add(np.char.add("t-", conv_ids.astype("U10")), np.char.add("-", turn_idx.astype("U10"))),
        np.char.add("-", (h % np.uint64(99991)).astype("U10")),
    )

    epoch = np.datetime64("2024-01-01T00:00:00", "us")
    ts = epoch + (conv_num * 3_600_000_000 + turn_idx.astype(np.int64) * 30_000_000).astype(
        "timedelta64[us]"
    )

    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tool, pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    os.makedirs(out_path, exist_ok=True)
    for i in range(0, max(n, 1), rows_per_file):
        pq.write_table(table.slice(i, rows_per_file), os.path.join(out_path, f"part-{i // rows_per_file:04d}.parquet"))
    return out_path


def derive_vids(conv_id_arr, turn_idx_arr) -> np.ndarray:
    """Stable vid per (conv_id, turn_idx), fully vectorized (Arrow kernels).

    The scheme is chosen PER ROW (not per batch): 'c<digits>' ids (≤12
    digits, so the parse fits int64) parse to ``num * 2^TURN_BITS + turn``
    (collision-free, order-preserving); other ids use a stable hash mix.
    Per-row choice keeps the mapping a pure function of (conv_id, turn_idx)
    — independent of block boundaries — which the text-equality invariant
    requires. Cross-scheme collisions are p ~ n^2/2^62 (documented tradeoff
    vs a dense-rank dictionary join).

    Accepts a pyarrow (Chunked)Array for zero-copy regex/slice/cast, or any
    python/numpy string sequence.
    """
    import pyarrow.compute as pc

    turns = np.asarray(turn_idx_arr, dtype=np.int64)
    if isinstance(conv_id_arr, pa.ChunkedArray):
        arr = conv_id_arr.combine_chunks()
    elif isinstance(conv_id_arr, pa.Array):
        arr = conv_id_arr
    else:
        arr = pa.array(list(conv_id_arr), pa.string())
    fast = pc.fill_null(pc.match_substring_regex(arr, r"^c[0-9]{1,12}$"), False)
    fast_np = fast.to_numpy(zero_copy_only=False)
    nums = np.full(len(arr), -1, dtype=np.int64)
    if fast_np.any():
        nums[fast_np] = (
            pc.cast(pc.utf8_slice_codeunits(arr.filter(fast), 1), pa.int64()).to_numpy()
        )
    parsed = nums * np.int64(1 << _TURN_BITS) + turns
    fallback = ~fast_np
    if not fallback.any():
        return parsed
    fb = arr.filter(pa.array(fallback)).to_numpy(zero_copy_only=False)
    h = hash_strings_np(fb).astype(np.int64) & np.int64((1 << 62) - 1)
    hashed = stable_hash64_np((h + turns[fallback]).view(np.uint64)).astype(np.int64) & np.int64(
        (1 << 62) - 1
    )
    out = parsed
    out[fallback] = hashed
    return out


def read_transcripts(path: str) -> "rd.Dataset":
    return rd.read_parquet(path)


def transcript_vertices(ds: "rd.Dataset") -> "rd.Dataset":
    """vertices(vid, conv_id, turn_idx) — the text-invariant anchor table."""

    def to_v(batch: pa.Table) -> pa.Table:
        vids = derive_vids(
            batch.column("conv_id"),
            batch.column("turn_idx").to_numpy(zero_copy_only=False),
        )
        return pa.table(
            {
                "vid": pa.array(vids),
                "conv_id": batch.column("conv_id"),
                "turn_idx": batch.column("turn_idx"),
            }
        )

    return ds.map_batches(to_v, batch_format="pyarrow")


def adjacency_edges(ds: "rd.Dataset") -> "rd.Dataset":
    """Turn-adjacency edges — shuffle-free (vid computable from the row)."""

    def adj(batch: pa.Table) -> pa.Table:
        turns = batch.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        convs = batch.column("conv_id")
        vids = derive_vids(convs, turns)
        mask = turns > 0
        cur = vids[mask]
        # derive the PREVIOUS turn's vid through the same mapping — under
        # the hash fallback vid(conv, t-1) is NOT vid(conv, t) - 1
        if isinstance(convs, pa.ChunkedArray):
            convs = convs.combine_chunks()
        prev = derive_vids(convs.filter(pa.array(mask)), turns[mask] - 1)
        n = int(mask.sum())
        return pa.table(
            {
                "src": pa.array(np.minimum(prev, cur)),
                "dst": pa.array(np.maximum(prev, cur)),
                "etype": pa.array(np.zeros(n, dtype=np.int32)),
                "w": pa.array(np.ones(n, dtype=np.float64)),
            }
        )

    return ds.map_batches(adj, batch_format="pyarrow")


def _edge_tbl(src: np.ndarray, dst: np.ndarray, etype: int = 1) -> pa.Table:
    """Arrow out (even when empty): shuffle stages must see one block type."""
    n = len(src)
    return pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "etype": pa.array(np.full(n, etype, dtype=np.int32)),
            "w": pa.array(np.ones(n, dtype=np.float64)),
        }
    )


def shared_tool_edges(ds: "rd.Dataset", cfg: EngineConfig | None = None) -> "rd.Dataset":
    """Star-expanded shared-tool edges with salted sub-hubs (skew control)."""
    cfg = cfg or EngineConfig()
    n_salts = int(cfg.extra.get("tool_salts", 8))

    def keyed(batch: pa.Table) -> pa.Table:
        tool = batch.column("tool")
        mask = pa.compute.is_valid(tool)
        sub = batch.filter(mask)
        turns = sub.column("turn_idx").to_numpy(zero_copy_only=False).astype(np.int64)
        vids = derive_vids(sub.column("conv_id"), turns)
        salt = (stable_hash64_np(vids.view(np.uint64), seed=5) % np.uint64(n_salts)).astype(
            np.int64
        )
        return pa.table({"tool": sub.column("tool"), "salt": pa.array(salt), "vid": pa.array(vids)})

    def star(group: pd.DataFrame) -> pa.Table:
        v = np.sort(group["vid"].values.astype(np.int64))
        if len(v) < 2:
            return _edge_tbl(v[:0], v[:0])
        return _edge_tbl(np.full(len(v) - 1, v[0]), v[1:])

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow")
    star_edges = keyed_ds.groupby(["tool", "salt"]).map_groups(star, batch_format="pandas")

    # chain each tool's sub-hubs. Pre-reduce to ONE row per (tool, salt)
    # first (distributed Min aggregate) so the per-tool regroup sees a tiny
    # n_tools × n_salts table — never a hot tool's full membership (that
    # would undo the salting and re-concentrate the skew in one task).
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    hub_min = partitioned_groupby_agg(keyed_ds, ["tool", "salt"], {"vid": ("vid", "min")})

    def subhubs(group: pd.DataFrame) -> pa.Table:
        hubs = np.sort(group["vid"].values.astype(np.int64))
        if len(hubs) < 2:
            return _edge_tbl(hubs[:0], hubs[:0])
        return _edge_tbl(hubs[:-1], hubs[1:])

    chain = hub_min.groupby("tool").map_groups(subhubs, batch_format="pandas")
    return star_edges.union(chain)


def build_transcript_edges(ds: "rd.Dataset", cfg: EngineConfig | None = None) -> "rd.Dataset":
    """Full edge table: turn-adjacency ∪ salted shared-tool stars."""
    return adjacency_edges(ds).union(shared_tool_edges(ds, cfg))
