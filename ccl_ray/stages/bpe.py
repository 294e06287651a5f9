"""Distributed BPE merge learning (Sennrich et al. 2016) over a document
corpus.

The classic subword-vocabulary trainer re-expressed Ray-Data-first:

1. ONE corpus pass reduces the 100 TB text to a word-frequency table
   (all-Rust polars tokenize + the partial-agg combiner) — after this the
   text never moves again; everything downstream is vocabulary-sized.
2. The word table holds each word as a list<str> symbol sequence. Per
   merge round: a map_batches pass emits per-batch PRE-AGGREGATED adjacent
   (left, right, weight) pair partials; a partitioned groupby reduces
   them; per-block top-1 rows (P scalars) go to the driver, which picks
   the global argmax (count desc, then (left, right) lexicographic asc —
   deterministic). The winning pair broadcasts via closure (two strings)
   and a vectorized merge pass rewrites the symbol table: greedy
   left-to-right overlap resolution is the run-parity trick (within each
   run of consecutive candidate positions, keep even offsets — exactly the
   sequential scan's choices), no Python loop over words.
3. Rounds materialize the (vocabulary-sized) symbol table so Ray's lazy
   graph doesn't replay prior rounds.

Scale notes: the pair-count exchange is bounded by the ACTIVE vocabulary ×
average word length, not the corpus; the driver sees only P top-1 rows per
round; `min_count` prunes the long word tail the way production BPE does.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def word_counts(docs: "rd.Dataset", *, text_col: str = "text") -> "rd.Dataset":
    """(word, n) frequency table — lowercase [a-z0-9]+ tokens, one corpus
    pass, partial-agg combiner."""
    import polars as pl

    from ccl_ray.stages.aggregates import partial_sum_agg

    def partial(df: pd.DataFrame) -> pa.Table:
        out = (
            pl.DataFrame({"text": df[text_col].values})
            .lazy()
            .select(
                pl.col("text").str.to_lowercase().str.extract_all("[a-z0-9]+").alias("w")
            )
            .explode("w")
            .drop_nulls("w")
            .group_by("w")
            .agg(n=pl.len().cast(pl.Int64))
            .collect()
        )
        return pa.table(
            {"word": pa.array(out["w"].to_numpy(), pa.string()),
             "n": pa.array(out["n"].to_numpy(), pa.int64())}
        )

    return partial_sum_agg(
        docs.map_batches(partial, batch_format="pandas"), ["word"], {"n": "n"}
    )


def _merge_pass(flat: np.ndarray, wid: np.ndarray, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) symbol pairs on
    the flattened (symbol, word-id) arrays. Returns (new_flat, new_wid).

    Overlap resolution without a scan: candidate positions that are
    consecutive share a symbol; within each run of consecutive candidates
    the sequential greedy scan takes exactly the even offsets."""
    if len(flat) < 2:
        return flat, wid
    cand = (flat[:-1] == left) & (flat[1:] == right) & (wid[:-1] == wid[1:])
    p = np.flatnonzero(cand)
    if not len(p):
        return flat, wid
    starts = np.r_[True, np.diff(p) != 1]
    run_first = p[starts][np.cumsum(starts) - 1]  # run start per candidate
    keep = p[(p - run_first) % 2 == 0]
    out = flat.copy()
    out[keep] = left + right
    mask = np.ones(len(flat), bool)
    mask[keep + 1] = False
    return out[mask], wid[mask]


def bpe_merges(
    docs: "rd.Dataset",
    *,
    n_merges: int = 8,
    min_count: int = 1,
    text_col: str = "text",
    num_partitions: int | None = None,
) -> pa.Table:
    """Learn the first ``n_merges`` BPE merges. Returns an Arrow table
    (rank, left, right, count) in merge order — count is the weighted
    number of adjacent occurrences at the time of the merge (Sennrich
    get_stats semantics: every adjacent position counts, overlaps
    included). Ties break (count desc, left asc, right asc)."""
    from ccl_ray.config import resolve_partitions
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    P = resolve_partitions(num_partitions)

    wc = word_counts(docs, text_col=text_col)
    if min_count > 1:
        mc = min_count

        def prune(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.greater_equal(t.column("n"), mc))

        wc = wc.map_batches(prune, batch_format="pyarrow")

    def to_symbols(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "syms": [list(w) for w in df["word"]],
                "n": df["n"].values.astype(np.int64),
            }
        )

    state = wc.map_batches(to_symbols, batch_format="pandas").materialize()

    def _flat(df: pd.DataFrame):
        lens = np.array([len(s) for s in df["syms"]], np.int64)
        wid = np.repeat(np.arange(len(df), dtype=np.int64), lens)
        flat = np.array(
            [s for syms in df["syms"] for s in syms], dtype=object
        ) if lens.sum() else np.empty(0, object)
        return flat, wid, lens

    merges: list[tuple[int, str, str, int]] = []
    for r in range(n_merges):

        def pair_partials(df: pd.DataFrame) -> pa.Table:
            empty = pa.table(
                {"l": pa.array([], pa.string()), "r": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
            if not len(df):
                return empty
            flat, wid, _ = _flat(df)
            if len(flat) < 2:
                return empty
            w = df["n"].values.astype(np.int64)
            adj = wid[:-1] == wid[1:]
            ls, rs = flat[:-1][adj], flat[1:][adj]
            cw = w[wid[:-1][adj]]
            if not len(ls):
                return empty
            sub = pd.DataFrame({"l": ls, "r": rs, "c": cw})
            g = sub.groupby(["l", "r"], sort=False)["c"].sum().reset_index()
            return pa.Table.from_pandas(g, preserve_index=False)

        pairs = partitioned_groupby_agg(
            state.map_batches(pair_partials, batch_format="pandas"),
            ["l", "r"], {"c": ("c", "sum")}, num_partitions=P,
        )

        def block_top1(df: pd.DataFrame) -> pa.Table:
            empty = pa.table(
                {"l": pa.array([], pa.string()), "r": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
            if not len(df):
                return empty
            df = df.sort_values(
                ["c", "l", "r"], ascending=[False, True, True], kind="stable"
            ).head(1)
            return pa.Table.from_pandas(df, preserve_index=False)

        top = pairs.map_batches(block_top1, batch_format="pandas").to_pandas()
        if not len(top):
            break
        top = top.sort_values(
            ["c", "l", "r"], ascending=[False, True, True], kind="stable"
        ).iloc[0]
        best_l, best_r, best_c = str(top["l"]), str(top["r"]), int(top["c"])
        if best_c < max(min_count, 1):
            break
        merges.append((r + 1, best_l, best_r, best_c))
        bl, br = best_l, best_r

        def apply(df: pd.DataFrame, bl=bl, br=br) -> pd.DataFrame:
            if not len(df):
                return df
            flat, wid, lens = _flat(df)
            nf, nw = _merge_pass(flat, wid, bl, br)
            n_kept = np.bincount(wid, minlength=len(df)) - np.bincount(
                nw, minlength=len(df)
            )
            new_lens = lens - n_kept
            offs = np.r_[0, np.cumsum(new_lens)]
            syms = [list(nf[offs[i]: offs[i + 1]]) for i in range(len(df))]
            return pd.DataFrame({"syms": syms, "n": df["n"].values})

        state = state.map_batches(apply, batch_format="pandas").materialize()

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def bpe_oracle(texts, *, n_merges: int = 8, min_count: int = 1):
    """Sequential pure-Python BPE twin (identical tokenization, counting,
    tie-break and greedy-merge rules). Returns [(rank, left, right, count)]."""
    import re

    wc: dict[str, int] = {}
    for t in texts:
        for w in re.findall("[a-z0-9]+", t.lower()):
            wc[w] = wc.get(w, 0) + 1
    vocab = {w: list(w) for w, n in wc.items() if n >= min_count}
    merges = []
    for r in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                stats[pair] = stats.get(pair, 0) + wc[w]
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (bl, br), c = best
        if c < max(min_count, 1):
            break
        merges.append((r + 1, bl, br, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == bl and syms[i + 1] == br:
                    out.append(bl + br)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges
