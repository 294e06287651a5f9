"""Text analysis operators for training-data pipelines (documents table).

All stages are vectorized pandas/numpy inside map_batches; regexes and
stopword tables are compiled once per actor (callable classes), not per
batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

TOKEN_RE = r"[A-Za-z0-9]+"

# small fixed stopword table (shared with the SQL oracle in __ray_entry__)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

# crude per-language marker vocabularies for the n-gram/stopword language-ID
# heuristic; deterministic, no external models.
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is"},
    "es": {"el", "la", "de", "que", "y"},
    "de": {"der", "die", "und", "das", "ist"},
    "fr": {"le", "la", "et", "les", "des"},
    "zh": set(),
}


class TokenCount:
    """(doc_id, n_tokens): tokens = maximal [A-Za-z0-9]+ runs."""

    def __init__(self):
        import re

        self.re = re.compile(TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_tokens": df["text"].str.count(TOKEN_RE).astype(np.int64)}
        )


def _token_lists_pl(texts: np.ndarray):
    """(eager polars frame with i:int64, tok:list[str]) of lowercase tokens.

    Tokenization runs ONCE in polars' Rust engine (lowercase + extract_all);
    downstream membership counting is explode + is_in + group_by, also all
    Rust. This replaced the per-token Python lambdas (verdict round 2's
    slowest text constant) after measuring the "obvious" numpy shapes
    SLOWER than those lambdas: np.isin over the object-dtype token stream
    sorts 8M Python strings, and a lookaround-alternation `str.count` makes
    Python's backtracking engine try the vocabulary at every char. Polars
    is the only in-container path that keeps token counting off the Python
    object heap entirely (measured 2.2x on the 8M-token kernel probe).
    """
    import polars as pl

    n = len(texts)
    return (
        pl.DataFrame({"i": np.arange(n, dtype=np.int64), "text": texts})
        .select(
            pl.col("i"),
            pl.col("text").str.to_lowercase().str.extract_all("[a-z0-9]+").alias("tok"),
        )
    )


def _vocab_counts_pl(toks, vocabs: dict) -> np.ndarray:
    """(n_docs, n_vocabs) token-membership counts, one explode pass."""
    import polars as pl

    n = toks.height
    agg = (
        toks.lazy()
        # empty_as_null pinned: zero-token docs must keep a (null) row so
        # they still appear in the group_by (their counts scatter as 0)
        .explode("tok", empty_as_null=True)
        .group_by("i")
        .agg(
            *[
                pl.col("tok").is_in(sorted(v)).sum().cast(pl.Int64).alias(name)
                for name, v in vocabs.items()
            ]
        )
        .collect()
    )
    out = np.zeros((n, len(vocabs)), dtype=np.int64)
    idx = agg["i"].to_numpy()
    for j, name in enumerate(vocabs):
        out[idx, j] = agg[name].to_numpy()
    return out


class QualityScore:
    """Length / punctuation / stopword quality signals per document."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].values
        toks = _token_lists_pl(texts)
        n_tokens = toks["tok"].list.len().to_numpy().astype(np.int64, copy=False)
        n_stop = _vocab_counts_pl(toks, {"stop": STOPWORDS})[:, 0]
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars_txt": df["text"].str.len().astype(np.int64),
                "n_tokens": n_tokens,
                "n_punct": df["text"].str.count(r"[.!?,;:]").astype(np.int64),
                "n_stop": n_stop,
            }
        )


class RepetitionScore:
    """Duplicate-3-gram fraction per document (Gopher-style repetition
    quality signal): with G = the doc's token 3-grams, dup_frac =
    1 − |distinct G| / |G| (0.0 for docs with < 3 tokens). All-Rust polars
    pass: tokenize once, group-aware shift builds the 3-gram strings,
    group_by counts len + n_unique — no per-document Python loop."""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        toks = _token_lists_pl(df["text"].values)
        agg = (
            toks.lazy()
            .explode("tok", empty_as_null=True)
            .with_columns(
                g=pl.concat_str(
                    [
                        pl.col("tok"),
                        pl.col("tok").shift(-1).over("i"),
                        pl.col("tok").shift(-2).over("i"),
                    ],
                    separator=" ",
                )
            )
            .drop_nulls("g")
            .group_by("i")
            .agg(
                n=pl.len().cast(pl.Int64),
                d=pl.col("g").n_unique().cast(pl.Int64),
            )
            .collect()
        )
        n_grams = np.zeros(len(df), dtype=np.int64)
        dup = np.zeros(len(df), dtype=np.float64)
        idx = agg["i"].to_numpy()
        nn = agg["n"].to_numpy()
        n_grams[idx] = nn
        dup[idx] = np.round(1.0 - agg["d"].to_numpy() / nn, 6)
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_grams": n_grams, "dup_frac": dup}
        )


class Fingerprint:
    """(doc_id, fp): md5 of lowercased text — exact-dup fingerprint with a
    SQL oracle. (Shingle-level rolling-hash fingerprints live in dedup.py.)"""

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        fp = [hashlib.md5(t.lower().encode("utf-8", "surrogatepass")).hexdigest() for t in df["text"]]
        return pd.DataFrame({"doc_id": df["doc_id"], "fp": fp})


class LangId:
    """Marker-vocabulary language-ID heuristic; 'und' when nothing matches."""

    def __init__(self):
        # lang codes DESCENDING so a tie on marker count resolves to the
        # lexicographically largest language (same rule as the SQL oracle's
        # ORDER BY c DESC, lang DESC), because argmax takes the first max
        self.langs = sorted((l for l, v in _LANG_MARKERS.items() if v), reverse=True)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        toks = _token_lists_pl(df["text"].values)
        counts = _vocab_counts_pl(toks, {l: _LANG_MARKERS[l] for l in self.langs})
        best = np.argmax(counts, axis=1)
        langs = np.array(self.langs, dtype=object)
        pred = np.where(counts[np.arange(n), best] > 0, langs[best], "und")
        return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": pred})


# RE2-compatible scrub patterns (identical semantics in Python re and
# DuckDB regexp_replace): greedy, no backrefs/lookaround
REDACT_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"[0-9]{7,}", "<NUM>"),
)


class Redact:
    """PII-style scrubbing: emails and long digit runs → placeholders.
    Patterns compiled once per actor; chosen RE2-compatible so the SQL
    oracle (regexp_replace chain) is value-identical."""

    def __init__(self):
        import re

        self.pats = [(re.compile(p), r) for p, r in REDACT_PATTERNS]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df["text"]
        for pat, rep in self.pats:
            out = out.str.replace(pat, rep, regex=True)
        return pd.DataFrame({"doc_id": df["doc_id"], "clean_text": out})


def redact(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(Redact, batch_format="pandas", concurrency=(1, 8), max_restarts=0)


def tfidf_top_terms(docs: "rd.Dataset", k: int = 5, *, num_partitions: int | None = None) -> "rd.Dataset":
    """(doc_id, term, score, rank): top-k tokens per document by tf·idf.

    Distributed shape: per-batch (doc_id, term, tf) partials → term df via
    one groupby (partial-agg) → broadcast N (one scalar) → hash-join tf ⋈
    df → per-doc top-k via hash(doc_id)-partition-grouped vectorized rank
    (never one Python group per document). idf = ln(N/df); score rounded to
    6 BEFORE ranking so ties resolve identically in the SQL oracle
    (rank order: score desc, term asc).
    """
    import pyarrow as pa

    from ccl_ray.functions.hashing import stable_hash64_np
    from ccl_ray.stages.aggregates import to_arrow_blocks
    from ccl_ray.stages.exchange import hash_join

    class TermFreq:
        def __init__(self):
            import re

            self.tok = re.compile(TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            ids, terms = [], []
            for did, t in zip(df["doc_id"].values, df["text"]):
                ws = self.tok.findall(t.lower())
                ids.append(np.full(len(ws), did, dtype=np.int64))
                terms.append(np.array(ws, dtype=object))
            if not ids:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
                     "tf": pa.array([], pa.int64())}
                )
            g = pd.DataFrame(
                {"doc_id": np.concatenate(ids), "term": np.concatenate(terms)}
            ).groupby(["doc_id", "term"], sort=False)
            out = g.size().rename("tf").reset_index()
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"].values, pa.int64()),
                    "term": pa.array(out["term"].values, pa.string()),
                    "tf": pa.array(out["tf"].values, pa.int64()),
                }
            )

    tf = docs.map_batches(TermFreq, batch_format="pandas", concurrency=(1, 8), max_restarts=0).materialize()
    # df: docs-per-term — tf rows are already distinct (doc, term), so a
    # count per term is a sum of ones (partial-aggregated by Ray)
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    df_tbl = partitioned_groupby_agg(
        tf.map_batches(
            lambda b: pa.table(
                {"dterm": b.column("term"), "one": pa.array(np.ones(b.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        ),
        ["dterm"],
        {"df": ("one", "sum")},
    )
    n_docs = docs.count()

    from ccl_ray.config import resolve_partitions

    P = resolve_partitions(num_partitions)
    joined = hash_join(tf, df_tbl, left_on="term", right_on="dterm", num_partitions=P)

    def score_route(batch: pa.Table) -> pa.Table:
        tfv = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.round(tfv * np.log(n_docs / dfv), 6)
        did = batch.column("doc_id").to_numpy(zero_copy_only=False)
        part = (stable_hash64_np(did.view(np.uint64)) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "term": batch.column("term"),
                "score": pa.array(score),
                "part": pa.array(part),
            }
        )

    def topk_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
                 "score": pa.array([], pa.float64()), "rank": pa.array([], pa.int64())}
            )
        d = df.sort_values(["doc_id", "score", "term"], ascending=[True, False, True],
                           kind="stable")
        grp_start = np.empty(len(d), bool)
        did = d["doc_id"].values
        grp_start[0] = True
        grp_start[1:] = did[1:] != did[:-1]
        idx_in_grp = np.arange(len(d)) - np.maximum.accumulate(
            np.where(grp_start, np.arange(len(d)), 0)
        )
        keep = idx_in_grp < k
        d = d[keep]
        rank = (idx_in_grp[keep] + 1).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(d["doc_id"].values, pa.int64()),
                "term": pa.array(d["term"].values, pa.string()),
                "score": pa.array(d["score"].values, pa.float64()),
                "rank": pa.array(rank),
            }
        )

    return joined.map_batches(score_route, batch_format="pyarrow").groupby("part").map_groups(
        topk_part, batch_format="pandas"
    )


def corpus_term_counts(docs: "rd.Dataset") -> "rd.Dataset":
    """(term, n): corpus-wide token frequencies.

    Per-batch token explode collapses to (term, count) partials immediately
    (np.unique — the raw token stream never leaves the task), then a
    partial-agg groupby sums them; the result's cardinality is the distinct
    vocabulary, not the corpus size."""
    import pyarrow as pa

    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    class TermCounts:
        def __init__(self):
            import re

            self.tok = re.compile(TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            toks = [w for t in df["text"] for w in self.tok.findall(t.lower())]
            if not toks:
                return pa.table(
                    {"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
                )
            terms, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
            return pa.table(
                {"term": pa.array(terms, pa.string()), "n": pa.array(counts.astype(np.int64))}
            )

    return partitioned_groupby_agg(
        docs.map_batches(TermCounts, batch_format="pandas", concurrency=(1, 8), max_restarts=0),
        ["term"],
        {"n": ("n", "sum")},
    )


def vocab_top_terms(docs: "rd.Dataset", k: int = 100) -> "rd.Dataset":
    """(term, n): the k most frequent corpus tokens — vocabulary building.
    Only the aggregated vocabulary is sorted for the top k; tie order
    (n desc, term asc) is a total order, so the cut is deterministic."""
    return corpus_term_counts(docs).sort(["n", "term"], descending=[True, False]).limit(k)


def zipf_alpha_terms(docs: "rd.Dataset", cmin: int = 5) -> "rd.Dataset":
    """One-row (n_tail, alpha): continuous-MLE Zipf/power-law exponent of
    the corpus token-frequency distribution (Clauset-Shalizi-Newman, the
    same estimator powerlaw_alpha applies to degrees):
    α = 1 + n / Σ ln(c / (cmin − ½)) over terms with count ≥ cmin — the
    one-scalar heavy-tail summary of a corpus (natural text ≈ 2.0; a
    degenerate or templated corpus drifts far from it). Per-block
    (n, Σln) partials over the aggregated term table reduce to one row;
    float64 log-sums are order-independent to ~1e-12 at gate scale and α
    rounds to 1e-6 on both sides."""
    import pyarrow as pa

    counts = corpus_term_counts(docs)

    def partials(t: pa.Table) -> pa.Table:
        c = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        c = c[c >= cmin]
        return pa.table(
            {
                "n": pa.array([len(c)], pa.int64()),
                "s": pa.array([float(np.log(c / (cmin - 0.5)).sum())], pa.float64()),
            }
        )

    tot = (
        counts.map_batches(partials, batch_format="pyarrow")
        .repartition(1)
        .map_batches(lambda df: df.sum().to_frame().T, batch_format="pandas")
        .to_pandas()
    )
    if len(tot) == 0 or "n" not in tot.columns:  # empty corpus: zero blocks
        tot = pd.DataFrame({"n": [0], "s": [0.0]})
    n, s = float(tot["n"].iloc[0]), float(tot["s"].iloc[0])
    alpha = round(1.0 + n / s, 6) if s > 0 else 0.0
    return pa.table(
        {
            "n_tail": pa.array([int(n)], pa.int64()),
            "alpha": pa.array([alpha], pa.float64()),
        }
    )


def token_entropy(docs: "rd.Dataset") -> "rd.Dataset":
    """(doc_id, entropy): Shannon entropy (bits) of each document's token
    distribution — the vocabulary-diversity quality signal (low entropy =
    repetitive/templated text). Empty/token-free docs score 0.0.

    Per-batch: one regex pass per doc, np.unique counts, closed-form
    -Σ p·log2 p rounded to 6 (float noise vs a SQL log2 oracle is ~1e-15
    per term)."""
    import pyarrow as pa

    class Entropy:
        def __init__(self):
            import re

            self.tok = re.compile(TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            ent = np.zeros(len(df), np.float64)
            for i, t in enumerate(df["text"]):
                ws = self.tok.findall(t.lower())
                if not ws:
                    continue
                _, cnt = np.unique(np.array(ws, dtype=object), return_counts=True)
                p = cnt / cnt.sum()
                ent[i] = round(float(-(p * np.log2(p)).sum()), 6)
            return pa.table(
                {"doc_id": pa.array(df["doc_id"].values, pa.int64()),
                 "entropy": pa.array(ent)}
            )

    return docs.map_batches(Entropy, batch_format="pandas", concurrency=(1, 8), max_restarts=0)


def unigram_logprob(docs: "rd.Dataset", *, num_partitions: int | None = None) -> "rd.Dataset":
    """(doc_id, logprob): mean per-token surprisal −log2 p(t) under the
    CORPUS unigram distribution — the model-free perplexity proxy
    (high = rare-vocabulary text, low = templated/common text). Token-free
    docs score 0.0.

    Distributed shape: per-batch (doc_id, term, cnt) partials (the raw
    token stream never leaves its task) → term-frequency table via
    partial-agg groupby → hash-join partials ⋈ tf on term (no vocabulary
    broadcast — the vocabulary scales with the corpus) → per-doc weighted
    mean via one more partial-agg. Rounded to 6."""
    import pyarrow as pa

    from ccl_ray.stages.aggregates import partial_sum_agg, partitioned_groupby_agg
    from ccl_ray.stages.exchange import hash_join

    class DocTermCounts:
        def __init__(self):
            import re

            self.tok = re.compile(TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            ids, terms = [], []
            for did, t in zip(df["doc_id"].values, df["text"]):
                ws = self.tok.findall(t.lower())
                ids.extend([did] * len(ws))
                terms.extend(ws)
            if not terms:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "term": pa.array([], pa.string()),
                     "cnt": pa.array([], pa.int64())}
                )
            key = pd.DataFrame({"doc_id": np.asarray(ids, np.int64),
                                "term": np.asarray(terms, object)})
            g = key.groupby(["doc_id", "term"], sort=False).size()
            out = g.reset_index(name="cnt")
            return pa.table(
                {"doc_id": pa.array(out["doc_id"].values, pa.int64()),
                 "term": pa.array(out["term"].values, pa.string()),
                 "cnt": pa.array(out["cnt"].values.astype(np.int64))}
            )

    partials = docs.map_batches(
        DocTermCounts, batch_format="pandas", concurrency=(1, 8), max_restarts=0
    ).materialize()  # consumed twice: tf build + join probe

    tf = partitioned_groupby_agg(
        partials, ["term"], {"n": ("cnt", "sum")}, num_partitions
    )

    def tf_rename(batch: pa.Table) -> pa.Table:
        return pa.table({"jt": batch.column("term"), "n": batch.column("n")})

    tf_j = tf.map_batches(tf_rename, batch_format="pyarrow").materialize()
    total = float(tf_j.sum(on="n"))

    joined = hash_join(
        partials, tf_j, left_on="term", right_on="jt",
        num_partitions=num_partitions,
    )

    def surprisal(batch: pa.Table) -> pa.Table:
        cnt = batch.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                # hash_join promotes int columns to double (both sides share
                # one frame during the group merge) — restore int64 so the
                # final groupby's key hashing matches the zero-row side
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "s": pa.array(cnt * -np.log2(n / total)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    sums = partial_sum_agg(
        joined.map_batches(surprisal, batch_format="pyarrow"),
        ["doc_id"], {"s": "ssum", "cnt": "ntok"},
    )

    def finish(batch: pa.Table) -> pa.Table:
        ssum = batch.column("ssum").to_numpy(zero_copy_only=False)
        ntok = batch.column("ntok").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "logprob": pa.array(np.round(ssum / ntok, 6)),
            }
        )

    scored = sums.map_batches(finish, batch_format="pyarrow")

    # token-free docs: left-union zeros for ids with no scored row
    ids = docs.select_columns(["doc_id"])

    def zero(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("doc_id").cast(pa.int64()),
             "logprob": pa.array(np.zeros(batch.num_rows), pa.float64())}
        )

    from ccl_ray.stages.aggregates import to_arrow_blocks

    return partitioned_groupby_agg(
        to_arrow_blocks(scored).union(ids.map_batches(zero, batch_format="pyarrow")),
        ["doc_id"], {"logprob": ("logprob", "max")}, num_partitions,
    )


def bigram_top_terms(docs: "rd.Dataset", k: int = 100) -> "rd.Dataset":
    """(bigram, n): the k most frequent adjacent-token pairs — the n-gram
    sibling of vocab_top_terms (phrase mining / n-gram LM feeds).

    Identical aggregation shape: per-batch partials collapse the bigram
    stream to (bigram, count) before anything leaves the task, then one
    partial-agg groupby over bigram cardinality and a deterministic
    (n desc, bigram asc) top-k cut. Bigrams never cross document
    boundaries."""
    import pyarrow as pa

    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    class BigramCounts:
        def __init__(self):
            import re

            self.tok = re.compile(TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            grams: list[str] = []
            for t in df["text"]:
                ws = self.tok.findall(t.lower())
                grams.extend(map(" ".join, zip(ws, ws[1:])))
            if not grams:
                return pa.table(
                    {"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
                )
            terms, counts = np.unique(np.array(grams, dtype=object), return_counts=True)
            return pa.table(
                {"bigram": pa.array(terms, pa.string()),
                 "n": pa.array(counts.astype(np.int64))}
            )

    agg = partitioned_groupby_agg(
        docs.map_batches(BigramCounts, batch_format="pandas", concurrency=(1, 8), max_restarts=0),
        ["bigram"],
        {"n": ("n", "sum")},
    )
    return agg.sort(["n", "bigram"], descending=[True, False]).limit(k)


def bigram_pmi(docs: "rd.Dataset", k: int = 100, min_count: int = 5) -> "rd.Dataset":
    """(a, b, n, pmi): the k adjacent-token pairs with the highest pointwise
    mutual information, PMI = log2( (n_ab/T2) / ((n_a/T1)(n_b/T1)) ) —
    collocation mining (NSP/phrase vocabularies). ``min_count`` drops the
    unstable low-frequency tail before ranking.

    Shape: unigram and bigram-pair counts through the partial-agg combiner
    (token streams never leave their task), the vocabulary-sized unigram
    table hash-joins each pair on BOTH members (never broadcast), T1/T2 are
    P-scalar partial sums, and the deterministic (pmi desc, a, b) top-k is
    cut after rounding — identical integer counts feed the identical float
    expression on both sides, so the rounded PMI value-hashes exactly."""
    import pyarrow as pa

    from ccl_ray.stages.aggregates import partitioned_groupby_agg
    from ccl_ray.stages.exchange import hash_join

    uni = corpus_term_counts(docs).rename_columns({"n": "nu"})

    class PairCounts:
        def __init__(self):
            import re

            self.tok = re.compile(TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            aa: list[str] = []
            bb: list[str] = []
            for t in df["text"]:
                ws = self.tok.findall(t.lower())
                aa.extend(ws[:-1])
                bb.extend(ws[1:])
            if not aa:
                return pa.table(
                    {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                     "n": pa.array([], pa.int64())}
                )
            g = (
                pd.DataFrame({"a": aa, "b": bb})
                .groupby(["a", "b"], sort=False)
                .size()
                .reset_index(name="n")
            )
            return pa.Table.from_pandas(g, preserve_index=False).cast(
                pa.schema([("a", pa.string()), ("b", pa.string()), ("n", pa.int64())])
            )

    bc = partitioned_groupby_agg(
        docs.map_batches(PairCounts, batch_format="pandas", concurrency=(1, 8), max_restarts=0),
        ["a", "b"],
        {"n": ("n", "sum")},
    ).materialize()

    def _scalar_sum(ds, col: str) -> float:
        parts = ds.map_batches(
            lambda t, c=col: pa.table(
                {"s": pa.array([int(np.sum(t.column(c).to_numpy(zero_copy_only=False)))], pa.int64())}
            ),
            batch_format="pyarrow",
        ).to_pandas()
        return float(parts["s"].sum())

    t1 = _scalar_sum(uni, "nu")
    t2 = _scalar_sum(bc, "n")

    j1 = hash_join(bc, uni.rename_columns({"term": "ua"}), left_on="a", right_on="ua")
    j2 = hash_join(
        j1.rename_columns({"nu": "na"}),
        uni.rename_columns({"term": "ub", "nu": "nb"}),
        left_on="b", right_on="ub",
    )

    def score(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        na = t.column("na").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t.column("nb").to_numpy(zero_copy_only=False).astype(np.float64)
        keep = n >= min_count
        n, na, nb = n[keep], na[keep], nb[keep]
        pmi = np.round(np.log2((n / t2) / ((na / t1) * (nb / t1))), 6)
        m = pa.array(keep)
        return pa.table(
            {"a": t.column("a").filter(m), "b": t.column("b").filter(m),
             "n": pa.array(n.astype(np.int64)), "pmi": pa.array(pmi, pa.float64())}
        )

    return (
        j2.map_batches(score, batch_format="pyarrow")
        .sort(["pmi", "a", "b"], descending=[True, False, False])
        .limit(k)
    )


def token_count(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(TokenCount, batch_format="pandas", concurrency=(1, 8), max_restarts=0)


def quality_score(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(QualityScore, batch_format="pandas", concurrency=(1, 8), max_restarts=0)


def fingerprint(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(Fingerprint, batch_format="pandas", concurrency=(1, 8), max_restarts=0)


def repetition_score(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(RepetitionScore, batch_format="pandas", concurrency=(1, 8), max_restarts=0)


def lang_id(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(LangId, batch_format="pandas", concurrency=(1, 8), max_restarts=0)


def grouped_top_terms(
    docs: "rd.Dataset",
    key_col: str = "lang",
    k: int = 5,
    *,
    num_partitions: int | None = None,
) -> "rd.Dataset":
    """(key, term, n, rn): the k most frequent tokens PER GROUP — the
    per-language vocabulary profile (corpus mix analysis, lang-ID sanity).

    Per-batch explode collapses to (key, term, count) partials immediately
    (token stream never leaves the task), partial-agg sums them at
    key × term cardinality, then the per-key top-k runs partition-grouped
    (route by hash(key), one lexsort + segmented rank per partition — the
    top_n_per_group shape, no per-key Python round-trips). Tie order
    (n desc, term asc) is total, so the cut is deterministic."""
    import pyarrow as pa

    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import hash_strings_np
    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    P = resolve_partitions(num_partitions)

    class GroupTermCounts:
        def __init__(self):
            import re

            self.tok = re.compile(TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            keys, terms = [], []
            for kv, t in zip(df[key_col], df["text"]):
                ws = self.tok.findall(t.lower())
                terms.extend(ws)
                keys.extend([kv] * len(ws))
            if not terms:
                return pa.table(
                    {key_col: pa.array([], pa.string()),
                     "term": pa.array([], pa.string()),
                     "n": pa.array([], pa.int64())}
                )
            g = (
                pd.DataFrame({key_col: keys, "term": terms})
                .groupby([key_col, "term"], sort=False)
                .size()
                .reset_index(name="n")
            )
            return pa.table(
                {key_col: pa.array(g[key_col].values, pa.string()),
                 "term": pa.array(g["term"].values, pa.string()),
                 "n": pa.array(g["n"].values.astype(np.int64))}
            )

    agg = partitioned_groupby_agg(
        docs.select_columns([key_col, "text"]).map_batches(
            GroupTermCounts, batch_format="pandas", concurrency=(1, 8), max_restarts=0
        ),
        [key_col, "term"],
        {"n": ("n", "sum")},
    )

    def route(t: pa.Table) -> pa.Table:
        h = hash_strings_np(t.column(key_col).to_numpy(zero_copy_only=False))
        return t.append_column("part", pa.array((h % np.uint64(P)).astype(np.int64)))

    out_schema = pa.schema(
        [(key_col, pa.string()), ("term", pa.string()),
         ("n", pa.int64()), ("rn", pa.int64())]
    )

    def topk_part(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        kcodes, _ = pd.factorize(df[key_col].values, sort=True)
        n = df["n"].values.astype(np.int64)
        terms = df["term"].values
        order = np.lexsort((terms, -n, kcodes))
        kc, nn, tt = kcodes[order], n[order], terms[order]
        keys = df[key_col].values[order]
        m = len(kc)
        start = np.empty(m, bool)
        start[0] = True
        start[1:] = kc[1:] != kc[:-1]
        rn = np.arange(m) - np.maximum.accumulate(np.where(start, np.arange(m), 0))
        kept = rn < k
        return pa.table(
            {key_col: pa.array(keys[kept], pa.string()),
             "term": pa.array(tt[kept], pa.string()),
             "n": pa.array(nn[kept]),
             "rn": pa.array((rn[kept] + 1).astype(np.int64))}
        )

    return (
        agg.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk_part, batch_format="pandas")
    )


def postings(docs: "rd.Dataset", *, cap: int = 10,
             num_partitions: int | None = None) -> "rd.Dataset":
    """(term, df, top_docs): the inverted index — document frequency plus
    the first ``cap`` doc_ids (ascending, comma-joined) per term.

    Distributed shape: per-batch DISTINCT (doc_id, term) partials (the raw
    token stream never leaves its task) → hash(term)-partition-grouped
    finisher that computes df and the capped sorted posting head in one
    lexsort per partition. Output cardinality is the vocabulary, not the
    corpus; at scale the consumer writes it straight to partitioned
    parquet (the posting LISTS are capped — a full index would keep the
    (term, doc) pair table itself, which this stage's partials already
    are).
    """
    import pyarrow as pa

    from ccl_ray.config import resolve_partitions
    from ccl_ray.functions.hashing import stable_hash64_np

    P = resolve_partitions(num_partitions)

    class DocTerms:
        def __init__(self):
            import re

            self.tok = re.compile(TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            ids, terms = [], []
            for did, t in zip(df["doc_id"].values, df["text"]):
                ws = sorted(set(self.tok.findall(t.lower())))
                ids.append(np.full(len(ws), did, dtype=np.int64))
                terms.append(np.array(ws, dtype=object))
            if not ids:
                return pa.table(
                    {"doc_id": pa.array([], pa.int64()),
                     "term": pa.array([], pa.string())}
                )
            return pa.table(
                {"doc_id": pa.array(np.concatenate(ids), pa.int64()),
                 "term": pa.array(np.concatenate(terms), pa.string())}
            )

    def route(b: pa.Table) -> pa.Table:
        # stable across processes: hash() is salted — use the term bytes
        import hashlib

        h = np.array(
            [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
             for t in b.column("term").to_pylist()],
            dtype=np.uint64,
        )
        return b.append_column("part", pa.array((h % np.uint64(P)).astype(np.int64)))

    out_schema = pa.schema(
        [("term", pa.string()), ("df", pa.int64()), ("top_docs", pa.string())]
    )

    def finish(df: pd.DataFrame) -> pa.Table:
        if not len(df):
            return out_schema.empty_table()
        tcodes, _ = pd.factorize(df["term"].values, sort=True)
        did = df["doc_id"].values.astype(np.int64)
        order = np.lexsort((did, tcodes))
        tc, dd = tcodes[order], did[order]
        terms = df["term"].values[order]
        m = len(tc)
        start = np.empty(m, bool)
        start[0] = True
        start[1:] = tc[1:] != tc[:-1]
        starts = np.nonzero(start)[0]
        dfreq = np.diff(np.append(starts, m)).astype(np.int64)
        rn = np.arange(m) - np.repeat(starts, dfreq)
        kept = rn < cap
        g = pd.DataFrame({"term": terms[kept], "d": dd[kept].astype(str)})
        lists = g.groupby("term", sort=True)["d"].agg(",".join)
        return pa.table(
            {"term": pa.array(terms[starts], pa.string()),
             "df": pa.array(dfreq),
             "top_docs": pa.array(lists.loc[terms[starts]].values, pa.string())}
        )

    pairs = docs.map_batches(DocTerms, batch_format="pandas",
                             concurrency=(1, 8), max_restarts=0)
    return (
        pairs.map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(finish, batch_format="pandas")
    )


def bm25_topk(docs: "rd.Dataset", query_terms: list[str], *, k: int = 20,
              k1: float = 1.2, b: float = 0.75) -> "rd.Dataset":
    """(doc_id, score): top-k documents by Okapi BM25 against a FIXED
    query term set. idf = ln((N − df + 0.5)/(df + 0.5) + 1) (the Lucene
    plus-one form, never negative); scores rounded to 6 BEFORE ranking so
    the cut resolves identically in the SQL oracle (order: score desc,
    doc_id asc).

    Distributed shape: one tokenizing pass emits per-doc (dl, tf per query
    term) — the query is a tiny broadcast list, the token stream never
    leaves the task; N, Σdl (exact int64) and per-term df reduce to
    scalars; a second vectorized pass scores every matching doc and a
    global sort takes the head. No shuffle touches corpus-sized data.
    """
    import pyarrow as pa

    qt = sorted(set(query_terms))

    class TfPass:
        def __init__(self):
            import re

            self.tok = re.compile(TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            n = len(df)
            dl = np.zeros(n, np.int64)
            tfs = {t: np.zeros(n, np.int64) for t in qt}
            for i, t in enumerate(df["text"]):
                ws = self.tok.findall(t.lower())
                dl[i] = len(ws)
                if ws:
                    vals, cnts = np.unique(np.array(ws, dtype=object),
                                           return_counts=True)
                    lut = dict(zip(vals, cnts))
                    for q in qt:
                        tfs[q][i] = lut.get(q, 0)
            cols = {"doc_id": pa.array(df["doc_id"].values, pa.int64()),
                    "dl": pa.array(dl)}
            for q in qt:
                cols[f"tf_{q}"] = pa.array(tfs[q])
            return pa.table(cols)

    stats = docs.map_batches(TfPass, batch_format="pandas",
                             concurrency=(1, 8), max_restarts=0).materialize()
    import ray.data.aggregate as agg

    totals = stats.aggregate(agg.Count(), agg.Sum("dl"))
    n_docs = int(totals["count()"])
    sum_dl = int(totals["sum(dl)"])
    avgdl = sum_dl / n_docs if n_docs else 0.0

    def df_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {f"df_{q}": pa.array(
                [int((t.column(f"tf_{q}").to_numpy(zero_copy_only=False) > 0).sum())],
                pa.int64(),
            ) for q in qt}
        )

    dfs = stats.map_batches(df_partial, batch_format="pyarrow").aggregate(
        *[agg.Sum(f"df_{q}") for q in qt]
    )
    idf = {
        q: float(np.log(
            (n_docs - int(dfs[f"sum(df_{q})"] or 0) + 0.5)
            / (int(dfs[f"sum(df_{q})"] or 0) + 0.5) + 1.0
        ))
        for q in qt
    }

    def score(t: pa.Table) -> pa.Table:
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl) if avgdl else k1
        s = np.zeros(t.num_rows, np.float64)
        for q in qt:
            tf = t.column(f"tf_{q}").to_numpy(zero_copy_only=False).astype(np.float64)
            s += idf[q] * tf * (k1 + 1.0) / (tf + norm)
        keep = s > 0
        return pa.table(
            {"doc_id": pa.array(
                t.column("doc_id").to_numpy(zero_copy_only=False)[keep]
            ), "score": pa.array(np.round(s[keep], 6))}
        )

    return stats.map_batches(score, batch_format="pyarrow").sort(
        ["score", "doc_id"], descending=[True, False]
    ).limit(k)


def dup_ngrams(docs: "rd.Dataset", *, n: int = 5, min_docs: int = 2,
               k: int = 50) -> "rd.Dataset":
    """(gram, n_docs, n_occ): token n-grams repeated across ≥ ``min_docs``
    documents — the exact-substring duplication signal (the Lee et al.
    2022 "Deduplicating Training Data" span heuristic at n-gram
    granularity), top-k by total occurrences (ties: gram asc).

    Distributed shape: each batch emits per-(doc, gram) COUNTS (a doc
    lives in one row, so cross-batch (doc, gram) duplicates cannot
    exist); one partial-agg groupby on gram then counts documents (rows)
    and sums occurrences. The gram stream is corpus-sized but collapses
    per batch before the exchange; only the aggregated gram table (≤
    vocabulary^n but in practice near-linear) is sorted for the head.
    """
    import pyarrow as pa

    from ccl_ray.stages.aggregates import partitioned_groupby_agg

    class DocGrams:
        def __init__(self):
            import re

            self.tok = re.compile(TOKEN_RE)

        def __call__(self, df: pd.DataFrame) -> pa.Table:
            ids, grams, cnts = [], [], []
            for did, t in zip(df["doc_id"].values, df["text"]):
                ws = self.tok.findall(t.lower())
                if len(ws) < n:
                    continue
                gs = [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
                u, c = np.unique(np.array(gs, dtype=object), return_counts=True)
                ids.append(np.full(len(u), did, np.int64))
                grams.append(u)
                cnts.append(c.astype(np.int64))
            if not ids:
                return pa.table(
                    {"gram": pa.array([], pa.string()),
                     "docs": pa.array([], pa.int64()),
                     "occ": pa.array([], pa.int64())}
                )
            return pa.table(
                {"gram": pa.array(np.concatenate(grams), pa.string()),
                 "docs": pa.array(np.ones(sum(len(x) for x in ids), np.int64)),
                 "occ": pa.array(np.concatenate(cnts))}
            )

    agg = partitioned_groupby_agg(
        docs.map_batches(DocGrams, batch_format="pandas",
                         concurrency=(1, 8), max_restarts=0),
        ["gram"],
        {"n_docs": ("docs", "sum"), "n_occ": ("occ", "sum")},
    )

    def keep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater_equal(t.column("n_docs"), min_docs))

    return (
        agg.map_batches(keep, batch_format="pyarrow")
        .sort(["n_occ", "gram"], descending=[True, False])
        .limit(k)
    )
