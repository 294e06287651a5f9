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


class QualityScore:
    """Length / punctuation / stopword quality signals per document."""

    def __init__(self):
        import re

        self.tok = re.compile(TOKEN_RE)
        self.stop = set(STOPWORDS)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(self.tok)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chars_txt": df["text"].str.len().astype(np.int64),
                "n_tokens": toks.map(len).astype(np.int64),
                "n_punct": df["text"].str.count(r"[.!?,;:]").astype(np.int64),
                "n_stop": toks.map(lambda ws: sum(w in self.stop for w in ws)).astype(np.int64),
            }
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
        import re

        self.tok = re.compile(TOKEN_RE)
        self.markers = _LANG_MARKERS

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.findall(self.tok)

        def best(ws):
            scores = {
                lang: sum(w in vocab for w in ws) for lang, vocab in self.markers.items() if vocab
            }
            top = max(scores.items(), key=lambda kv: (kv[1], kv[0]))
            return top[0] if top[1] > 0 else "und"

        return pd.DataFrame({"doc_id": df["doc_id"], "pred_lang": toks.map(best)})


def token_count(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(TokenCount, batch_format="pandas", concurrency=(1, 8))


def quality_score(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(QualityScore, batch_format="pandas", concurrency=(1, 8))


def fingerprint(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(Fingerprint, batch_format="pandas", concurrency=(1, 8))


def lang_id(docs: "rd.Dataset") -> "rd.Dataset":
    return docs.map_batches(LangId, batch_format="pandas", concurrency=(1, 8))
