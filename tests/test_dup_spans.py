"""dup_span_counts (cross-document duplicated k-token windows) vs a
sequential brute-force oracle, with partition-count variation."""
import re

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.dedup import dup_span_counts

TOK = re.compile("[a-z0-9]+")


def _brute(docs, k):
    wins = {}  # doc_id -> list of window tuples (positions, with multiplicity)
    for d, t in docs:
        toks = TOK.findall(t.lower())
        wins[d] = [tuple(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    owners = {}  # window -> set of docs
    for d, ws in wins.items():
        for w in ws:
            owners.setdefault(w, set()).add(d)
    return {
        d: sum(1 for w in ws if len(owners[w]) >= 2) for d, ws in wins.items()
    }


def _run(docs, k, P):
    tbl = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
        }
    )
    got = (
        dup_span_counts(rd.from_arrow(tbl).repartition(3), k=k, num_partitions=P)
        .to_pandas()
        .set_index("doc_id")["dup_windows"]
        .to_dict()
    )
    return got


def test_dup_spans_known():
    shared = "alpha beta gamma delta epsilon zeta"  # 6 toks -> 2 5-windows
    docs = [
        (1, "intro " + shared + " tail one"),
        (2, "other prefix " + shared),
        (3, "completely unrelated text with no overlap at all here"),
        (4, ""),  # empty doc -> 0
        (5, "tiny"),  # < k tokens -> 0
    ]
    want = _brute(docs, 5)
    assert want[3] == 0 and want[4] == 0 and want[5] == 0
    assert want[1] >= 2 and want[2] >= 2  # the shared span is detected
    for P in (1, 4):
        assert _run(docs, 5, P) == want, P


def test_dup_spans_within_doc_repeat_not_counted():
    # a window repeated inside ONE doc only is not cross-document duplication
    docs = [(1, "a b c d e a b c d e"), (2, "x y z w v u t")]
    want = _brute(docs, 5)
    assert want == {1: 0, 2: 0}
    assert _run(docs, 5, 2) == want


def test_dup_spans_multiplicity_counted_per_position():
    # doc 1 contains the shared window twice -> both positions count
    shared = "p q r s t"
    docs = [(1, f"{shared} mid {shared}"), (2, shared)]
    want = _brute(docs, 5)
    assert want[1] == 2 and want[2] == 1
    assert _run(docs, 5, 2) == want


def test_dup_spans_random_vs_bruteforce():
    rng = np.random.RandomState(23)
    vocab = [f"w{i}" for i in range(12)]  # small vocab -> frequent collisions
    docs = [
        (i, " ".join(rng.choice(vocab, rng.randint(0, 25)))) for i in range(40)
    ]
    want = _brute(docs, 5)
    for P in (1, 4):
        assert _run(docs, 5, P) == want, P
