"""Round-5 batch-12 operators: bucket-decomposed interval max-concurrency
vs a sequential sweep oracle (with bucket-boundary and tie probes), and the
distributed covariance/PCA moment merge vs one-pass numpy."""
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.window import max_concurrency


def _brute_max_conc(s_us: np.ndarray, e_us: np.ndarray) -> int:
    # sequential sweep: ends (−1) before starts (+1) at the same instant
    pts = sorted(
        [(int(t), 1) for t in s_us] + [(int(t), -1) for t in e_us]
    )
    cur = best = 0
    for _, d in pts:
        cur += d
        best = max(best, cur)
    return best


def _run(df: pd.DataFrame, P: int) -> dict:
    ds = rd.from_pandas(df).repartition(max(P, 1))
    t = max_concurrency(ds, key="event_type", num_partitions=P)
    return dict(zip(t.column("event_type").to_pylist(),
                    t.column("max_conc").to_pylist()))


def _intervals(df: pd.DataFrame):
    s = df["ts"].values.astype("datetime64[us]").astype(np.int64)
    e = s + ((1 + np.floor(df["value"].values)).astype(np.int64)) * 1_000_000
    return s, e


def test_max_concurrency_vs_bruteforce():
    rng = np.random.RandomState(11)
    n = 400
    df = pd.DataFrame(
        {
            "event_type": rng.choice(["a", "b", "c"], n),
            # spread across several hour buckets so the cross-bucket stitch
            # (exclusive prefix of nets) actually engages
            "ts": pd.to_datetime(
                rng.randint(0, 5 * 3600, n) * 1_000_000, unit="us"
            ),
            "value": rng.uniform(0, 4000, n),  # up to ~67 min spans
        }
    )
    want = {}
    for k, g in df.groupby("event_type"):
        s, e = _intervals(g)
        want[k] = _brute_max_conc(s, e)
    for P in (1, 3, 8):
        assert _run(df, P) == want


def test_max_concurrency_boundary_and_ties():
    # interval ending exactly where another starts must NOT overlap it
    # ([s, e) semantics: ends order before starts at tied instants), and an
    # interval spanning several whole buckets exercises empty-bucket offsets
    df = pd.DataFrame(
        {
            "event_type": ["x"] * 3,
            # [0,1s) touches [1s,7202s) at t=1s (no overlap — the tie probe:
            # the −1 end sorts before the +1 start); [1s,7202s) genuinely
            # overlaps [7200s,7201s) and spans ~2h of whole empty buckets
            "ts": pd.to_datetime([0, 1_000_000, 7_200_000_000], unit="us"),
            "value": [0.0, 7200.0, 0.5],
        }
    )
    s, e = _intervals(df)
    assert _brute_max_conc(s, e) == 2
    for P in (1, 4):
        assert _run(df, P) == {"x": 2}


def test_pca_moment_merge_matches_numpy():
    from ccl_ray.pipelines.queries import q_pca_close

    t = q_pca_close("/root/testdata/sf0.001")
    assert t.column("top_component_matches").to_pylist() == [True]
    assert t.column("eigval_matches").to_pylist() == [True]
    assert t.column("n_vectors").to_pylist() == [500]


def test_template_prefixes_vs_pandas():
    from ccl_ray.pipelines.queries import q_template_prefixes

    got = (
        q_template_prefixes("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("prefix")
        .reset_index(drop=True)
    )
    docs = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    pref = docs["text"].str.split(" ").str[:8].str.join(" ")
    grp = docs.groupby(pref)["doc_id"].agg(["count", "min"]).reset_index()
    want = (
        grp[grp["count"] >= 2]
        .rename(columns={"text": "prefix", "count": "n_docs", "min": "min_doc"})
        .sort_values("prefix")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_docs": "int64", "min_doc": "int64"}),
        want.astype({"n_docs": "int64", "min_doc": "int64"}),
    )
