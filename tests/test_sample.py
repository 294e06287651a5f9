"""Deterministic sampling + per-group top-N (stages/sample.py, vocab)."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.sample import _md5_low64, stratified_sample, top_n_per_group


def _docs_ds(n=200, blocks=3):
    rng = np.random.RandomState(5)
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array([f"s{i % 4}" for i in range(n)]),
            "text": pa.array([f"w{rng.randint(0, 9)} common w{i % 7}" for i in range(n)]),
        }
    )
    return rd.from_arrow(t).repartition(blocks)


def test_stratified_sample_deterministic_and_partition_invariant():
    want = None
    for blocks in (1, 5):
        out = stratified_sample(
            _docs_ds(blocks=blocks), rates={"s0": 1.0, "s1": 0.0}, default_rate=0.3,
            columns=["doc_id", "source"],
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        if want is None:
            want = out
        else:
            assert out.equals(want)
    # rate 1.0 keeps every s0 row, rate 0.0 drops every s1 row
    assert (want[want["source"] == "s0"]["doc_id"].count()) == 50
    assert (want["source"] != "s1").all()
    # default stratum follows the md5 rule exactly
    rest = want[~want["source"].isin(["s0", "s1"])]["doc_id"].values
    all_rest = np.array([i for i in range(200) if i % 4 >= 2])
    keep = all_rest[_md5_low64(all_rest) % np.uint64(10_000) < np.uint64(3000)]
    assert sorted(rest) == sorted(keep)


def test_top_n_per_group_vs_pandas():
    rng = np.random.RandomState(9)
    n = 500
    ts = pd.Timestamp("2026-01-01").value // 1000 + rng.randint(0, 50, n) * 1_000_000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 40, n).astype(np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
        }
    )
    # duplicate timestamps within users exist (50 distinct ts, ~12 rows/user):
    # the id tie-break must decide deterministically
    want = df.assign(
        rn=df.sort_values(["ts", "event_id"], ascending=[False, True])
        .groupby("user_id")
        .cumcount()
        + 1
    )
    want = want[want["rn"] <= 3].sort_values("event_id").reset_index(drop=True)
    for P in (1, 4):
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3)
        out = (
            top_n_per_group(ds, 3, num_partitions=P)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)[want.columns.tolist()]
        )
        pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_top_n_larger_than_group():
    df = pd.DataFrame(
        {
            "event_id": np.array([1, 2], dtype=np.int64),
            "user_id": np.array([7, 7], dtype=np.int64),
            "ts": pd.to_datetime([10, 20], unit="s"),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = top_n_per_group(ds, 5).to_pandas().sort_values("rn")
    assert out["event_id"].tolist() == [2, 1] and out["rn"].tolist() == [1, 2]


def test_vocab_top_terms_vs_counter():
    from collections import Counter

    from ccl_ray.stages.text import vocab_top_terms

    ds = _docs_ds()
    texts = ds.to_pandas()["text"]
    import re

    cnt = Counter(w for t in texts for w in re.findall("[a-z0-9]+", t.lower()))
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    out = vocab_top_terms(ds, k=5).to_pandas()
    got = sorted(zip(out["term"], out["n"].astype(int)), key=lambda kv: (-kv[1], kv[0]))
    assert got == want


def test_grouped_zscore_vs_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ccl_ray.stages.aggregates import grouped_zscore

    rng = np.random.RandomState(11)
    n = 300
    df = pd.DataFrame(
        {
            "g": np.array([f"g{int(x)}" for x in rng.randint(0, 9, n)], dtype=object),
            "k": np.arange(n, dtype=np.int64),
            "x": rng.randint(0, 50, n).astype(np.int64),
        }
    )
    gm = df.groupby("g")["x"].transform("mean")
    gs = df.groupby("g")["x"].transform("std", ddof=0)
    want = np.round(np.where(gs.values > 0, (df["x"] - gm) / gs.values, 0.0), 6)
    wmap = dict(zip(df["k"], want))
    for P in (1, 4):
        out = grouped_zscore(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3),
            group_col="g", val_col="x", num_partitions=P,
        ).to_pandas()
        got = dict(zip(out["k"], out["z"]))
        assert len(got) == n
        assert all(got[k] == wmap[k] for k in wmap), f"P={P}"


def test_degree_assortativity_vs_numpy():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ccl_ray.config import EngineConfig
    from ccl_ray.stages.aggregates import degree_assortativity

    rng = np.random.RandomState(23)
    n, m = 50, 160
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    # serial oracle over distinct loop-free undirected edges
    und = {(int(a), int(b)) for a, b in zip(src, dst) if a != b}
    und = {(min(a, b), max(a, b)) for a, b in und}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = np.array([deg[a] for a, b in und] + [deg[b] for a, b in und], float)
    ys = np.array([deg[b] for a, b in und] + [deg[a] for a, b in und], float)
    want = round(float(np.corrcoef(xs, ys)[0, 1]), 6)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(3)
    for P in (1, 4):
        t = degree_assortativity(edges, cfg=EngineConfig(num_partitions=P))
        got = t.column("assortativity").to_pylist()[0]
        assert abs(got - want) < 2e-6, f"P={P}: {got} vs {want}"


def test_grouped_quantiles_vs_numpy():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ccl_ray.stages.aggregates import grouped_quantiles

    rng = np.random.RandomState(31)
    n = 400
    df = pd.DataFrame(
        {
            "g": np.array([f"t{int(x)}" for x in rng.randint(0, 7, n)], dtype=object),
            "x": np.round(rng.uniform(-10, 10, n), 3),
        }
    )
    want = {
        k: (round(float(np.quantile(v["x"], 0.5)), 6),
            round(float(np.quantile(v["x"], 0.9)), 6))
        for k, v in df.groupby("g")
    }
    for P in (1, 4):
        out = grouped_quantiles(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3),
            group_col="g", val_col="x", num_partitions=P,
        ).to_pandas()
        got = {r.g: (r.med, r.p90) for r in out.itertuples()}
        assert got == want, f"P={P}"


def test_bottomk_sample_exact_and_partition_invariant():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from ccl_ray.stages.sample import _md5_low64, bottomk_sample

    df = pd.DataFrame(
        {"doc_id": np.arange(3000, dtype=np.int64), "lang": ["en", "de", "fr"] * 1000}
    )
    h = _md5_low64(df["doc_id"].values)
    want = df.iloc[np.lexsort((df["doc_id"].values, h))[:64]].sort_values("doc_id")
    for P in (1, 8):
        got = (
            bottomk_sample(rd.from_pandas(df).repartition(P), 64, id_col="doc_id")
            .to_pandas()
            .sort_values("doc_id")
        )
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["lang"]) == list(want["lang"])
    # k larger than the input: returns everything, no crash
    small = rd.from_pandas(df.head(10)).repartition(3)
    assert bottomk_sample(small, 1000, id_col="doc_id").count() == 10
