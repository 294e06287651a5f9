"""Round-5 batch-13 operators: Benford first-digit census vs a string
brute force (with decade-boundary probes), and per-type lag-1 hourly
autocorrelation vs numpy corrcoef on the zero-filled series — both also
cross-checked against their DuckDB oracle twins on the same tiny tables."""
import math

import duckdb
import numpy as np
import pandas as pd

from ccl_ray.pipelines.queries import q_benford_digits, q_hourly_autocorr


def _write(tmp_path, name, df):
    p = tmp_path / f"{name}.parquet"
    df.to_parquet(p, index=False)
    return str(tmp_path)


def _oracle(sf_dir: str, sql: str, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def test_benford_digits_vs_bruteforce(tmp_path):
    rng = np.random.RandomState(7)
    # include decade boundaries and float-cent hazards: 999.995 rounds to
    # 100000 cents (digit 1), 9.99 → 999 (digit 9), plus log-uniform bulk
    prices = np.concatenate(
        [
            10.0 ** rng.uniform(0, 5, 500),
            np.array([999.995, 9.99, 1.0, 0.01, 100000.0, 9999.99]),
        ]
    )
    sf = _write(tmp_path, "lineitem", pd.DataFrame({"l_extendedprice": prices}))
    out = q_benford_digits(sf).to_pandas().sort_values("digit")

    cents = np.floor(prices * 100.0 + 0.5).astype(np.int64)
    first = np.array([int(str(abs(c))[0]) for c in cents])
    want = pd.Series(first).value_counts().sort_index()
    assert list(out["digit"]) == list(want.index)
    assert list(out["n"]) == list(want.values)
    tot = int(want.sum())
    for d, n, share, ben in out.itertuples(index=False):
        assert share == round(float(int(n)) / float(tot), 6)
        assert ben == round(math.log10(1.0 + 1.0 / float(d)), 6)

    from ccl_ray.pipelines.queries import ORACLE_SQL

    o = _oracle(sf, ORACLE_SQL["benford_digits"], ["lineitem"]).sort_values(
        "digit"
    )
    assert list(o["digit"]) == list(out["digit"])
    assert list(o["n"]) == list(out["n"])
    assert np.allclose(o["share"], out["share"])
    assert np.allclose(o["benford"], out["benford"])


def test_hourly_autocorr_vs_numpy(tmp_path):
    rng = np.random.RandomState(13)
    n = 600
    # two types with different periodicity; leave hour gaps so the
    # zero-fill path engages (gaps MUST count as zero-volume hours)
    hours = np.concatenate(
        [rng.choice(np.arange(0, 48, 2), n // 2),  # even hours only → gaps
         rng.randint(0, 48, n - n // 2)]
    )
    ty = np.array(["even"] * (n // 2) + ["uni"] * (n - n // 2))
    ts = pd.to_datetime(hours * 3_600_000_000 + rng.randint(0, 3_600_000_000, n),
                        unit="us").astype("datetime64[us]")  # match testdata unit
    sf = _write(tmp_path, "events", pd.DataFrame({"event_type": ty, "ts": ts}))
    out = q_hourly_autocorr(sf).to_pandas().set_index("event_type")

    mn, mx = int(hours.min()), int(hours.max())
    H = mx - mn + 1
    for t in ("even", "uni"):
        series = np.zeros(H, np.int64)
        hs, cs = np.unique(hours[ty == t], return_counts=True)
        series[hs - mn] = cs
        r = np.corrcoef(series[:-1], series[1:])[0, 1]
        assert abs(out.loc[t, "autocorr_lag1"] - r) < 2e-6
        assert out.loc[t, "n"] == H - 1

    from ccl_ray.pipelines.queries import ORACLE_SQL

    o = _oracle(sf, ORACLE_SQL["hourly_autocorr"], ["events"]).set_index(
        "event_type"
    )
    assert np.allclose(o["autocorr_lag1"], out.loc[o.index, "autocorr_lag1"])
    assert list(o["n"]) == list(out.loc[o.index, "n"])


def test_hourly_autocorr_degenerate_series_excluded(tmp_path):
    # a type with ONE event (all pairs zero except an edge) can still have
    # variance; a truly constant series (single hour span, H-1 = 0 pairs)
    # must be excluded on both sides rather than divide by zero
    ts = pd.to_datetime([3_600_000_000 * 5 + 1000] * 4, unit="us").astype(
        "datetime64[us]"
    )
    sf = _write(
        tmp_path, "events",
        pd.DataFrame({"event_type": ["solo"] * 4, "ts": ts}),
    )
    out = q_hourly_autocorr(sf).to_pandas()
    assert len(out) == 0

    from ccl_ray.pipelines.queries import ORACLE_SQL

    o = _oracle(sf, ORACLE_SQL["hourly_autocorr"], ["events"])
    assert len(o) == 0


def test_hub_attack_vs_oracle(tmp_path):
    # tiny random events table driven through the full composition
    # (degree top-K → filtered edge family → BSP CC → damage scalars)
    # and cross-checked against the recursive-closure SQL twin
    rng = np.random.RandomState(3)
    n = 300
    ts = pd.to_datetime(
        rng.randint(0, 48, n) * 3_600_000_000 + rng.randint(0, 3_600_000_000, n),
        unit="us",
    ).astype("datetime64[us]")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 20, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            "ts": ts,
        }
    ).sort_values("ts").reset_index(drop=True)
    sf = _write(tmp_path, "events", df)

    from ccl_ray.pipelines.queries import ORACLE_SQL, q_hub_attack

    out = q_hub_attack(sf).to_pandas()
    o = _oracle(sf, ORACLE_SQL["hub_attack"], ["events"])
    assert out["n_survivors"][0] == n - 100
    for c in out.columns:
        if out[c].dtype.kind == "f":
            assert abs(out[c][0] - o[c][0]) < 1e-9
        else:
            assert int(out[c][0]) == int(o[c][0])


def test_hapax_rate_vs_bruteforce(tmp_path):
    import re

    rng = np.random.RandomState(5)
    words = ["alpha", "beta", "gamma", "Delta5", "x1"]
    texts = [
        " ".join(rng.choice(words, rng.randint(1, 8)).tolist())
        + (" unique%d" % i if i % 3 == 0 else "")
        for i in range(60)
    ] + [""]  # empty doc: tokenizer must drop it, not emit a null term
    langs = rng.choice(["en", "fr"], 61)
    sf = _write(tmp_path, "documents",
                pd.DataFrame({"lang": langs, "text": texts}))

    from ccl_ray.pipelines.queries import ORACLE_SQL, q_hapax_rate

    out = q_hapax_rate(sf).to_pandas().set_index("lang")
    tok = re.compile(r"[a-z0-9]+")
    for lg in ("en", "fr"):
        cnt = {}
        for t in np.array(texts)[langs == lg]:
            for w in tok.findall(t.lower()):
                cnt[w] = cnt.get(w, 0) + 1
        vocab = len(cnt)
        hapax = sum(1 for v in cnt.values() if v == 1)
        assert out.loc[lg, "vocab"] == vocab
        assert out.loc[lg, "hapax"] == hapax
        assert out.loc[lg, "n_tokens"] == sum(cnt.values())
        assert out.loc[lg, "hapax_rate"] == round(hapax / vocab, 6)

    o = _oracle(sf, ORACLE_SQL["hapax_rate"], ["documents"]).set_index("lang")
    assert (o["vocab"] == out.loc[o.index, "vocab"]).all()
    assert np.allclose(o["hapax_rate"], out.loc[o.index, "hapax_rate"])
