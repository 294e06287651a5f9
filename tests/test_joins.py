"""asof_join / range_count_join edge cases beyond the SQL-oracle gate."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.joins import asof_join, range_count_join

_US_H = 3_600_000_000


def _ts(hours):
    return (np.asarray(hours, dtype=np.int64) * _US_H).astype("datetime64[us]")


def _left(keys, hours):
    return rd.from_arrow(
        pa.table(
            {
                "lid": pa.array(range(len(keys)), pa.int64()),
                "k": pa.array(keys, pa.int64()),
                "ts": pa.array(_ts(hours), pa.timestamp("us")),
            }
        )
    )


def _right(keys, hours, vals):
    return rd.from_arrow(
        pa.table(
            {
                "rk": pa.array(keys, pa.int64()),
                "rts": pa.array(_ts(hours), pa.timestamp("us")),
                "v": pa.array(vals, pa.int64()),
            }
        )
    )


def _run_asof(l, r):
    out = asof_join(
        l, r, left_key="k", right_key="rk", left_ts="ts", right_ts="rts", right_vals=["v"]
    ).to_pandas()
    return out.sort_values("lid").reset_index(drop=True)


def test_asof_basic_equal_and_between():
    l = _left([1, 1, 1, 2], [5, 10, 3, 7])
    r = _right([1, 1, 2], [5, 8, 9], [50, 80, 90])
    out = _run_asof(l, r)
    # ts=5 matches the equal-ts right row; ts=10 the newest earlier (8);
    # ts=3 has no earlier row -> null; key 2 at ts=7 has only a later row
    assert out["v"].tolist()[0] == 50
    assert out["v"].tolist()[1] == 80
    assert pd.isna(out["v"].tolist()[2])
    assert pd.isna(out["v"].tolist()[3])


def test_asof_string_keys():
    """String join keys route via hash_strings_np + factorized codes (no
    int cast) and match exactly like integer keys."""
    l = rd.from_arrow(
        pa.table(
            {
                "lid": pa.array([0, 1, 2, 3], pa.int64()),
                "k": pa.array(["a", "a", "b", "c"], pa.string()),
                "ts": pa.array(_ts([5, 10, 7, 4]), pa.timestamp("us")),
            }
        )
    )
    r = rd.from_arrow(
        pa.table(
            {
                "rk": pa.array(["a", "a", "b"], pa.string()),
                "rts": pa.array(_ts([5, 8, 9]), pa.timestamp("us")),
                "v": pa.array([50, 80, 90], pa.int64()),
            }
        )
    )
    out = _run_asof(l, r)
    assert out["v"].tolist()[0] == 50  # equal ts
    assert out["v"].tolist()[1] == 80  # newest earlier
    assert pd.isna(out["v"].tolist()[2])  # right row is later
    assert pd.isna(out["v"].tolist()[3])  # key absent on right


def test_asof_empty_right_and_unknown_keys():
    l = _left([1, 2], [1, 2])
    r = _right([], [], [])
    out = _run_asof(l, r)
    assert len(out) == 2 and out["v"].isna().all()
    # keys present on left only
    r2 = _right([9], [0], [99])
    out2 = _run_asof(l, r2)
    assert out2["v"].isna().all()


def test_range_count_window_edges():
    # builds at hours 0.0, 0.5, 1.0; probe at 1.0 counts [0.0, 1.0):
    # 0.0 included (>= ts-1h), 0.5 included, 1.0 excluded (< ts)
    ev = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([0, 1, 2], pa.int64()),
                "event_type": pa.array(["a"] * 3, pa.string()),
                "ts": pa.array(
                    (np.array([0, 18, 36]) * 600 * 1_000_000).astype("datetime64[us]"),
                    pa.timestamp("us"),
                ),
            }
        )
    ).materialize()
    out = (
        range_count_join(ev, ev, key="event_type", ts_col="ts", window_hours=1)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # hours: 0.0, 3.0h? no: 18*600s = 3h. Recompute: ts are 0h, 3h, 6h — all
    # farther apart than 1h, so all counts 0
    assert out["n_in_window"].tolist() == [0, 0, 0]


def test_range_count_cross_bucket():
    # probe at 1.5h counts builds in [0.5h, 1.5h): builds at 0.6h (bucket 0)
    # and 1.2h (bucket 1) — the 0.6h build lives in the PREVIOUS bucket and
    # is only visible through replication
    h = np.array([0.6, 1.2, 1.5])
    ev = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array([0, 1, 2], pa.int64()),
                "event_type": pa.array(["a"] * 3, pa.string()),
                "ts": pa.array((h * _US_H).astype(np.int64).astype("datetime64[us]"),
                               pa.timestamp("us")),
            }
        )
    ).materialize()
    out = (
        range_count_join(ev, ev, key="event_type", ts_col="ts", window_hours=1)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["n_in_window"].tolist() == [0, 1, 2]


def test_frame_sample_fanout_and_determinism():
    from ccl_ray.stages.multimodal import docs_to_videos, frame_sample

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "n_chars": pa.array([0, 3, 7], pa.int64()),
            }
        )
    )
    out = frame_sample(docs_to_videos(docs), every_k=2, fake=True).to_pandas()
    # n_frames = 4 + n_chars % 8 -> 4, 7, 11; sampled every 2 -> 2, 4, 6 rows
    counts = out.groupby("media_id").size().to_dict()
    assert counts == {1: 2, 2: 4, 3: 6}
    # deterministic checksums across runs
    out2 = frame_sample(docs_to_videos(docs), every_k=2, fake=True).to_pandas()
    a = out.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    b = out2.sort_values(["media_id", "frame_idx"]).reset_index(drop=True)
    assert (a["checksum"].values == b["checksum"].values).all()


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)), min_size=0, max_size=40),
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 50)), min_size=0, max_size=40),
)
@settings(max_examples=20, deadline=None)
def test_asof_matches_pandas_merge_asof(lrows, rrows):
    """Random keys/timestamps vs pandas merge_asof(direction='backward')."""
    # right must be unique per (key, ts): keep max value per pair
    rmap = {}
    for i, (k, h) in enumerate(rrows):
        rmap[(k, h)] = max(rmap.get((k, h), -1), i + 100)
    rk = [k for k, _ in rmap]
    rh = [h for _, h in rmap]
    rv = [rmap[(k, h)] for k, h in rmap]

    l = _left([k for k, _ in lrows], [h for _, h in lrows])
    r = _right(rk, rh, rv)
    out = asof_join(
        l, r, left_key="k", right_key="rk", left_ts="ts", right_ts="rts", right_vals=["v"]
    ).to_pandas()
    if not lrows:
        assert len(out) == 0
        return
    got = out.sort_values("lid").reset_index(drop=True)

    ldf = pd.DataFrame(
        {"lid": range(len(lrows)), "k": [k for k, _ in lrows], "ts": _ts([h for _, h in lrows])}
    ).sort_values("ts", kind="stable")
    rdf = pd.DataFrame({"k": rk, "rts": _ts(rh), "v": rv}).sort_values("rts", kind="stable")
    if len(rdf):
        want = pd.merge_asof(ldf, rdf, left_on="ts", right_on="rts", by="k",
                             direction="backward")
    else:
        want = ldf.assign(v=np.nan)
    want = want.sort_values("lid").reset_index(drop=True)
    gv = got.sort_values("lid")["v"].values.astype(float)
    wv = want["v"].values.astype(float)
    assert len(gv) == len(wv)
    assert ((np.isnan(gv) & np.isnan(wv)) | (gv == wv)).all(), (gv, wv)


def test_running_window_vs_pandas():
    """running_window vs pandas groupby window functions on random events,
    string AND int keys, P=1 vs P=4 agreement."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ccl_ray.stages.window import running_window

    rng = np.random.RandomState(7)
    n = 500
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.randint(0, 40, n).astype(np.int64),
            "ts": pd.to_datetime(rng.randint(0, 10**9, n), unit="s"),
            "value": np.round(rng.uniform(-50, 50, n), 4),
        }
    )
    g = df.sort_values(["user_id", "ts", "event_id"]).copy()
    g["running_count"] = g.groupby("user_id").cumcount() + 1
    g["cents"] = np.floor(g["value"].values * 100 + 0.5).astype(np.int64)
    g["running_cents"] = g.groupby("user_id")["cents"].cumsum()
    g["delta_us"] = (
        g.groupby("user_id")["ts"].diff().dt.total_seconds() * 1e6
    )
    want = g.set_index("event_id")[["running_count", "running_cents", "delta_us"]]

    for P in (1, 4):
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3)
        out = running_window(ds, num_partitions=P).to_pandas().set_index("event_id")
        assert len(out) == n
        out = out.loc[want.index]
        assert (out["running_count"] == want["running_count"]).all()
        assert (out["running_cents"] == want["running_cents"]).all()
        wd = want["delta_us"]
        od = out["delta_us"].astype("float64")
        assert (od[wd.notna()] == wd[wd.notna()]).all()
        assert od[wd.isna()].isna().all()


def test_collect_seq_string_key_and_order():
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ccl_ray.stages.window import collect_seq

    rng = np.random.RandomState(3)
    n = 200
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.array([f"u{int(x)}" for x in rng.randint(0, 12, n)], dtype=object),
            "ts": pd.to_datetime(rng.randint(0, 10**6, n), unit="s"),
            "event_type": np.array([f"t{int(x)}" for x in rng.randint(0, 5, n)], dtype=object),
        }
    )
    g = df.sort_values(["user_id", "ts", "event_id"]).groupby("user_id")
    want = {
        k: (",".join(v["event_type"]), len(v)) for k, v in g
    }
    for P in (1, 4):
        out = collect_seq(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3),
            num_partitions=P,
        ).to_pandas()
        got = {r.user_id: (r.seq, r.n_events) for r in out.itertuples()}
        assert got == want, f"P={P}"


def test_hash_join_preserves_int_types():
    """The sort shuffle can round-trip blocks through pandas, promoting
    int64-with-nulls to float64; hash_join must emit its DECLARED schema."""
    import pyarrow as pa

    from ccl_ray.stages.exchange import hash_join

    l = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                  "lv": pa.array([10, 20, 30], pa.int64())})
    ).repartition(2)
    r = rd.from_arrow(
        pa.table({"rk": pa.array([2, 3], pa.int64()),
                  "rv": pa.array([200, 300], pa.int64())})
    )
    for how in ("inner", "left outer"):
        out = hash_join(l, r, left_on="k", right_on="rk", how=how, num_partitions=4)
        sch = dict(zip(out.schema().names, out.schema().types))
        assert sch["k"] == pa.int64() and sch["lv"] == pa.int64(), (how, sch)
        assert sch["rv"] == pa.int64(), (how, sch)
        df = out.to_pandas().sort_values("k").reset_index(drop=True)
        if how == "inner":
            assert df["k"].tolist() == [2, 3] and df["rv"].tolist() == [200, 300]
        else:
            assert df["k"].tolist() == [1, 2, 3]
            assert pd.isna(df["rv"][0]) and df["rv"][1] == 200


def test_hash_join_full_range_int64_keys_survive_shuffle():
    """Keys above 2^53 must come through the shuffle bit-exact: the tagged
    union zero-fills (never null-fills) the other side's columns so pandas
    round-trips cannot promote int64 to float64."""
    import pyarrow as pa

    from ccl_ray.stages.exchange import hash_join

    big = [(1 << 62) + 1, (1 << 62) + 3, (1 << 53) + 7]
    l = rd.from_arrow(
        pa.table({"k": pa.array(big, pa.int64()),
                  "lv": pa.array([(1 << 60) + 11, (1 << 60) + 12, (1 << 60) + 13], pa.int64())})
    ).repartition(2)
    r = rd.from_arrow(
        pa.table({"rk": pa.array(big, pa.int64()),
                  "rv": pa.array([(1 << 61) + 5, (1 << 61) + 6, (1 << 61) + 7], pa.int64())})
    )
    out = hash_join(l, r, left_on="k", right_on="rk", num_partitions=4).to_pandas()
    assert sorted(out["k"].tolist()) == sorted(big)
    assert sorted(out["lv"].tolist()) == [(1 << 60) + 11, (1 << 60) + 12, (1 << 60) + 13]
    assert sorted(out["rv"].tolist()) == [(1 << 61) + 5, (1 << 61) + 6, (1 << 61) + 7]


def test_ema_scan_vs_sequential():
    """ema_scan vs a per-key sequential python recurrence (identical float
    op order), string AND long segments (positions > 52 exercise rounding),
    P=1 vs P=4 agreement."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ccl_ray.stages.window import ema_scan

    rng = np.random.RandomState(11)
    n = 600
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            # key 0 gets ~half the rows: one segment far beyond 52 steps
            "user_id": np.where(rng.rand(n) < 0.5, 0, rng.randint(1, 30, n)).astype(np.int64),
            "ts": pd.to_datetime(rng.randint(0, 10**9, n), unit="s"),
            "value": np.round(rng.uniform(-50, 50, n), 4),
        }
    )
    import math

    g = df.sort_values(["user_id", "ts", "event_id"])
    want = {}
    prev_key, y = None, 0.0
    for eid, k, x in zip(g["event_id"], g["user_id"], g["value"]):
        y = float(x) if k != prev_key else 0.5 * float(x) + 0.5 * y
        prev_key = k
        # half-away-from-zero like SQL round() (and the engine) — python's
        # round is half-to-even and drifts on the dyadic α=½ ties
        want[int(eid)] = math.copysign(math.floor(abs(y) * 1e6 + 0.5) / 1e6, y)

    for P in (1, 4):
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3)
        out = ema_scan(ds, num_partitions=P).to_pandas().set_index("event_id")
        assert len(out) == n
        got = out["ema"].to_dict()
        assert got == want, f"P={P}"
