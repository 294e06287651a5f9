"""Round-5 batch-2 operators: skyline, lag transitions, square count,
weighted median (each vs a brute-force oracle, with partition variation)."""
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.linkpred import square_count
from ccl_ray.stages.selection import exact_group_weighted_median
from ccl_ray.stages.skyline import _pareto_mask, skyline
from ccl_ray.stages.window import lag_transitions


def _brute_skyline(df, senses):
    names = list(senses)
    pts = df[names].drop_duplicates().to_numpy(np.float64)
    vs = pts * np.array([[-1.0 if senses[c] == "min" else 1.0 for c in names]])
    keep = []
    for i in range(len(vs)):
        dominated = False
        for j in range(len(vs)):
            if (vs[j] >= vs[i]).all() and (vs[j] > vs[i]).any():
                dominated = True
                break
        if not dominated:
            keep.append(i)
    out = pd.DataFrame(pts[keep], columns=names)
    return out.sort_values(names).reset_index(drop=True)


def test_skyline_vs_bruteforce():
    rng = np.random.RandomState(11)
    df = pd.DataFrame(
        {
            "a": rng.randint(0, 30, 800).astype(float),
            "b": np.round(rng.uniform(0, 100, 800), 2),
            "c": rng.randint(0, 10, 800).astype(float),
        }
    )
    senses = {"a": "max", "b": "max", "c": "min"}
    # small block_cap forces multi-block local prune + merge
    for parts, cap in [(1, 4096), (7, 64)]:
        ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(parts)
        got = skyline(ds, senses, block_cap=cap).to_pandas().reset_index(drop=True)
        want = _brute_skyline(df, senses)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_skyline_duplicates_and_single_point():
    # duplicate frontier tuples collapse to one DISTINCT row; a dominating
    # point leaves a one-row skyline
    df = pd.DataFrame({"x": [5.0, 5.0, 1.0, 3.0], "y": [5.0, 5.0, 1.0, 4.0]})
    out = skyline(rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
                  {"x": "max", "y": "max"}).to_pandas()
    assert out.values.tolist() == [[5.0, 5.0]]


def test_pareto_mask_strictness():
    # equal tuples never dominate each other — both survive
    m = _pareto_mask([np.array([1.0, 1.0]), np.array([2.0, 2.0])], ["max", "max"])
    assert m.tolist() == [True, True]


def test_lag_transitions_known():
    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6, 7],
            "user_id": [1, 1, 1, 2, 2, 3, 1],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:01:00", "2024-01-01 00:02:00",
                 "2024-01-01 00:00:30", "2024-01-01 00:00:10", "2024-01-01 09:00:00",
                 "2024-01-01 00:03:00"]
            ),
            "event_type": ["a", "b", "a", "b", "a", "a", "a"],
        }
    )
    # user 1 ordered: a,b,a,a -> (a,b),(b,a),(a,a); user 2 ordered by ts:
    # id5(a) then id4(b) -> (a,b); user 3: single row, no transition
    ds = rd.from_arrow(pa.Table.from_pandas(ev, preserve_index=False)).repartition(3)
    got = (
        lag_transitions(ds, num_partitions=4)
        .to_pandas()
        .sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"from_type": ["a", "a", "b"], "to_type": ["a", "b", "a"], "n": [1, 2, 1]}
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _brute_squares(edges):
    # count 4-cycles by codegree over all unordered pairs
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    vids = sorted(adj)
    total = 0
    pairs = 0
    for i, u in enumerate(vids):
        for v in vids[i + 1 :]:
            c = len(adj[u] & adj[v])
            if c:
                pairs += 1
                total += c * (c - 1) // 2
    assert total % 2 == 0
    return total // 2, pairs


def test_square_count_vs_bruteforce():
    rng = np.random.RandomState(5)
    n = 60
    m = 250
    raw = {(int(a), int(b)) for a, b in rng.randint(0, n, (m, 2)) if a != b}
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw})
    want_sq, want_pairs = _brute_squares(edges)
    et = pa.table({"src": pa.array([e[0] for e in edges], pa.int64()),
                   "dst": pa.array([e[1] for e in edges], pa.int64())})
    for P in (1, 4):
        got_sq, got_pairs = square_count(
            rd.from_arrow(et), cfg=EngineConfig(num_partitions=P)
        )
        assert (got_sq, got_pairs) == (want_sq, want_pairs), P


def test_square_count_known_graphs():
    # C4 = one square; K4 = 3 squares
    c4 = rd.from_arrow(pa.table({"src": pa.array([0, 1, 2, 0], pa.int64()),
                                 "dst": pa.array([1, 2, 3, 3], pa.int64())}))
    assert square_count(c4, cfg=EngineConfig(num_partitions=2))[0] == 1
    k4e = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    k4 = rd.from_arrow(pa.table({"src": pa.array([e[0] for e in k4e], pa.int64()),
                                 "dst": pa.array([e[1] for e in k4e], pa.int64())}))
    assert square_count(k4, cfg=EngineConfig(num_partitions=2))[0] == 3


def test_square_count_hub_path():
    # star K_{1,40}: no squares, C(40,2) codegree pairs through the hub;
    # max_center_degree=8 forces the budget-bounded hub range path
    src = [0] * 40
    dst = list(range(1, 41))
    ds = rd.from_arrow(pa.table({"src": pa.array(src, pa.int64()),
                                 "dst": pa.array(dst, pa.int64())}))
    sq, pairs = square_count(ds, cfg=EngineConfig(num_partitions=4),
                             max_center_degree=8)
    assert (sq, pairs) == (0, 40 * 39 // 2)


def _brute_wmedian(df):
    out = {}
    for g, grp in df.groupby("g"):
        grp = grp.sort_values("v")
        tw = grp["w"].sum()
        cw = grp["w"].cumsum()
        out[g] = (int(tw), float(grp.loc[cw * 2 >= tw, "v"].iloc[0]))
    return out


def test_weighted_median_vs_bruteforce():
    rng = np.random.RandomState(13)
    n = 3000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": np.round(rng.uniform(-50, 50, n), 3),
            "w": rng.randint(1, 9, n).astype(np.int64),
        }
    )
    # a group whose total weight is hit exactly mid-duplicate, plus negatives
    df = pd.concat(
        [df, pd.DataFrame({"g": ["z"] * 4, "v": [-1.5, -1.5, 2.0, 3.0],
                           "w": [1, 1, 1, 1]})],
        ignore_index=True,
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(6)
    got = exact_group_weighted_median(ds, "g", "v", "w").to_pandas().set_index("g")
    for g, (tw, wm) in _brute_wmedian(df).items():
        assert got.loc[g, "tw"] == tw, g
        assert got.loc[g, "wmedian"] == wm, g
