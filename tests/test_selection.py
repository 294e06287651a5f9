"""Exact distributed quantile selection (stages/selection.py)."""
import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.selection import _key_to_float, _order_key, exact_group_quantile


def test_order_key_total_order_roundtrip():
    rng = np.random.RandomState(3)
    x = np.concatenate(
        [
            rng.uniform(-1e9, 1e9, 500),
            [-0.0, 0.0, 1e-300, -1e-300, 1e300, -1e300, 0.5, -0.5],
        ]
    )
    k = _order_key(x)
    order_f = np.argsort(x, kind="stable")
    order_k = np.argsort(k, kind="stable")
    assert np.array_equal(x[order_f], x[order_k])
    # roundtrip every key back to its float (-0.0 normalizes to +0.0)
    back = np.array([_key_to_float(int(v)) for v in k])
    assert np.array_equal(back, np.where(x == 0.0, 0.0, x))


def test_exact_group_quantile_vs_numpy():
    rng = np.random.RandomState(7)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c", "d"], n),
            "v": np.round(rng.uniform(-100, 100, n), 4),
        }
    )
    # odd- and even-count groups, plus a singleton and a duplicate-heavy one
    df = pd.concat(
        [
            df,
            pd.DataFrame({"g": ["solo"], "v": [42.5]}),
            pd.DataFrame({"g": ["dup"] * 10, "v": [7.25] * 10}),
        ],
        ignore_index=True,
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    out = exact_group_quantile(ds, "g", "v", q=0.5).to_pandas().set_index("g")

    for g, grp in df.groupby("g"):
        v = np.sort(grp["v"].to_numpy(np.float64))
        h = (len(v) - 1) * 0.5
        lo, hi = v[int(np.floor(h))], v[int(np.ceil(h))]
        want = lo + (hi - lo) * (h - np.floor(h))
        want = np.copysign(np.floor(abs(want) * 1e6 + 0.5) / 1e6, want)
        assert out.loc[g, "n"] == len(v)
        assert out.loc[g, "q0_5"] == want, g


def test_exact_group_quantile_other_q():
    rng = np.random.RandomState(9)
    df = pd.DataFrame({"g": ["x"] * 1001, "v": rng.uniform(0, 1, 1001)})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = exact_group_quantile(ds, "g", "v", q=0.9).to_pandas()
    v = np.sort(df["v"].to_numpy(np.float64))
    h = 1000 * 0.9
    want = v[900]  # exact integer rank: no interpolation
    want = np.floor(want * 1e6 + 0.5) / 1e6
    assert out["q0_9"].iloc[0] == want
