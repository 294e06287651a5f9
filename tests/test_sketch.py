"""HyperLogLog distinct-count sketch vs exact cardinalities."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.sketch import hll_distinct


def test_hll_accuracy_across_cardinalities():
    """p=14 → σ ≈ 0.8%; assert 3σ (covers both the linear-counting and the
    raw-estimator branches) and determinism across partitionings."""
    for n in (100, 5_000, 200_000):
        vals = np.arange(n).repeat(3)
        np.random.RandomState(1).shuffle(vals)
        ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())})).repartition(6)
        est4 = hll_distinct(ds, "x", num_partitions=4)
        assert abs(est4 - n) / n < 0.025, (n, est4)
        est1 = hll_distinct(ds, "x", num_partitions=1)
        # max-merge is order/partitioning-free → identical estimate
        assert est1 == est4, (n, est1, est4)


def test_hll_strings_and_empty():
    ds = rd.from_arrow(
        pa.table({"s": pa.array([f"u{i % 37}" for i in range(500)], pa.string())})
    ).repartition(4)
    est = hll_distinct(ds, "s")
    assert abs(est - 37) / 37 < 0.05
    empty = rd.from_arrow(pa.table({"s": pa.array([], pa.string())}))
    assert hll_distinct(empty, "s") == 0.0


def test_hll_distinct_by_groups():
    import pandas as pd
    import ray.data as rd

    from ccl_ray.stages.sketch import hll_distinct_by

    rng = np.random.default_rng(5)
    n = 20_000
    df = pd.DataFrame(
        {
            "k": np.where(rng.random(n) < 0.5, "a", "b"),
            "v": rng.integers(0, 3000, n),
        }
    )
    ds = rd.from_pandas(df).repartition(6)
    est = hll_distinct_by(ds, "k", "v").to_pandas().set_index("k")["est"]
    exact = df.groupby("k")["v"].nunique()
    for k in ("a", "b"):
        assert abs(est[k] - exact[k]) <= max(1.0, 0.03 * exact[k])


def test_hll_distinct_by_partition_invariant():
    import pandas as pd
    import ray.data as rd

    from ccl_ray.stages.sketch import hll_distinct_by

    df = pd.DataFrame({"k": ["x"] * 500 + ["y"] * 300, "v": list(range(500)) + list(range(300))})
    a = hll_distinct_by(rd.from_pandas(df).repartition(1), "k", "v").to_pandas()
    b = hll_distinct_by(rd.from_pandas(df).repartition(7), "k", "v").to_pandas()
    # register max-merge is order-free: identical estimates at any split
    assert dict(zip(a["k"], a["est"])) == dict(zip(b["k"], b["est"]))


def test_cms_never_underestimates_and_partition_invariant():
    import pandas as pd
    import ray.data as rd

    from ccl_ray.stages.sketch import cms_counts, cms_estimate

    rng = np.random.default_rng(9)
    vals = rng.zipf(1.5, 30_000).astype(np.int64) % 1000
    df = pd.DataFrame({"v": vals})
    cms1 = cms_counts(rd.from_pandas(df).repartition(1), "v", w=2048)
    cms8 = cms_counts(rd.from_pandas(df).repartition(8), "v", w=2048)
    assert (cms1 == cms8).all()  # sum-merge is exact
    uniq, exact = np.unique(vals, return_counts=True)
    est = cms_estimate(cms1, uniq)
    assert (est >= exact).all()
    n = len(vals)
    assert (est <= exact + 4 * n // 2048).all()


def test_weighted_bernoulli_sample_semantics():
    import pandas as pd
    import ray.data as rd

    from ccl_ray.stages.sample import weighted_bernoulli_sample

    df = pd.DataFrame(
        {
            "id": np.arange(2000, dtype=np.int64),
            "w": np.concatenate(
                [np.zeros(500), np.full(500, 2000.0), np.full(1000, 50.0)]
            ),
        }
    )
    out = (
        weighted_bernoulli_sample(
            rd.from_pandas(df).repartition(5), id_col="id", weight_col="w", scale=10.0
        )
        .to_pandas()
        .sort_values("id")
    )
    got = set(out["id"])
    assert not (got & set(range(500)))  # w=0 never sampled
    assert set(range(500, 1000)) <= got  # w*scale >= denom always sampled
    mid = len(got & set(range(1000, 2000)))
    assert 0 < mid < 1000  # rate 0.05: some but not all
    out1 = (
        weighted_bernoulli_sample(
            rd.from_pandas(df).repartition(1), id_col="id", weight_col="w", scale=10.0
        )
        .to_pandas()
        .sort_values("id")
    )
    assert list(out1["id"]) == list(out["id"])  # partition-invariant


# ------------------------------------------------------------- bloom


def test_bloom_no_false_negatives_and_fp_rate():
    from ccl_ray.stages.sketch import bloom_build, bloom_might_contain

    keys = np.arange(0, 20_000, 2, dtype=np.int64)  # evens
    ds = rd.from_arrow(pa.table({"k": pa.array(keys, pa.int64())})).repartition(6)
    bloom = bloom_build(ds, "k")
    # zero false negatives — the guarantee callers rely on
    assert bloom_might_contain(bloom, pa.table({"k": keys}).to_pandas()["k"]).all()
    # absent keys (odds): fp rate well under the ~2% design point at 10 bits/key
    import pandas as pd

    absent = pd.Series(np.arange(1, 200_001, 2, dtype=np.int64))
    fp = bloom_might_contain(bloom, absent).mean()
    assert fp < 0.02, fp


def test_bloom_partition_invariant_and_strings():
    import pandas as pd

    from ccl_ray.stages.sketch import bloom_build, bloom_might_contain

    vals = [f"key-{i % 313}" for i in range(4000)]
    ds = rd.from_arrow(pa.table({"s": pa.array(vals, pa.string())}))
    b1 = bloom_build(ds.repartition(1), "s")
    b8 = bloom_build(ds.repartition(8), "s")
    # OR-merge is order-free → bit-identical word arrays
    assert (b1 == b8).all()
    assert bloom_might_contain(b8, pd.Series(["key-0", "key-312"])).all()
    assert not bloom_might_contain(b8, pd.Series([f"nope-{i}" for i in range(50)])).all()


def test_bloom_prefilter_plus_exact_equals_exact():
    """prefilter → exact membership == plain exact membership (no false
    negatives means the prefilter may only drop certainly-absent rows)."""
    import pandas as pd

    from ccl_ray.stages.sketch import bloom_build, bloom_prefilter

    rng = np.random.RandomState(7)
    big = pd.DataFrame(
        {"k": rng.randint(0, 5000, size=30_000).astype(np.int64),
         "v": np.arange(30_000, dtype=np.int64)}
    )
    keyset = np.arange(0, 5000, 7, dtype=np.int64)
    small = rd.from_arrow(pa.table({"k": pa.array(keyset, pa.int64())}))
    bloom = bloom_build(small, "k")
    surv = (
        bloom_prefilter(rd.from_pandas(big).repartition(6), bloom, "k")
        .to_pandas()
    )
    # exact filter on survivors matches exact filter on the full input
    want = big[big["k"].isin(keyset)].sort_values("v")
    got = surv[surv["k"].isin(keyset)].sort_values("v")
    assert list(got["v"]) == list(want["v"])
    # and the prefilter actually pruned non-matching rows
    assert len(surv) < len(big)


def test_tdigest_rank_error_bounds():
    """δ=400 k1-scale digest: rank error well under 1% mid-range and
    near-exact at the tails, across distributions and partitionings."""
    import pandas as pd

    from ccl_ray.stages.sketch import tdigest_build, tdigest_quantile

    rng = np.random.default_rng(11)
    qs = np.array([0.001, 0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99, 0.999])
    for vals in (
        rng.normal(0, 1, 60_000),
        rng.lognormal(0, 2, 60_000),        # heavy right tail
        np.floor(rng.random(60_000) * 10),  # massive ties
    ):
        sv = np.sort(vals)
        for P in (1, 6):
            ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(P)
            td = tdigest_build(ds, "x", num_partitions=P)
            est = tdigest_quantile(td, qs)
            # exact rank error: with ties a value's rank is the whole
            # interval [F(v-), F(v)] — error is the distance from q to it
            lo = np.searchsorted(sv, est, side="left") / len(sv)
            hi = np.searchsorted(sv, est, side="right") / len(sv)
            err = np.maximum(lo - qs, qs - hi).clip(min=0)
            mid = (qs >= 0.05) & (qs <= 0.95)
            assert (err[mid] < 0.01).all(), (P, err)
            assert (err[~mid] < 0.005).all(), (P, err)
        # extremes are tracked exactly
        assert tdigest_quantile(td, [0.0])[0] == sv[0]
        assert tdigest_quantile(td, [1.0])[0] == sv[-1]


def test_tdigest_edge_cases():
    import pandas as pd
    import pytest

    from ccl_ray.stages.sketch import tdigest_build, tdigest_quantile

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.float64())}))
    td = tdigest_build(empty, "x")
    assert td["n"] == 0 and np.isnan(tdigest_quantile(td, [0.5])[0])

    one = rd.from_arrow(pa.table({"x": pa.array([3.5], pa.float64())}))
    td1 = tdigest_build(one, "x")
    assert tdigest_quantile(td1, [0.0, 0.5, 1.0]).tolist() == [3.5, 3.5, 3.5]

    # NaN input fails loudly, never skews quantiles silently
    bad = rd.from_arrow(pa.table({"x": pa.array([1.0, float("nan")], pa.float64())}))
    with pytest.raises(Exception, match="NaN"):
        tdigest_build(bad, "x")


def test_tdigest_by_groups_rank_bounds():
    import pandas as pd

    from ccl_ray.stages.sketch import td_unpack, tdigest_by, tdigest_quantile

    rng = np.random.default_rng(23)
    n = 40_000
    keys = np.where(rng.random(n) < 0.7, "x", "y")
    vals = np.where(keys == "x", rng.normal(0, 1, n), rng.lognormal(0, 1, n))
    ds = rd.from_pandas(pd.DataFrame({"k": keys, "v": vals})).repartition(6)
    out = tdigest_by(ds, "k", "v").to_pandas()
    assert sorted(out["k"]) == ["x", "y"]
    qs = np.array([0.05, 0.5, 0.95])
    for k in ("x", "y"):
        sv = np.sort(vals[keys == k])
        td = td_unpack(out.set_index("k")["td"][k])
        assert td["n"] == len(sv)
        est = tdigest_quantile(td, qs)
        lo = np.searchsorted(sv, est, side="left") / len(sv)
        hi = np.searchsorted(sv, est, side="right") / len(sv)
        err = np.maximum(lo - qs, qs - hi).clip(min=0)
        assert (err < 0.01).all(), (k, err)
        assert tdigest_quantile(td, [0.0])[0] == sv[0]
        assert tdigest_quantile(td, [1.0])[0] == sv[-1]
