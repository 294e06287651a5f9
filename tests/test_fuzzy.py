"""Edit-distance-1 fuzzy pair stage (stages/fuzzy.py)."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.fuzzy import _editdist_le1, editdist1_pairs


def _lev(a: str, b: str) -> int:
    # reference DP, test-only
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[n]


def test_editdist_le1_matches_dp():
    rng = np.random.default_rng(3)
    alpha = "abc"
    strs = [
        "".join(rng.choice(list(alpha), size=rng.integers(1, 7)))
        for _ in range(300)
    ]
    a = [strs[i] for i in range(0, 300, 2)]
    b = [strs[i] for i in range(1, 300, 2)]
    pairs = [(x, y) for x, y in zip(a, b) if x != y]
    got = _editdist_le1(
        np.array([p[0] for p in pairs], object), np.array([p[1] for p in pairs], object)
    )
    want = np.array([_lev(x, y) <= 1 for x, y in pairs])
    assert (got == want).all()
    assert want.any() and not want.all()  # the sample exercises both sides


def test_editdist1_pairs_pipeline():
    rows = [
        "cold bolt", "old bolt", "cold bolts", "colt bolt",
        "zzz", "cold bolt", "old bolt",  # duplicates collapse
    ]
    ds = rd.from_arrow(pa.table({"p_name": pa.array(rows, pa.string())}))
    out = editdist1_pairs(ds, "p_name", cfg=EngineConfig(num_partitions=2)).to_pandas()
    got = set(zip(out["name_a"], out["name_b"]))

    names = sorted(set(rows))
    want = {
        (x, y)
        for i, x in enumerate(names)
        for y in names[i + 1 :]
        if _lev(x, y) == 1
    }
    assert got == want
    assert ("cold bolt", "old bolt") in got  # deletion
    assert ("cold bolt", "cold bolts") in got  # insertion
    assert ("cold bolt", "colt bolt") in got  # substitution


def test_editdist1_pairs_empty_and_nulls():
    ds = rd.from_arrow(
        pa.table({"p_name": pa.array(["abc", None, "", "abc"], pa.string())})
    )
    out = editdist1_pairs(ds, "p_name", cfg=EngineConfig(num_partitions=2)).to_pandas()
    assert len(out) == 0
