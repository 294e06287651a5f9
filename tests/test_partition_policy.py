"""One partitioning policy (config.resolve_partitions): every hash-fan-in
stage must produce IDENTICAL results at any partition count, and all stages
must actually consult the policy (CCL_RAY_PARTITIONS env override)."""

import os

import numpy as np
import pandas as pd
import pytest

from ccl_ray.config import resolve_partitions
from ccl_ray.pipelines.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# representative pipelines covering each policy consumer: events edge
# routing, sessionize, LSH pair emission (minhash + simhash), tf-idf
# ranking, hash_join, asof / range joins
_PIPELINES = [
    "edges_build",
    "sessionize",
    "minhash_pairs",
    "simhash_pairs",
    "tfidf_top_terms",
    "asof_join",
    "range_prev_hour",
]


def test_resolver_precedence(monkeypatch):
    assert resolve_partitions(7) == 7
    monkeypatch.setenv("CCL_RAY_PARTITIONS", "13")
    assert resolve_partitions() == 13
    assert resolve_partitions(3) == 3  # explicit still wins
    monkeypatch.delenv("CCL_RAY_PARTITIONS")
    got = resolve_partitions()
    assert 8 <= got <= 256  # CPU-derived default within the clamp


def _run(name: str) -> pd.DataFrame:
    df = QUERIES[name](SF_DIR).to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", _PIPELINES)
def test_results_invariant_to_partition_count(name, monkeypatch):
    """Identical output at a small non-default P (5) and a larger one (11);
    the env override proves the stage consults the shared policy."""
    monkeypatch.setenv("CCL_RAY_PARTITIONS", "5")
    at5 = _run(name)
    monkeypatch.setenv("CCL_RAY_PARTITIONS", "11")
    at11 = _run(name)
    assert len(at5) == len(at11)
    pd.testing.assert_frame_equal(at5, at11)
