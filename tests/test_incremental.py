"""Warm-start (incremental) connected components.

Contract under test (cc_bsp.connected_components_bsp(seed_labels=...)):
labels from a prior CC run over a subgraph seed the full-graph fixpoint,
which must converge to the IDENTICAL min-vid labels in fewer (or equal)
waves. Reference analog: marker seeding across slices
(ccl_marker_stack.py markers_from_above / user-supplied markers).
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from ccl_ray.config import EngineConfig
from ccl_ray.stages.cc_bsp import connected_components_bsp


def _edges(pairs):
    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    return rd.from_arrow(pa.table({"src": a, "dst": b}))


def _labels_dict(ds):
    df = ds.to_pandas()
    return dict(zip(df["vid"].astype(int), df["label"].astype(int)))


def _cfg(**kw):
    return EngineConfig(num_partitions=2, dense_ids=False, **kw)


def test_warm_equals_cold_and_saves_waves():
    # long path: cold CC needs multiple hash-to-min+jump waves; warm-starting
    # from the path-minus-last-edge labels must land the same labels faster
    n = 512
    full = [(i, i + 1) for i in range(n - 1)] + [(2000, 2001)]
    old = full[:-2]  # drop the last path edge and the separate pair

    cold = connected_components_bsp(_edges(full), cfg=_cfg())
    old_res = connected_components_bsp(_edges(old), cfg=_cfg())
    warm = connected_components_bsp(
        _edges(full), cfg=_cfg(), seed_labels=old_res.labels
    )

    assert _labels_dict(warm.labels) == _labels_dict(cold.labels)
    assert warm.iterations < cold.iterations
    lab = _labels_dict(warm.labels)
    assert all(v == 0 for k, v in lab.items() if k <= n - 1)
    assert lab[2000] == 2000 and lab[2001] == 2000


def test_stale_seeds_dropped():
    # seeds referencing vids absent from the current graph must be ignored
    full = [(1, 2), (2, 3), (10, 11)]
    seeds = rd.from_arrow(
        pa.table(
            {
                "vid": np.array([999, 2], np.int64),  # 999 not in graph
                "label": np.array([999, 1], np.int64),
            }
        )
    )
    warm = connected_components_bsp(_edges(full), cfg=_cfg(), seed_labels=seeds)
    lab = _labels_dict(warm.labels)
    assert lab == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    assert 999 not in lab


def test_warm_random_subset_property():
    # any edge subset's labels are a valid seeding: warm == cold labels
    rng = np.random.default_rng(7)
    m, vmax = 300, 120
    src = rng.integers(0, vmax, m)
    dst = rng.integers(0, vmax, m)
    keep = src != dst
    full = list(zip(src[keep].tolist(), dst[keep].tolist()))
    old = [e for i, e in enumerate(full) if i % 3 != 0]

    cold = connected_components_bsp(_edges(full), cfg=_cfg())
    old_res = connected_components_bsp(_edges(old), cfg=_cfg())
    warm = connected_components_bsp(
        _edges(full), cfg=_cfg(), seed_labels=old_res.labels
    )
    assert _labels_dict(warm.labels) == _labels_dict(cold.labels)


def test_seed_requires_original_domain():
    seeds = rd.from_arrow(
        pa.table({"vid": np.array([1], np.int64), "label": np.array([1], np.int64)})
    )
    with pytest.raises(AssertionError, match="original vid domain"):
        connected_components_bsp(
            _edges([(1, 2)]),
            cfg=EngineConfig(num_partitions=2, dense_ids=True),
            seed_labels=seeds,
        )
