"""Scale guards for the label-space driver broadcasts (verdict round 2 #1):
above `broadcast_limit` distinct labels, densify_labels and dust_filter must
take their distributed sort+rank / semi-join paths — the driver only ever
holds P per-block counts, never the label space.
"""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.aggregates import dust_filter
from ccl_ray.stages.relabel import densify_labels

N_BIG = 1_050_000  # > 1e6 components (near-all-isolated worst case)


def _labels_ds(n: int, n_blocks: int = 8) -> "rd.Dataset":
    vid = np.arange(n, dtype=np.int64)
    lab = vid * 3 + 7  # sparse label space; rank(label) == vid
    # last 100 vids share one component (survives dust filtering)
    lab[-100:] = lab[-100]
    return rd.from_arrow(
        pa.table({"vid": pa.array(vid), "label": pa.array(lab)})
    ).repartition(n_blocks)


def test_densify_distributed_million_components():
    ds = _labels_ds(N_BIG)
    # broadcast_limit far below the distinct count → distributed path
    out = densify_labels(ds, broadcast_limit=1000).to_pandas()
    assert len(out) == N_BIG
    got = out.sort_values("vid").reset_index(drop=True)
    # ranks are 0..k-1 dense over ASCENDING label order; the first
    # N_BIG-100 vids have strictly increasing labels → dlabel == vid
    n_solo = N_BIG - 100
    assert (got["dlabel"].values[:n_solo] == np.arange(n_solo)).all()
    # the shared component ranks at n_solo (its label is the next-largest)
    assert (got["dlabel"].values[n_solo:] == n_solo).all()


def test_densify_paths_agree():
    ds = _labels_ds(20_000, n_blocks=4)
    bc = densify_labels(ds).to_pandas().sort_values("vid").reset_index(drop=True)
    dist = (
        densify_labels(ds, broadcast_limit=0).to_pandas().sort_values("vid").reset_index(drop=True)
    )
    assert bc[["vid", "label", "dlabel"]].equals(dist[["vid", "label", "dlabel"]])


def test_dust_filter_distributed_million_components():
    ds = _labels_ds(N_BIG)
    out = dust_filter(ds, min_size=2, broadcast_limit=1000).to_pandas()
    assert len(out) == N_BIG
    got = out.sort_values("vid").reset_index(drop=True)
    n_solo = N_BIG - 100
    assert (got["label"].values[:n_solo] == 0).all()  # all isolated → dust
    keep_lab = (N_BIG - 100) * 3 + 7
    assert (got["label"].values[n_solo:] == keep_lab).all()  # size-100 kept


def test_dust_filter_paths_agree():
    ds = _labels_ds(20_000, n_blocks=4)
    bc = dust_filter(ds, min_size=2).to_pandas().sort_values("vid").reset_index(drop=True)
    dist = (
        dust_filter(ds, min_size=2, broadcast_limit=0)
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    assert bc[["vid", "label"]].equals(dist[["vid", "label"]])


def test_labelprop_converged_many_components():
    """Stage-3 request/resolve exchange: 150k 2-vertex components (capped
    only by suite time; the shape is component-count-linear). Every task in
    the resolve exchange holds only the labels its own block references."""
    from ccl_ray.config import EngineConfig
    from ccl_ray.stages.labelprop import min_label_propagation

    n = 150_000
    src = np.arange(0, 2 * n, 2, dtype=np.int64)
    dst = src + 1
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(8)
    # seed every 3rd component at its odd vertex
    sv = dst[::3]
    seeds = rd.from_arrow(
        pa.table({"vid": pa.array(sv), "seed": pa.array(sv * 10)})
    ).repartition(4)
    out = (
        min_label_propagation(edges, seeds, rounds=None, cfg=EngineConfig(num_partitions=8))
        .to_pandas()
        .sort_values("vid")
        .reset_index(drop=True)
    )
    assert len(out) == 2 * n
    got = out["seed_label"].values
    # component of (2k, 2k+1): seeded iff k % 3 == 0, with seed (2k+1)*10
    comp = out["vid"].values // 2
    seeded = comp % 3 == 0
    assert np.array_equal(got[seeded].astype(np.int64), (comp[seeded] * 2 + 1) * 10)
    assert pd.isna(got[~seeded]).all()
