"""chunk_pack: the distributed ordered prefix sum vs a numpy reference."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from ccl_ray.stages.pack import chunk_pack


def _run(keys, vals, cap, P):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(keys, pa.int64()), "n_tokens": pa.array(vals, pa.int64())})
    )
    out = chunk_pack(ds, cap=cap, num_partitions=P).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_chunk_pack_matches_numpy_prefix_sum(ray_session):
    rng = np.random.default_rng(7)
    keys = rng.permutation(np.arange(100, 1100, 3, dtype=np.int64))
    vals = rng.integers(0, 50, size=len(keys)).astype(np.int64)  # some zeros
    cap = 64
    out = _run(keys, vals, cap, P=4)

    order = np.argsort(keys)
    k, n = keys[order], vals[order]
    keep = n > 0
    k, n = k[keep], n[keep]
    start = np.cumsum(n) - n
    assert out["doc_id"].tolist() == k.tolist()
    assert out["n_tokens"].tolist() == n.tolist()
    assert out["start_off"].tolist() == start.tolist()
    assert out["first_pack"].tolist() == (start // cap).tolist()
    assert out["last_pack"].tolist() == ((start + n - 1) // cap).tolist()
    # continuity across range partitions: offsets are gap-free
    assert out["start_off"].iloc[-1] + out["n_tokens"].iloc[-1] == n.sum()


def test_chunk_pack_partition_invariance(ray_session):
    rng = np.random.default_rng(11)
    keys = rng.permutation(np.arange(0, 500, dtype=np.int64))
    vals = rng.integers(1, 9, size=len(keys)).astype(np.int64)
    a = _run(keys, vals, cap=16, P=1)
    b = _run(keys, vals, cap=16, P=7)
    assert a.equals(b)


def test_chunk_pack_empty(ray_session):
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "n_tokens": pa.array([0, 0], pa.int64())})
    )
    out = chunk_pack(ds, cap=8, num_partitions=3)
    assert out.count() == 0
    # ds.schema() survives even though to_pandas() of an all-empty Dataset
    # drops columns (the known Ray quirk)
    assert out.schema().names == ["doc_id", "n_tokens", "start_off", "first_pack", "last_pack"]
