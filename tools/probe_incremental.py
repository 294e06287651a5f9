"""Incremental-CC wave-saving probe at transcript bench scale.

Question under test: how many fixpoint waves does warm-starting save when
yesterday's labels seed a run over yesterday+delta? Protocol: take the
cached 128M-directed-edge bench graph, call a deterministic 95% edge
subset "yesterday" (hash(src,dst) % 100 < 95), run

  cold  = CC(full)                          (baseline wave count)
  old   = CC(yesterday)
  warm  = CC(full, seed_labels=old.labels)  (the daily-increment run)

and compare wave counts, walls and a label checksum (warm MUST equal cold
bit-for-bit — the seeding changes the path, never the fixpoint). All three
runs use the original int64 vid domain (dense_ids=False), the domain
incremental workloads live in: dense ranks shift when the vertex set
grows, original vids do not — so walls here are NOT comparable to the
dense-domain headline numbers, only to each other.

Usage: python tools/probe_incremental.py  (expects the bench edge cache;
run bench.py once first). Appends nothing; prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402
import ray.data as rd  # noqa: E402

from ccl_ray.config import EngineConfig  # noqa: E402
from ccl_ray.functions.hashing import stable_hash64_np  # noqa: E402
from ccl_ray.stages.cc_bsp import connected_components_bsp  # noqa: E402

CACHE = os.environ.get("GRAFT_BENCH_CACHE", "/tmp/ccl_ray_bench")
CONVS = int(os.environ.get("GRAFT_BENCH_CONVS", "4000000"))
P = int(os.environ.get("GRAFT_BENCH_PARTS", "32"))


def _label_checksum(labels: "rd.Dataset") -> int:
    """Order-free exact fingerprint: sum of mixed (vid,label) hashes."""

    def part(t: pa.Table) -> pa.Table:
        v = t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64)
        l = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = stable_hash64_np(v.view(np.uint64) * np.uint64(31) + l.view(np.uint64))
        return pa.table({"s": pa.array([int(h.sum(dtype=np.uint64))], pa.uint64())})

    parts = labels.map_batches(part, batch_format="pyarrow").to_pandas()
    return int(np.array(parts["s"].values, np.uint64).sum(dtype=np.uint64))


def main() -> None:
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    edge_cache = os.path.join(CACHE, f"edges_{CONVS}_s42_salt256")
    assert os.path.exists(os.path.join(edge_cache, "_DONE")), "run bench.py once first"
    edges = rd.read_parquet(edge_cache, columns=["src", "dst"]).materialize()

    def old_subset(t: pa.Table) -> pa.Table:
        s = t.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            h = stable_hash64_np(s.view(np.uint64) * np.uint64(1000003) + d.view(np.uint64))
        return t.filter(pa.array((h % np.uint64(100)) < 95))

    olds = edges.map_batches(old_subset, batch_format="pyarrow").materialize()
    cfg = EngineConfig(num_partitions=P, dense_ids=False)

    t0 = time.perf_counter()
    cold = connected_components_bsp(edges, cfg=cfg)
    cold_s = time.perf_counter() - t0
    cold_sum = _label_checksum(cold.labels)

    t0 = time.perf_counter()
    old = connected_components_bsp(olds, cfg=cfg)
    old_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    warm = connected_components_bsp(edges, cfg=cfg, seed_labels=old.labels)
    warm_s = time.perf_counter() - t0
    warm_sum = _label_checksum(warm.labels)

    print(
        json.dumps(
            {
                "edges_directed": int(edges.count() * 2),
                "old_fraction": 0.95,
                "cold_iters": cold.iterations,
                "old_iters": old.iterations,
                "warm_iters": warm.iterations,
                "cold_wall_s": round(cold_s, 2),
                "old_wall_s": round(old_s, 2),
                "warm_wall_s": round(warm_s, 2),
                "labels_identical": bool(cold_sum == warm_sum),
                "domain": "original int64 (dense_ids=False)",
                "P": P,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
