"""Ray-free DRAM-roofline probe for the BSP per-iteration kernel.

Runs the exact hot-loop kernel (label gather through an int32 edge index →
permute → minimum.reduceat) in k INDEPENDENT OS processes — no Ray, no
shared state — to measure how the bare kernel scales with process count on
this machine. Used as the normalization baseline for the engine's N→4N
scaling efficiency (BENCH/BASELINE.md): if the bare kernel stops scaling,
no engine built on it can scale further on one socket.

Also compares label VALUE dtypes (int64 vs int32): the verdict's testable
prediction is that halving the gathered bytes (dense int32 label domain)
moves the bandwidth ceiling. Run:

    python tools/probe_roofline.py            # k in {1, 8, 32}, both dtypes
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

N_EDGES = 4_000_000   # edges per process-shard (matches bench shard scale)
N_VIDS = 500_000
ITERS = 12


def kernel_once(labels, edge_idx, dst_order, seg_starts):
    vals = labels[edge_idx]
    vs = vals[dst_order]
    return np.minimum.reduceat(vs, seg_starts)


def run_worker(dtype_name: str, q):
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 1 << 30, N_VIDS).astype(dtype_name)
    edge_idx = rng.randint(0, N_VIDS, N_EDGES).astype(np.int32)
    dst_order = rng.permutation(N_EDGES).astype(np.int32)
    seg_starts = np.sort(rng.choice(N_EDGES, size=N_VIDS // 2, replace=False)).astype(np.int64)
    seg_starts[0] = 0
    kernel_once(labels, edge_idx, dst_order, seg_starts)  # warm
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        kernel_once(labels, edge_idx, dst_order, seg_starts)
        times.append(time.perf_counter() - t0)
    q.put(float(np.median(times)))


def measure(k: int, dtype_name: str) -> dict:
    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    procs = [ctx.Process(target=run_worker, args=(dtype_name, q)) for _ in range(k)]
    for p in procs:
        p.start()
    medians = [q.get() for _ in procs]
    for p in procs:
        p.join()
    per_proc = [N_EDGES / t for t in medians]
    return {
        "k": k,
        "dtype": dtype_name,
        "per_proc_meps": round(float(np.median(per_proc)) / 1e6, 1),
        "aggregate_meps": round(float(sum(per_proc)) / 1e6, 1),
    }


def main():
    ks = [int(x) for x in sys.argv[1:]] or [1, 8, 32]
    out = []
    for dt in ["int64", "int32"]:
        for k in ks:
            r = measure(k, dt)
            out.append(r)
            print(json.dumps(r), flush=True)
    by = {(r["k"], r["dtype"]): r["aggregate_meps"] for r in out}
    for dt in ["int64", "int32"]:
        if (8, dt) in by and (32, dt) in by:
            print(
                f"{dt}: 8->32 procs aggregate {by[(8, dt)]}->{by[(32, dt)]} MEPS, "
                f"ratio {by[(32, dt)] / by[(8, dt)]:.2f}x, "
                f"efficiency {(by[(32, dt)] / by[(8, dt)]) / 4:.2f}"
            )


if __name__ == "__main__":
    main()
