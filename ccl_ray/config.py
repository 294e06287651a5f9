"""Engine configuration.

Replaces the reference's module-global ``option`` dict and per-call knob soup
(ccl_marker_stack.py:58-63, 852-879) with one explicit dataclass passed to
pipeline builders.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def resolve_partitions(explicit: int | None = None) -> int:
    """THE partitioning policy for every hash-fan-in stage — LSH pair
    emission, window passes, joins, tf-idf ranking, co-occurrence routing.

    Precedence: an explicit caller/config value wins; else the
    ``CCL_RAY_PARTITIONS`` env var; else one partition per cluster CPU,
    clamped to [8, 256]. The measured single-node sweep (32 CPUs) showed
    P ∈ {24, 32, 48} indistinguishable and 64 clearly worse, so the default
    tracks CPU count rather than a multiple of it; on a multi-node cluster
    ``ray.cluster_resources()`` grows with the node count and P follows —
    no stage is pinned to a single-node fan-in width.
    """
    if explicit is not None:
        return int(explicit)
    env = os.environ.get("CCL_RAY_PARTITIONS")
    if env:
        return int(env)
    cpus = 0
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    if cpus <= 0:
        cpus = os.cpu_count() or 8
    return max(8, min(256, cpus))


@dataclass
class EngineConfig:
    # Number of hash partitions used for joins / CSR shards. At cluster scale
    # this should be ~2-4x total cores; single-node tests use small values.
    num_partitions: int = 8

    # BSP exchange mode: "grouped" (one object per scatter task; consumers
    # read their piece zero-copy from shared plasma — right for single-node)
    # or "fanout" (num_returns=P; each destination fetches only its piece —
    # right for multi-node where pieces cross the network).
    exchange: str = "grouped"

    # Connected components / label propagation.
    cc_max_iters: int = 256
    # pointer-jump (path compression) rounds per propagate round; 1 gives
    # O(log n) total rounds even on long chains (reference worst case: a
    # component spanning every slice of the stack). Measured on the bench
    # graph, 1 jump round converges in the same iteration count as 2 at
    # ~60% of the wall time (each jump is a 3-wave exchange).
    cc_jump_rounds: int = 1
    # run the jump exchange only every k-th iteration: propagate-only
    # iterations are 2 waves instead of 5, and periodic compression still
    # bounds rounds at O(k log n) on chains. 1 = jump every iteration.
    cc_jump_every: int = 2

    # PageRank.
    pr_damping: float = 0.85
    pr_tol: float = 1e-6
    pr_max_iters: int = 200

    # Convergence-check batching: submit K iterations as one task DAG before
    # reading the changed/L1 scalars. Results are deterministic (the loop
    # stops at the exact first-converged iteration). MEASURED: K>1 is a
    # pessimization on this single node — holding K iterations of shard refs
    # in flight blocks plasma reclamation and quadruples per-iteration wall
    # (0.28s vs 0.83s at K=4 on the 128M-edge bench graph) — so default 1;
    # the knob remains for multi-node experiments. Ignored while
    # checkpointing.
    check_every: int = 1

    # Checkpointing (None disables).
    checkpoint_dir: str | None = None
    checkpoint_every: int = 1

    # Skew control lives in the star builders themselves: shared-key
    # (tool / event_type) co-occurrence groups are star-expanded per SALT
    # sub-group (extra["tool_salts"] for transcripts, EVENT_SALTS for
    # events) and reconnected by a tiny pre-aggregated hub chain, so no
    # single task ever regroups a hot key's full membership.

    # Dense vertex renumbering for the BSP engines: order-preserving global
    # rank (int32 when N < 2^31) halves label-gather bytes per iteration —
    # measured on this box (tools/probe_roofline.py): the bare kernel's
    # 8→32-process scaling efficiency moves 0.56 → 0.69 and absolute
    # aggregate throughput 1.58× at 32 procs.
    dense_ids: bool = True

    # map_batches batch size for vectorized stages (None = Ray default).
    batch_size: int | None = None

    extra: dict = field(default_factory=dict)
