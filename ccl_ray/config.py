"""Engine configuration.

Replaces the reference's module-global ``option`` dict and per-call knob soup
(ccl_marker_stack.py:58-63, 852-879) with one explicit dataclass passed to
pipeline builders.
"""

from __future__ import annotations

from dataclasses import dataclass, field


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
