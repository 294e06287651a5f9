"""ccl_ray — a Ray-Data-native link-graph / data-processing engine.

A from-scratch reimplementation of the capabilities of michaelleerilee/CCL
(connected component labeling over implicit graphs, per-component aggregates,
translation-table label algebra) generalized to an explicit edge-table world,
plus PageRank, min-label propagation, wedge-based triangle counting, and the
large-scale training-data operators (dedup, similarity search, text analysis,
multimodal plumbing) a 100 TB pipeline needs.

Everything is expressed over ``ray.data.Dataset`` with ``map_batches`` on
zero-copy Arrow batches; wide steps are groupby/aggregate/sort/hash-join;
stateful stages are actor pools or worker-process-cached shards.

Library code NEVER calls ``ray.init`` / ``ray.shutdown`` — sessions are owned
by the caller (tests' conftest fixture, bench.py, or the driver).
"""

from ccl_ray.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
