"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in ccl_ray library code) calls ray.init/ray.shutdown.

- entry(): flagship pipeline (events graph → CC + PageRank) on sf0.001.
- queries(): one callable per implemented operator/pipeline (SURVEY.md §2 +
  the training-data operators); each takes sf_dir.
- oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query
  (identical column names; see ccl_ray/pipelines/queries.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from ccl_ray.pipelines.flagship import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from ccl_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ccl_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
