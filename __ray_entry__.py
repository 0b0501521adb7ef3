"""Driver contract for the graft builder (Ray Data target).

entry(): flagship encode+verify pipeline on sf0.001 (SURVEY.md §3.2a).
queries(): one entry per implemented operator/pipeline (SURVEY.md §2.2).
oracle_sql(): DuckDB-equivalent SQL for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported; no
function here (nor any fileconvert_ray library code) calls
``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: partitioned encode,
    then decode-verify; returns the per-partition verify table
    (ok=True rows == round-trip bit-identical)."""
    from fileconvert_ray.functions.queries import q_encode_roundtrip

    return q_encode_roundtrip("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from fileconvert_ray.functions.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from fileconvert_ray.functions.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
