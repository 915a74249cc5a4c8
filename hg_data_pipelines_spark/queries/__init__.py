"""Declared queries: the engine's operator inventory, oracle-checked.

Every operator from SURVEY.md §2 that is batch-expressible is declared here as
a named query: a ``(spark, sf_dir) -> DataFrame`` callable plus (where SQL can
express it) an ANSI-SQL oracle that DuckDB runs on the same parquet tables.
The driver hash-compares both sides — this package IS the correctness surface.

Import side effects register queries into ``REGISTRY``.
"""

from __future__ import annotations

from .common import ORACLES, QUERIES, query  # noqa: F401

# Registration side effects — order defines presentation order.
from . import relational  # noqa: E402,F401
from . import tpch_ext  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import stats_q  # noqa: E402,F401
from . import quality_q  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import graph_q  # noqa: E402,F401
from . import udfs  # noqa: E402,F401
from . import geometry_q  # noqa: E402,F401
from . import streaming_q  # noqa: E402,F401
from . import warehouse_q  # noqa: E402,F401
