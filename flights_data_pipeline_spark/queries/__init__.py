"""Declared query registry — the engine contract from SURVEY.md §2.

Every operator family in the survey's inventory gets at least one named
query here: a Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an equivalent ANSI-SQL oracle string that DuckDB runs on
the same parquet tables. ``__spark_entry__.py`` exposes this registry to
the driver's correctness gate.

Registration happens at import time via the ``@query`` decorator in
``registry.py``; importing this package pulls in every query module.
"""

from . import registry  # noqa: F401  (must come first)
from . import relational  # noqa: F401
from . import text  # noqa: F401
from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import streaming  # noqa: F401
from . import advanced  # noqa: F401
from . import io_functions  # noqa: F401
from . import shapes  # noqa: F401
from . import olap  # noqa: F401
from . import timeseries  # noqa: F401
from . import flights  # noqa: F401
from . import profiling  # noqa: F401
from . import curation  # noqa: F401
from . import modern  # noqa: F401
from .registry import REGISTRY, oracle_sql_map, queries_map  # noqa: F401
