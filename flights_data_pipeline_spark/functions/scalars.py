"""Shared scalar-expression library (SURVEY.md §2.8 F1-F9).

The column builders every module of the engine agrees on — money
discipline, deterministic surrogate keys, the reference's day-window
predicate, null-safe JSON extraction. The query modules
(``queries/relational.py``, ``queries/shapes.py``,
``queries/streaming.py``, ``pipeline/transforms.py``) all route
through these builders so the conventions are stated exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: unit separator used in surrogate keys (SURVEY.md §7.4.4).
SK_SEP = "␟"


def money(c: Column | str) -> Column:
    """DECIMAL(18,2) money discipline — never float (SURVEY.md §7.4.3)."""
    return (F.col(c) if isinstance(c, str) else c).cast("decimal(18,2)")


def money_out(c: Column | str) -> Column:
    """Final-OUTPUT rendering of a money value: exact DECIMAL(18,2)
    internally, cast to DOUBLE at the result surface.

    Both Spark and DuckDB cast the same decimal to the same nearest
    IEEE-754 double, so cross-engine value hashes match regardless of
    how a comparator canonicalizes decimal scale (``123.4`` vs
    ``123.40`` renderings diverge; their double image is one value).
    Every query's oracle SQL applies the identical
    ``CAST(CAST(x AS DECIMAL(18,2)) AS DOUBLE)`` on its side.
    """
    return money(c).cast("double")


def surrogate_key(*cols: Column | str) -> Column:
    """Deterministic md5 surrogate key over the business key — the
    engine's replacement for the reference's uuid() audit ids
    (reference ER diagram `images/warehousestg.png`; SURVEY.md §7.4.4).
    DuckDB twin: ``md5(CAST(a AS VARCHAR) || chr(9247) || ...)``."""
    cast = [
        (F.col(c) if isinstance(c, str) else c).cast("string") for c in cols
    ]
    return F.md5(F.concat_ws(SK_SEP, *cast))


def day_window(ts: Column | str, ds: str) -> Column:
    """The reference's closed day window (inclusive 23:59:59 —
    reference ``dags/flights_data_pipeline.py:102-109``; the sub-second
    blind spot is reproduced, not fixed: SURVEY.md §7.4.2)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return c.between(f"{ds} 00:00:00", f"{ds} 23:59:59")


def json_str(col: Column | str, path: str, default: str | None = None) -> Column:
    """Null-safe JSON string extraction (F2+F3): the reference's
    ``->>'key'`` with optional default."""
    got = F.get_json_object(F.col(col) if isinstance(col, str) else col, path)
    return F.coalesce(got, F.lit(default)) if default is not None else got


def delay_seconds(actual: Column | str, scheduled: Column | str) -> Column:
    """F5: actual - scheduled in whole seconds (NULL-propagating)."""
    a = F.col(actual) if isinstance(actual, str) else actual
    s = F.col(scheduled) if isinstance(scheduled, str) else scheduled
    return (F.unix_timestamp(a) - F.unix_timestamp(s)).cast("bigint")
