"""Property-based tests (hypothesis): custom operators vs brute-force
reference semantics on random inputs."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flights_data_pipeline_spark.operators.joins import asof_join

BASE = dt.datetime(2024, 1, 1)


def _ts(minutes: int) -> dt.datetime:
    return BASE + dt.timedelta(minutes=minutes)


# right side: unique (key, time) pairs so the as-of match is well-defined
rights = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30)), unique=True, max_size=12
)
lefts = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30)), min_size=1, max_size=12
)


def _brute_asof(lefts, rights, strict):
    out = {}
    for i, (k, t) in enumerate(lefts):
        best = None
        for rk, rt in rights:
            if rk != k:
                continue
            if (rt < t) if strict else (rt <= t):
                if best is None or rt > best:
                    best = rt
        out[i] = best
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lefts=lefts, rights=rights, strict=st.booleans())
def test_asof_matches_bruteforce(spark, lefts, rights, strict):
    ldf = spark.createDataFrame(
        [(i, k, _ts(t)) for i, (k, t) in enumerate(lefts)],
        "left_id INT, k INT, ts TIMESTAMP",
    )
    rdf = spark.createDataFrame(
        [(k, _ts(t), t) for (k, t) in rights] or [(99, _ts(0), 0)],
        "k INT, ts TIMESTAMP, rmin INT",
    )
    got = {
        r.left_id: r.rmin
        for r in asof_join(
            ldf, rdf, on="k", left_time="ts", right_time="ts",
            right_values=["rmin"], strict=strict,
        ).collect()
    }
    want = _brute_asof(lefts, rights if rights else [(99, 0)], strict)
    assert got == want
