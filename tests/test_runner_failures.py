"""O5: runner retry + failure-alert callback seam.

The reference wires retries=1 and an on_failure_callback alert into
every Airflow task (``dags/flights_data_pipeline.py:49-56``); the
runner mirrors that contract: retry the step, fire the callback once
when retries are exhausted, then propagate the error.
"""

from __future__ import annotations

import pytest

from flights_data_pipeline_spark.pipeline import runner


def test_failing_transform_fires_callback(spark, tmp_path, monkeypatch):
    calls: list[tuple[str, str]] = []

    def boom(spark_, stg):
        raise RuntimeError("transform exploded")

    monkeypatch.setitem(runner.TRANSFORMS, "dim_aircrafts", boom)
    with pytest.raises(RuntimeError, match="transform exploded"):
        runner.run_transforms(
            spark,
            str(tmp_path / "stg"),
            str(tmp_path / "wh"),
            on_failure=lambda step, exc: calls.append((step, str(exc))),
        )
    # transforms within a tier fan out like Airflow's independent
    # tasks: each failing sibling fires ITS OWN callback (here the
    # others fail on the empty test staging dir), and the first
    # failure in TRANSFORM_ORDER is the one that propagates. The
    # essential contract: the exploding step's callback fired exactly
    # once, before the raise.
    assert calls.count(("transform:dim_aircrafts", "transform exploded")) == 1


def test_retry_then_success_does_not_alert(spark, tmp_path, monkeypatch):
    calls = []
    attempts = {"n": 0}

    def flaky(spark_, stg):
        attempts["n"] += 1
        if attempts["n"] == 1:
            raise RuntimeError("transient")
        return spark_.createDataFrame([(1,)], "x INT")

    # isolate to a single-step order so the other transforms (which
    # need real staging data) don't run
    monkeypatch.setattr(runner, "TRANSFORM_ORDER", ["dim_aircrafts"])
    monkeypatch.setitem(runner.TRANSFORMS, "dim_aircrafts", flaky)
    runner.run_transforms(
        spark,
        str(tmp_path / "stg"),
        str(tmp_path / "wh"),
        retries=1,
        on_failure=lambda step, exc: calls.append(step),
    )
    assert attempts["n"] == 2  # failed once, retried, succeeded
    assert calls == []  # alert only fires on FINAL failure


def test_retries_exhausted_alerts_once(spark, tmp_path, monkeypatch):
    calls = []

    def boom(spark_, stg):
        raise RuntimeError("permanent")

    monkeypatch.setattr(runner, "TRANSFORM_ORDER", ["dim_aircrafts"])
    monkeypatch.setitem(runner.TRANSFORMS, "dim_aircrafts", boom)
    with pytest.raises(RuntimeError, match="permanent"):
        runner.run_transforms(
            spark,
            str(tmp_path / "stg"),
            str(tmp_path / "wh"),
            retries=2,
            on_failure=lambda step, exc: calls.append(step),
        )
    assert calls == ["transform:dim_aircrafts"]
