"""Streaming operators: watermarked windows (batch-parity) and the
custom stateful refinement operator."""

import pytest
from pyspark.sql import functions as F

from approximatequeryengine_spark.streaming.stateful import (
    running_estimates_stream,
    split_events_for_replay,
)


@pytest.fixture(scope="module")
def refined(engine, spark, tmp_path_factory):
    events = engine.catalog.table("events")
    replay_dir = str(tmp_path_factory.mktemp("replay"))
    split_events_for_replay(events, replay_dir, n_batches=4)
    out = running_estimates_stream(
        spark, replay_dir, spark.read.parquet(replay_dir).schema
    )
    return events, out.collect()


def test_stateful_final_estimates_exact(refined):
    """After the last micro-batch the cumulative running_avg must equal
    the batch AVG over all events of that type."""
    events, rows = refined
    exact = {
        r["event_type"]: (r["avg"], r["n"])
        for r in events.groupBy("event_type")
        .agg(F.avg("value").alias("avg"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    final = {}
    for r in rows:
        if r["event_type"] not in final or r["n_seen"] > final[r["event_type"]]["n_seen"]:
            final[r["event_type"]] = r
    assert set(final) == set(exact)
    for et, r in final.items():
        avg, n = exact[et]
        assert r["n_seen"] == n
        assert r["running_avg"] == pytest.approx(avg, rel=1e-9)
        assert r["ci_lower"] <= r["running_avg"] <= r["ci_upper"]


def test_stateful_emits_per_batch(refined):
    """Each event type should emit once per micro-batch it appears in,
    with monotonically growing n_seen and a valid status."""
    _, rows = refined
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, emits in by_type.items():
        ns = sorted(r["n_seen"] for r in emits)
        assert len(emits) > 1, f"{et}: expected multiple micro-batch emissions"
        assert len(set(ns)) == len(ns), f"{et}: n_seen must strictly grow"
        for r in emits:
            assert r["status"] in ("STABLE", "DRIFTING", "INSUFFICIENT_DATA")


def test_stateful_ci_narrows(refined):
    """More data → narrower (or equal) CI by the last batch vs the first,
    for types with enough samples."""
    _, rows = refined
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, emits in by_type.items():
        emits = sorted(emits, key=lambda r: r["n_seen"])
        first, last = emits[0], emits[-1]
        if first["n_seen"] >= 50:
            w_first = first["ci_upper"] - first["ci_lower"]
            w_last = last["ci_upper"] - last["ci_lower"]
            assert w_last <= w_first * 1.5
