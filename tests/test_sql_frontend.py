"""End-to-end test of the reference-dialect SQL front-end: run the adapted
reference scripts (examples/*.sql) against a replayed CDC workload and check
the materialized view against the engine's native batch aggregation."""

from __future__ import annotations

from pathlib import Path

import pytest

from flink_cdc_fluss_quickstart_spark.sources import osb
from flink_cdc_fluss_quickstart_spark.sql_frontend import Engine, _split_statements
from flink_cdc_fluss_quickstart_spark.streaming.analytics import revenue_aggregate

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def test_split_statements_handles_quotes_and_comments():
    script = """
    -- a comment; with a semicolon
    SET 'a;b' = 'c';
    SELECT 1; SELECT 2
    """
    stmts = _split_statements(script)
    assert stmts == ["SET 'a;b' = 'c'", "SELECT 1", "SELECT 2"]


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    out = tmp_path_factory.mktemp("sql_workload")
    return osb.generate_workload(str(out), epochs=5, seed=11)


def test_reference_scripts_end_to_end(spark, workload, tmp_path):
    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    eng.bind_source("pg_osb_tickets", workload["tickets"], osb.TICKETS_SCHEMA)
    eng.bind_source("pg_osb_movies", workload["movies"], osb.MOVIES_SCHEMA)

    eng.execute((EXAMPLES / "movies-cdc.sql").read_text())
    eng.execute((EXAMPLES / "tickets-cdc.sql").read_text())
    eng.await_all()

    # staging tables replicated with upsert semantics
    movies = eng.snapshot("movies_staging")
    tickets = eng.snapshot("tickets_staging")
    assert movies.count() == 10  # 2 inserts x 5 epochs, updates collapse
    assert tickets.count() > 0

    eng.execute((EXAMPLES / "revenue-analytics.sql").read_text())
    served = eng.snapshot("movie_revenue_realtime")

    oracle = revenue_aggregate(
        tickets.select("ticket_id", "movie_id", "user_id", "cost", "status", "purchased_at"),
        movies.select("movie_id", "title", "start_date", "duration_minutes"),
    )
    s = sorted(tuple(r) for r in served.select(*oracle.columns).collect())
    o = sorted(tuple(r) for r in oracle.collect())
    assert s == o
    assert len(s) > 0

    # session config captured (reference SET statements)
    assert eng.conf["table.optimizer.agg-phase-strategy"] == "TWO_PHASE"

    # re-running the analytics refresh after more changes keeps the PK
    # semantics (idempotent refresh; groups update in place)
    eng.execute((EXAMPLES / "revenue-analytics.sql").read_text())
    again = eng.snapshot("movie_revenue_realtime")
    assert sorted(tuple(r) for r in again.select(*oracle.columns).collect()) == o
