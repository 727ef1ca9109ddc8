"""Golden end-to-end tests: every declared query vs its DuckDB oracle at
sf0.001 (mirrors the driver's correctness gate; SURVEY.md section 5 item 2)."""

from __future__ import annotations

import math
import os
from datetime import datetime
from decimal import Decimal

import duckdb
import pytest

from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs
from flink_cdc_fluss_quickstart_spark.tables import TABLE_NAMES, table_path

SF_DIR = "/root/testdata/sf0.001"


def _canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    return v


def _key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return out


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = table_path(SF_DIR, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", sorted(all_specs()))
def test_query_matches_oracle(name, spark, duck):
    spec = all_specs()[name]
    sdf = spec.builder(spark, SF_DIR)
    s_rows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert len(s_rows) >= 0  # rows-only check
        return
    res = duck.execute(spec.oracle)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(sdf.columns) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _key(s_rows, sdf.columns) == _key(d_rows, d_cols)
