"""Adversarial planted-corpus sweep: run EVERY registered query + oracle over
a copy of an sf dir whose documents/events tables carry edge rows the
deterministic generator never produces, and report any cross-engine
divergence.

The per-query oracle gate proves parity ON THE GENERATED DATA; this sweep
proves the engines also agree on the inputs that historically hid latent
divergences -- it found (r8) the phantom-chunk blank-doc row in
context_chunks and the ANSI sequence(1, 0) error behind it, after the same
technique applied at test granularity had already found the DuckDB
json_extract hard-error and the ANSI divide-by-zero class.

Planted edges:
- documents: empty text, whitespace-only text, single-token doc,
  newlines-only doc (token-count / ratio-division / chunking edges)
- events: malformed JSON props, string-typed / non-integral / missing k,
  NULL props, duplicate-timestamp view+purchase (asof ties), events at the
  exact 30-min session gap on exact hour edges, NULL user_id, NULL value,
  negative and >int32 k

Usage:
    python tools/planted_sweep.py [base_sf_dir]   # default /root/testdata/sf0.001

Exits non-zero on any FAIL (same contract as check_oracle.py).
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

import duckdb

# abspath: the symlink targets are stored verbatim, so a relative base dir
# would resolve against the TEMPDIR and every non-edge table dangles
BASE = os.path.abspath(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")

DOC_EDGES = """
  SELECT * FROM (VALUES
    (900001, '', 'en', 'src0', 0),
    (900002, '   ', 'de', 'src1', 3),
    (900003, 'one', 'fr', 'src2', 3),
    (900004, chr(10) || chr(10), 'es', 'src0', 2)
  ) t(doc_id, text, lang, source, n_chars)
"""

# orders with no lineitems / a customer with no orders / orders exactly ON
# the date-range boundaries the TPC-H shapes filter by -- the outer, anti,
# and semi join null-extension paths plus boundary-predicate paths that the
# generator's dense key coverage may never leave unmatched
ORD_EDGES = """
  SELECT * FROM (VALUES
    (900001, 900001, 'F', 123.45, TIMESTAMP '1996-01-01 00:00:00', '1-URGENT'),
    (900002, 900001, 'O', 543.21, TIMESTAMP '1996-12-31 23:59:59', '5-LOW'),
    (900003, 0,      'O',   0.0,  TIMESTAMP '1997-01-01 00:00:00', '3-MEDIUM')
  ) t(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority)
"""

CUST_EDGES = """
  SELECT * FROM (VALUES
    (900001, 'Customer#900001', 0, -999.99, 'BUILDING'),
    (900002, 'Customer#900002', 1,    0.0,  'MACHINERY')
  ) t(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
"""

# lineitem rows against the planted order 900002 (900001 stays
# lineitem-less): NULL ship date (interval comparisons null out in both
# engines), zero quantity, discount at the 0/1 boundaries, a part/supplier
# key that exists nowhere
LI_EDGES = """
  SELECT * FROM (VALUES
    (900002, 1, 1, 1, 0.0,  100.0, 0.0, 0.01, 'N', 'O', NULL::TIMESTAMP),
    (900002, 1, 1, 2, 5.0,  200.0, 1.0, 0.02, 'R', 'F', TIMESTAMP '1996-03-01 00:00:00'),
    (900002, 900001, 900001, 3, 7.0, 300.0, 0.5, 0.0, 'A', 'F', TIMESTAMP '1996-03-02 00:00:00')
  ) t(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate)
"""

# a supplier no lineitem references, with an extreme negative balance, and a
# part no lineitem references whose attributes sit exactly ON the q16/q19
# filter boundaries
SUPP_EDGES = """
  SELECT * FROM (VALUES
    (900009, 'Supplier#900009', 0, -9999.99)
  ) t(s_suppkey, s_name, s_nationkey, s_acctbal)
"""

PART_EDGES = """
  SELECT * FROM (VALUES
    (900009, 'planted part', 'Brand#3', 'PROMO', 1, 0.0)
  ) t(p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
"""

EV_EDGES = """
  SELECT * FROM (VALUES
    (900001, TIMESTAMP '2024-01-10 12:00:00', 77, 'view',     1.5,  'not json'),
    (900002, TIMESTAMP '2024-01-10 12:00:30', 77, 'view',     2.5,  '{"k": "3"}'),
    (900003, TIMESTAMP '2024-01-10 12:01:00', 77, 'purchase', 3.5,  '{"x": 9}'),
    (900004, TIMESTAMP '2024-01-10 12:01:30', 77, 'view',     4.5,  NULL),
    (900005, TIMESTAMP '2024-01-11 08:00:00', 78, 'view',     1.0,  '{"k": 1}'),
    (900006, TIMESTAMP '2024-01-11 08:00:00', 78, 'view',     2.0,  '{"k": 2}'),
    (900007, TIMESTAMP '2024-01-11 08:00:00', 78, 'purchase', 10.0, '{"k": 3}'),
    (900008, TIMESTAMP '2024-01-12 09:00:00', 79, 'click',    0.5,  '{"k": 4}'),
    (900009, TIMESTAMP '2024-01-12 09:30:00', 79, 'click',    0.5,  '{"k": 5}'),
    (900010, TIMESTAMP '2024-01-12 10:00:00', 79, 'click',    0.5,  '{"k": 6}'),
    (900011, TIMESTAMP '2024-01-13 10:00:00', NULL, 'click',  1.0,  '{"k": 7}'),
    (900012, TIMESTAMP '2024-01-13 11:00:00', 80, 'click',    NULL, '{"k": 8}'),
    (900013, TIMESTAMP '2024-01-13 12:00:00', 80, 'click',    1.0,  '{"k": -5}'),
    (900014, TIMESTAMP '2024-01-13 13:00:00', 80, 'click',    1.0,  '{"k": 4000000000}'),
    (900015, TIMESTAMP '2024-01-13 14:00:00', 80, 'click',    1.0,  '{"k": 10000000000000000000}')
  ) t(event_id, ts, user_id, event_type, value, props)
"""


EDGES = {
    "documents.parquet": DOC_EDGES,
    "events.parquet": EV_EDGES,
    "orders.parquet": ORD_EDGES,
    "customer.parquet": CUST_EDGES,
    "lineitem.parquet": LI_EDGES,
    "supplier.parquet": SUPP_EDGES,
    "part.parquet": PART_EDGES,
}


def build(dst: str) -> None:
    # fail fast with the table named: a base dir missing one of the EDGES
    # tables (or storing it as a Spark-written parquet DIRECTORY) would
    # otherwise surface as an unhelpful read_parquet error mid-copy
    missing = [
        f for f in EDGES if not os.path.isfile(os.path.join(BASE, f))
    ]
    if missing:
        raise SystemExit(
            f"planted_sweep: base dir {BASE} is missing single-file parquet"
            f" tables required for edge planting: {', '.join(sorted(missing))}"
        )
    con = duckdb.connect()
    for f in os.listdir(BASE):
        if f in EDGES:
            continue
        os.symlink(os.path.join(BASE, f), os.path.join(dst, f))
    for f, edges in EDGES.items():
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{BASE}/{f}')"
            f" UNION ALL {edges}) TO '{dst}/{f}' (FORMAT PARQUET)"
        )


def main() -> int:
    with tempfile.TemporaryDirectory(prefix="planted_sweep_") as dst:
        build(dst)
        here = os.path.dirname(os.path.abspath(__file__))
        return subprocess.call(
            [sys.executable, os.path.join(here, "check_oracle.py"), dst]
        )


if __name__ == "__main__":
    raise SystemExit(main())
