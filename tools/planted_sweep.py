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

BASE = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

DOC_EDGES = """
  SELECT * FROM (VALUES
    (900001, '', 'en', 'src0', 0),
    (900002, '   ', 'de', 'src1', 3),
    (900003, 'one', 'fr', 'src2', 3),
    (900004, chr(10) || chr(10), 'es', 'src0', 2)
  ) t(doc_id, text, lang, source, n_chars)
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
    (900014, TIMESTAMP '2024-01-13 13:00:00', 80, 'click',    1.0,  '{"k": 4000000000}')
  ) t(event_id, ts, user_id, event_type, value, props)
"""


def build(dst: str) -> None:
    con = duckdb.connect()
    for f in os.listdir(BASE):
        if f in ("documents.parquet", "events.parquet"):
            continue
        os.symlink(os.path.join(BASE, f), os.path.join(dst, f))
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{BASE}/documents.parquet')"
        f" UNION ALL {DOC_EDGES}) TO '{dst}/documents.parquet' (FORMAT PARQUET)"
    )
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{BASE}/events.parquet')"
        f" UNION ALL {EV_EDGES}) TO '{dst}/events.parquet' (FORMAT PARQUET)"
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
