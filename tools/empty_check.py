#!/usr/bin/env python3
"""Degenerate-input sweep: every registered query on ZERO-ROW tables.

A 100 TB pipeline routinely sees empty slices — an empty ingest day, a
holdout source with no rows yet, a filter that eliminates everything.
A query that crashes (ANSI division by zero, schema inference over a
fileless table dir, k-means over nothing) or silently disagrees with
plain SQL semantics on empty input is a latent production defect, so
this sweep writes a zero-row twin of every table (schemas copied from
the sf0.001 corpus) and runs the FULL registry against the DuckDB
oracles on it.

Round-7 findings it was built on (all fixed): 7 ANN/dedup queries
crashed training quantizers on zero vectors (now short-circuit to
typed empty frames), the curation waterfall / filter funnel divided by
a zero total (ANSI raise; now NULL like the oracle), the integrity /
expectation reports emitted NULL where "0 violations, vacuously
passed" is the right answer (conditional-SUM-over-empty), the corpus
replay could not re-read tables whose epochs committed zero rows, and
Spark's grouping sets emit NO grand-total row over an empty relation
(the SQL standard emits one — the cube/rollup oracles now encode
Spark's contract with a HAVING that is a no-op on data).

Usage (repo on PYTHONPATH):
    python tools/empty_check.py [--out EMPTYCHECK.json]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

SCHEMA_SRC = "/root/testdata/sf0.001"
EMPTY_DIR = os.environ.get("EMPTY_DIR", "/tmp/sf_empty")


def write_empty_twin() -> None:
    import duckdb

    os.makedirs(EMPTY_DIR, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SCHEMA_SRC}/{t}.parquet') "
            f"LIMIT 0) TO '{EMPTY_DIR}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "EMPTYCHECK.json"))
    args = ap.parse_args()
    write_empty_twin()
    return subprocess.call(
        [
            sys.executable,
            os.path.join(REPO, "tools", "selfcheck.py"),
            "--sf-dirs",
            EMPTY_DIR,
            "--out",
            args.out,
        ],
        cwd=REPO,
    )


if __name__ == "__main__":
    sys.exit(main())
