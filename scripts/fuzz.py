#!/usr/bin/env python3
"""Differential fuzz harness: re-run the battery on PERTURBED fixture data.

The oracle battery proves Spark == DuckDB on the driver's fixtures; this
script proves the equivalence is not fixture-memorized. It derives a new
dataset from a source sf directory and the normal Verify + check.py
pipeline runs against it:

    python3 scripts/fuzz.py /root/testdata/sf0.01 /tmp/fuzz1 --seed 7
    sbt -batch "runMain graft.Verify /tmp/fuzz1/data /tmp/fuzz1/out"
    python3 scripts/check.py /tmp/fuzz1/data /tmp/fuzz1/out

Perturbation scheme — REFERENTIALLY CLOSED, so FK-dependent operators
measure real semantics rather than orphan noise:
 - dimensions (region, nation, customer, supplier, part) stay whole:
   dropping a dimension member models nothing and only manufactures
   orphans;
 - `orders` takes a seeded bernoulli sample of ORDER rows, and
   `lineitem` keeps exactly the lines of sampled orders — order-atomic
   (per-order baskets/aggregates stay meaningful) and a genuine volume
   perturbation of the whole fact tier;
 - `events`, `documents`, `embeddings` sample independently (no FK into
   the TPC-H tier);
 - `documents` additionally re-adds a seeded 5% slice as fresh-id
   duplicates (ids offset past the sampled MAX, so the scheme is safe
   for any id range) — every dedup/provenance family gains members the
   fixture never had.

Every oracle row recomputes from the same perturbed parquet, so any
fixture-specific constant hiding in an oracle or query surfaces as a
FAIL here even while the driver's fixed-fixture gate stays green.
Sampling uses DuckDB's REPEATABLE bernoulli sample — same seed, same
dataset, bit-for-bit.
"""
import argparse
import os
import sys

import duckdb

KEEP_WHOLE = ["region", "nation", "customer", "supplier", "part"]
INDEPENDENT = ["events", "embeddings"]


def build(src: str, dest: str, seed: int, pct: int) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()

    def copy(name: str, select: str) -> None:
        out = os.path.join(dest, f"{name}.parquet")
        con.execute(f"COPY ({select}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"  {name}: {n} rows")

    def path(name: str) -> str:
        return os.path.join(src, f"{name}.parquet")

    for t in KEEP_WHOLE:
        if os.path.exists(path(t)):
            copy(t, f"SELECT * FROM '{path(t)}'")

    # fact tier: sample ORDERS, take the referential closure into lineitem
    if os.path.exists(path("orders")):
        copy("orders", f"""
            SELECT * FROM '{path("orders")}'
            USING SAMPLE {pct} PERCENT (bernoulli, {seed})""")
        if os.path.exists(path("lineitem")):
            copy("lineitem", f"""
                SELECT l.* FROM '{path("lineitem")}' l
                WHERE l.l_orderkey IN (
                  SELECT o_orderkey FROM '{os.path.join(dest, "orders.parquet")}')""")

    for t in INDEPENDENT:
        if os.path.exists(path(t)):
            copy(t, f"""
                SELECT * FROM '{path(t)}'
                USING SAMPLE {pct} PERCENT (bernoulli, {seed})""")

    if os.path.exists(path("documents")):
        copy("documents", f"""
            WITH sampled AS (
              SELECT * FROM '{path("documents")}'
              USING SAMPLE {pct} PERCENT (bernoulli, {seed})),
            dupes AS (
              SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM sampled) AS doc_id,
                     text, lang, source, n_chars
              FROM sampled
              USING SAMPLE 5 PERCENT (bernoulli, {seed + 1}))
            SELECT * FROM sampled UNION ALL SELECT * FROM dupes""")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="source sf dir (e.g. /root/testdata/sf0.01)")
    ap.add_argument("work", help="work dir; dataset lands in <work>/data")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--pct", type=int, default=80,
                    help="bernoulli sample percentage (default 80)")
    args = ap.parse_args()
    data = os.path.join(args.work, "data")
    print(f"building perturbed dataset (seed={args.seed}, pct={args.pct})")
    build(args.src, data, args.seed, args.pct)
    print("now run:")
    print(f'  sbt -batch "runMain graft.Verify {data} {args.work}/out"')
    print(f"  python3 scripts/check.py {data} {args.work}/out")
    sys.exit(0)


main()
