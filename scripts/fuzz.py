#!/usr/bin/env python3
"""Differential fuzz harness: re-run the battery on PERTURBED fixture data.

The oracle battery proves Spark == DuckDB on the driver's fixtures; this
script proves the equivalence is not fixture-memorized. It derives a new
dataset from a source sf directory by a SEEDED row sample (so value
domains, FK structure, and distributions stay valid — no domain
knowledge is re-encoded here) plus a seeded duplication pass over
`documents` (fresh ids, same text) that shifts every dedup/near-dup
result, then the normal Verify + check.py pipeline runs against it:

    python3 scripts/fuzz.py /root/testdata/sf0.01 /tmp/fuzz1 --seed 7
    sbt -batch "runMain graft.Verify /tmp/fuzz1/data /tmp/fuzz1/out"
    python3 scripts/check.py /tmp/fuzz1/data /tmp/fuzz1/out

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

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Dimension tables stay complete: sampling away a nation/region would
# not model any real corpus change, it would just break FK joins in ways
# no operator is expected to survive.
KEEP_WHOLE = {"region", "nation"}


def build(src: str, dest: str, seed: int, pct: int) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src_path = os.path.join(src, f"{t}.parquet")
        if not os.path.exists(src_path):
            continue
        out = os.path.join(dest, f"{t}.parquet")
        if t in KEEP_WHOLE:
            con.execute(
                f"COPY (SELECT * FROM '{src_path}') TO '{out}' (FORMAT PARQUET)")
        elif t == "documents":
            # sample, then re-add a seeded 5% slice as fresh-id duplicates:
            # every dedup family gains members the fixture never had
            con.execute(f"""
                COPY (
                  WITH sampled AS (
                    SELECT * FROM '{src_path}'
                    USING SAMPLE {pct} PERCENT (bernoulli, {seed})),
                  dupes AS (
                    SELECT doc_id + 10000000 AS doc_id, text, lang, source,
                           n_chars
                    FROM sampled
                    USING SAMPLE 5 PERCENT (bernoulli, {seed + 1}))
                  SELECT * FROM sampled UNION ALL SELECT * FROM dupes
                ) TO '{out}' (FORMAT PARQUET)""")
        elif t == "lineitem":
            # keep order atomicity: sample ORDERS of lineitems, not lines —
            # per-order aggregates (baskets, Q18 shapes) stay meaningful
            con.execute(f"""
                COPY (
                  SELECT l.* FROM '{src_path}' l
                  WHERE l.l_orderkey IN (
                    SELECT DISTINCT l_orderkey FROM '{src_path}'
                    USING SAMPLE {pct} PERCENT (bernoulli, {seed}))
                ) TO '{out}' (FORMAT PARQUET)""")
        else:
            con.execute(f"""
                COPY (
                  SELECT * FROM '{src_path}'
                  USING SAMPLE {pct} PERCENT (bernoulli, {seed})
                ) TO '{out}' (FORMAT PARQUET)""")
        n = con.sql(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"  {t}: {n} rows")


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
