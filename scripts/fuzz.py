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
   fixture never had. Even-id copies stay verbatim (exact-dup
   coverage); odd-id copies gain one PREPENDED token (round 12:
   word-3-gram Jaccard stays high so every fuzzy family must pair
   them, but the 24-char prefix sort key diverges — prefix-blocking
   recall is exercised, not flattered). Plus three null-text rows
   (round 9) and four unicode rows (round 11: accented Latin, CJK,
   astral-plane emoji, Greek/Cyrillic) so null discipline and
   codepoint-vs-code-unit arithmetic are checked cross-engine
   properties.

Hot-key tier (--hot K, default off): amplifies ONE key family per table
so the salted-join, heavy-hitters, window and triangle paths run under
REAL skew rather than the fixtures' near-uniform keys, still
referentially closed:
 - the busiest sampled customer's orders are duplicated K times under
   FRESH orderkeys but the SAME o_custkey (hot customer key), and each
   duplicated order's lineitem basket follows under the same offset
   (order-atomic, so per-order aggregates stay meaningful);
 - the busiest user's events are duplicated min(K, 200) times under
   fresh event_ids and the same user_id — one user's synthetic tree
   grows ~200x deeper/wider than its peers (the window/recursion skew
   case); capped because the per-user closure is O(n log n) rows and
   the DuckDB oracle must recompute it too;
 - one sampled document is duplicated min(K, 50) times under fresh
   doc_ids — a giant identical-text class for the dedup family; capped
   because identical-text classes cost O(K^2) in every PAIR oracle.

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


def build(src: str, dest: str, seed: int, pct: int, hot: int = 0) -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()

    def copy(name: str, select: str) -> None:
        out = os.path.join(dest, f"{name}.parquet")
        con.execute(f"COPY ({select}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"  {name}: {n} rows")

    def path(name: str) -> str:
        return os.path.join(src, f"{name}.parquet")

    def out(name: str) -> str:
        return os.path.join(dest, f"{name}.parquet")

    for t in KEEP_WHOLE:
        if os.path.exists(path(t)):
            copy(t, f"SELECT * FROM '{path(t)}'")

    # fact tier: sample ORDERS, take the referential closure into lineitem
    if os.path.exists(path("orders")):
        copy("orders", f"""
            SELECT * FROM '{path("orders")}'
            USING SAMPLE {pct} PERCENT (bernoulli, {seed})""")
        if hot > 0:
            # hot customer: duplicate its orders hot times, fresh orderkeys
            # (k-th replica offset by k * (max_orderkey + 1)), same custkey
            hot_cust = con.sql(f"""
                SELECT o_custkey FROM '{out("orders")}'
                GROUP BY 1 ORDER BY COUNT(*) DESC, o_custkey LIMIT 1
                """).fetchone()[0]
            print(f"  hot customer: {hot_cust} x{hot}")
            con.execute(f"""
                CREATE OR REPLACE TEMP TABLE hot_orders AS
                SELECT o.*, r.range AS k,
                  o.o_orderkey + (r.range + 1)
                    * (SELECT MAX(o_orderkey) + 1 FROM '{out("orders")}')
                    AS new_orderkey
                FROM '{out("orders")}' o, range({hot}) r
                WHERE o.o_custkey = {hot_cust}""")
            con.execute(f"""
                COPY (
                  SELECT * FROM '{out("orders")}'
                  UNION ALL
                  SELECT * EXCLUDE (k, new_orderkey)
                    REPLACE (new_orderkey AS o_orderkey) FROM hot_orders
                ) TO '{out("orders")}.tmp' (FORMAT PARQUET)""")
            os.replace(out("orders") + ".tmp", out("orders"))
        if os.path.exists(path("lineitem")):
            copy("lineitem", f"""
                SELECT l.* FROM '{path("lineitem")}' l
                WHERE l.l_orderkey IN (
                  SELECT o_orderkey FROM '{out("orders")}')""")
            if hot > 0:
                # the duplicated orders' baskets follow under the same offset
                con.execute(f"""
                    COPY (
                      SELECT * FROM '{out("lineitem")}'
                      UNION ALL
                      SELECT l.* REPLACE (h.new_orderkey AS l_orderkey)
                      FROM '{out("lineitem")}' l
                      JOIN hot_orders h ON l.l_orderkey = h.o_orderkey
                    ) TO '{out("lineitem")}.tmp' (FORMAT PARQUET)""")
                os.replace(out("lineitem") + ".tmp", out("lineitem"))

    for t in INDEPENDENT:
        if os.path.exists(path(t)):
            copy(t, f"""
                SELECT * FROM '{path(t)}'
                USING SAMPLE {pct} PERCENT (bernoulli, {seed})""")

    if hot > 0 and os.path.exists(out("events")):
        hot_ev = min(hot, 200)
        hot_user = con.sql(f"""
            SELECT user_id FROM '{out("events")}'
            GROUP BY 1 ORDER BY COUNT(*) DESC, user_id LIMIT 1
            """).fetchone()[0]
        print(f"  hot user: {hot_user} x{hot_ev}")
        con.execute(f"""
            COPY (
              SELECT * FROM '{out("events")}'
              UNION ALL
              SELECT e.* REPLACE (e.event_id + (r.range + 1)
                * (SELECT MAX(event_id) + 1 FROM '{out("events")}')
                AS event_id)
              FROM '{out("events")}' e, range({hot_ev}) r
              WHERE e.user_id = {hot_user}
            ) TO '{out("events")}.tmp' (FORMAT PARQUET)""")
        os.replace(out("events") + ".tmp", out("events"))

    if os.path.exists(path("documents")):
        copy("documents", f"""
            WITH sampled AS (
              SELECT * FROM '{path("documents")}'
              USING SAMPLE {pct} PERCENT (bernoulli, {seed})),
            -- dupe tier, two flavors: even-id copies stay VERBATIM (exact-
            -- dedup coverage), odd-id copies gain one PREPENDED token —
            -- word-3-gram Jaccard stays >= (W-2)/W (a near-dup every fuzzy
            -- family must catch) but the 24-char prefix sort key diverges,
            -- so prefix-blocking recall is exercised instead of flattered
            -- (the round-11 verdict's fixture-blindness finding)
            dupes AS (
              SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM sampled) AS doc_id,
                     CASE WHEN doc_id % 2 = 0 OR text IS NULL THEN text
                          ELSE 'zq' || CAST(doc_id % 97 AS VARCHAR)
                               || ' ' || text END AS text,
                     lang, source,
                     CASE WHEN doc_id % 2 = 0 OR text IS NULL THEN n_chars
                          ELSE n_chars + len('zq' || CAST(doc_id % 97 AS VARCHAR)
                               || ' ') END AS n_chars
              FROM sampled
              USING SAMPLE 5 PERCENT (bernoulli, {seed + 1})),
            -- null-text tier: real corpora carry missing documents, and
            -- null handling is where engines silently diverge (DuckDB's
            -- LEAST/aggregates skip NULLs, Spark's null-propagate) — three
            -- rows make every text kernel's null discipline a checked
            -- cross-engine property instead of an untested claim
            nulls AS (
              SELECT doc_id + 2 * (SELECT MAX(doc_id) + 1 FROM sampled)
                       AS doc_id,
                     CAST(NULL AS VARCHAR) AS text, lang, source,
                     CAST(NULL AS BIGINT) AS n_chars
              FROM sampled ORDER BY doc_id LIMIT 3),
            -- unicode tier: accented Latin, CJK, astral-plane emoji and
            -- non-Latin scripts — multi-byte text is where code-unit vs
            -- codepoint arithmetic diverges between engines (substr,
            -- len, ascii folds, BPE symbol tables), so four rows make
            -- every text kernel's unicode discipline a checked
            -- cross-engine property
            unicode AS (
              SELECT s.doc_id + 3 * (SELECT MAX(doc_id) + 1 FROM sampled)
                       AS doc_id,
                     u.txt AS text, s.lang, s.source, len(u.txt) AS n_chars
              FROM (SELECT doc_id, lang, source,
                      ROW_NUMBER() OVER (ORDER BY doc_id) AS rn
                    FROM sampled ORDER BY doc_id LIMIT 4) s
              JOIN (VALUES
                (1, 'café naïve résumé über façade jalapeño crème brûlée déjà vu señor niño'),
                (2, '机器 学习 模型 训练 数据 处理 系统 性能 优化 分布式 计算 引擎 数据 处理'),
                (3, '😀 data 😀😀 pipeline 🚀 rocket science 🧪 lab 😀 data pipeline again 🚀'),
                (4, 'αλφα βητα γαμμα δελτα εψιλον привет мир данные поток система')) u(rn, txt)
                ON u.rn = s.rn)
            SELECT * FROM sampled
            UNION ALL SELECT * FROM dupes
            UNION ALL SELECT * FROM nulls
            UNION ALL SELECT * FROM unicode""")
        if hot > 0:
            # one giant identical-text class: every dedup family must
            # collapse it, every pair oracle pays O(K^2) on it — capped
            hot_doc = min(hot, 50)
            print(f"  hot document: min doc_id x{hot_doc}")
            con.execute(f"""
                COPY (
                  SELECT * FROM '{out("documents")}'
                  UNION ALL
                  SELECT d.* REPLACE (d.doc_id + (r.range + 2)
                    * (SELECT MAX(doc_id) + 1 FROM '{out("documents")}')
                    AS doc_id)
                  FROM '{out("documents")}' d, range({hot_doc}) r
                  WHERE d.doc_id = (SELECT MIN(doc_id) FROM '{out("documents")}')
                ) TO '{out("documents")}.tmp' (FORMAT PARQUET)""")
            os.replace(out("documents") + ".tmp", out("documents"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="source sf dir (e.g. /root/testdata/sf0.01)")
    ap.add_argument("work", help="work dir; dataset lands in <work>/data")
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--pct", type=int, default=80,
                    help="bernoulli sample percentage (default 80)")
    ap.add_argument("--hot", type=int, default=0,
                    help="hot-key amplification factor (0 = off); duplicates "
                         "one customer's orders+baskets x HOT, one user's "
                         "events x min(HOT,200), one document x min(HOT,50)")
    args = ap.parse_args()
    data = os.path.join(args.work, "data")
    print(f"building perturbed dataset (seed={args.seed}, pct={args.pct}, "
          f"hot={args.hot})")
    build(args.src, data, args.seed, args.pct, args.hot)
    print("now run:")
    print(f'  sbt -batch "runMain graft.Verify {data} {args.work}/out"')
    print(f"  python3 scripts/check.py {data} {args.work}/out")
    sys.exit(0)


main()
