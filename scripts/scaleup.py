#!/usr/bin/env python3
"""Scale-up dataset generator: N key-offset shards of an sf directory.

Builds the measurement substrate for the BASELINE.md scale-exponent
audits (sessions 6-10): every table is replicated N times with ALL
PK/FK columns shifted per copy, so the result is N disjoint,
referentially consistent shards — volume grows Nx while per-key
structure (tree depth, basket size, per-user event counts) is
UNCHANGED, which is what distinguishes a volume measurement from a
density one.

    python3 scripts/scaleup.py /root/testdata/sf0.1 /tmp/scale16x 16

Per-table scheme:
 - orders/lineitem: o_orderkey/l_orderkey += k*(max+1), o_custkey/
   c_custkey += k*(max+1), part/supplier keys likewise — each shard
   joins only within itself;
 - events: event_id and user_id offset — Nx trees of unchanged depth;
 - embeddings: vec_id offset, vectors unchanged;
 - documents: doc_id offset AND the text of copy k>0 word-shuffled by
   a seeded per-copy permutation (the session-7 refinement): copies
   share almost no word 3-grams, so the near-dup pair workload grows
   ~Nx (true volume), not ~N^2x (a manufactured dup-density workload;
   informative too, but a different experiment — session 6 ran it).
   A rotation or sort would NOT break 3-gram overlap; a seeded shuffle
   does, like the reverse/interleave family used at 4x.
 - region/nation: replicated UNCHANGED (they are genuinely small
   dimensions at any scale; offsetting nationkey would just grow a
   25-row broadcast to 400 rows and change no plan).

Dimension keys referenced by fact FKs (customer, part, supplier) ARE
offset so shards stay closed; their n_nationkey/s_nationkey stay in
range because nation is not offset.
"""
import argparse
import hashlib
import os
import random

import duckdb


def shuffle_words_sql():
    """Register a deterministic per-(copy, doc) word shuffle UDF."""
    def shuffle_text(text: str, seed: int) -> str:
        if text is None:
            return None
        words = text.split(" ")
        rnd = random.Random(seed)
        rnd.shuffle(words)
        return " ".join(words)
    return shuffle_text


def translate_words_sql():
    """Register a deterministic per-copy word TRANSLATION UDF.

    The word shuffle (default mode) breaks word-3-gram overlap across
    copies but NOT char-5-shingle overlap — a shuffled copy keeps every
    within-word 5-gram, so at char-shingle MinHash granularity copies sit
    at Jaccard ~0.3 and the 16-band/r=4 S-curve still collides ~12% of
    cross-copy pairs: the char-5 LSH tier sees a dup-DENSITY workload
    (quadratic in copies), not a volume one (session-14 adjudication).
    Translation replaces each word with a hex token derived from
    (copy, word): the same word maps to the same token WITHIN a copy, so
    per-shard vocabulary/near-dup structure is preserved at both word and
    char granularity, while different copies share no tokens and (hex
    alphabet, fresh digests) essentially no char 5-grams — N genuinely
    disjoint shards for every shingle granularity.
    """
    def translate_text(text: str, seed: int) -> str:
        if text is None:
            return None
        out = []
        for w in text.split(" "):
            if not w:
                out.append(w)
                continue
            h = hashlib.md5(f"{seed}:{w}".encode()).hexdigest()
            # floor 6 hex chars (16^6 ≈ 16.7M token space): a 3-char floor
            # put short words in a 4096-token space where birthday collisions
            # merged distinct words across copies, weakening the fixture's
            # "copies share no tokens" disjointness premise
            out.append(h[:max(6, min(len(w), 12))])
        return " ".join(out)
    return translate_text


def build(src: str, dest: str, n: int, doc_mode: str = "shuffle") -> None:
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.create_function("shuffle_words", shuffle_words_sql(),
                        ["VARCHAR", "BIGINT"], "VARCHAR")
    con.create_function("translate_words", translate_words_sql(),
                        ["VARCHAR", "BIGINT"], "VARCHAR")

    def path(t):
        return os.path.join(src, f"{t}.parquet")

    def out(t):
        return os.path.join(dest, f"{t}.parquet")

    def copy(t, select):
        con.execute(f"COPY ({select}) TO '{out(t)}' (FORMAT PARQUET)")
        c = con.sql(f"SELECT COUNT(*) FROM '{out(t)}'").fetchone()[0]
        print(f"  {t}: {c} rows")

    def off(col, base):
        return f"{col} + r.range * ({base})"

    for t in ("region", "nation"):
        if os.path.exists(path(t)):
            copy(t, f"SELECT * FROM '{path(t)}'")

    reps = f"range({n}) r"

    # ONE offset base per key FAMILY, maxed across every table carrying the
    # key: per-table maxima differ when the fixtures hold never-referenced
    # dimension rows (never-ordered parts, dormant customers), and
    # mismatched offsets give copies k>0 dangling or cross-shard FKs —
    # breaking referential consistency and drifting per-key join density,
    # which the scale-exponent audit assumes constant.
    def fam_base(*table_cols):
        mx = 0
        for t, c in table_cols:
            if os.path.exists(path(t)):
                v = con.sql(f"SELECT MAX({c})+1 FROM '{path(t)}'").fetchone()[0]
                mx = max(mx, v or 0)
        return mx or 1

    b_cust = fam_base(("customer", "c_custkey"), ("orders", "o_custkey"))
    b_supp = fam_base(("supplier", "s_suppkey"), ("lineitem", "l_suppkey"))
    b_part = fam_base(("part", "p_partkey"), ("lineitem", "l_partkey"))
    b_order = fam_base(("orders", "o_orderkey"), ("lineitem", "l_orderkey"))

    if os.path.exists(path("customer")):
        copy("customer", f"""
            SELECT c.* REPLACE ({off('c_custkey', b_cust)} AS c_custkey)
            FROM '{path("customer")}' c, {reps}""")
    if os.path.exists(path("supplier")):
        copy("supplier", f"""
            SELECT s.* REPLACE ({off('s_suppkey', b_supp)} AS s_suppkey)
            FROM '{path("supplier")}' s, {reps}""")
    if os.path.exists(path("part")):
        copy("part", f"""
            SELECT p.* REPLACE ({off('p_partkey', b_part)} AS p_partkey)
            FROM '{path("part")}' p, {reps}""")

    if os.path.exists(path("orders")):
        copy("orders", f"""
            SELECT o.* REPLACE ({off('o_orderkey', b_order)} AS o_orderkey,
                                {off('o_custkey', b_cust)} AS o_custkey)
            FROM '{path("orders")}' o, {reps}""")
    if os.path.exists(path("lineitem")):
        copy("lineitem", f"""
            SELECT l.* REPLACE ({off('l_orderkey', b_order)} AS l_orderkey,
                                {off('l_partkey', b_part)} AS l_partkey,
                                {off('l_suppkey', b_supp)} AS l_suppkey)
            FROM '{path("lineitem")}' l, {reps}""")

    if os.path.exists(path("events")):
        me = con.sql(f"SELECT MAX(event_id)+1 FROM '{path('events')}'").fetchone()[0]
        mu = con.sql(f"SELECT MAX(user_id)+1 FROM '{path('events')}'").fetchone()[0]
        copy("events", f"""
            SELECT e.* REPLACE ({off('event_id', me)} AS event_id,
                                {off('user_id', mu)} AS user_id)
            FROM '{path("events")}' e, {reps}""")

    if os.path.exists(path("embeddings")):
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{path('embeddings')}'").fetchall()]
        key = "vec_id" if "vec_id" in cols else cols[0]
        mv = con.sql(f"SELECT MAX({key})+1 FROM '{path('embeddings')}'").fetchone()[0]
        copy("embeddings", f"""
            SELECT v.* REPLACE ({off(key, mv)} AS {key})
            FROM '{path("embeddings")}' v, {reps}""")

    if os.path.exists(path("documents")):
        md = con.sql(f"SELECT MAX(doc_id)+1 FROM '{path('documents')}'").fetchone()[0]
        if doc_mode == "translate":
            # per-copy seed only: same word -> same token within a shard,
            # so per-shard dedup structure is preserved; n_chars recomputed
            # because translation changes text length
            text_expr = "translate_words(d.text, r.range)"
            copy("documents", f"""
                SELECT d.* REPLACE (
                  {off('doc_id', md)} AS doc_id,
                  CASE WHEN r.range = 0 THEN d.text ELSE {text_expr} END AS text,
                  CASE WHEN r.range = 0 THEN d.n_chars
                       ELSE len({text_expr}) END AS n_chars)
                FROM '{path("documents")}' d, {reps}""")
        else:
            copy("documents", f"""
                SELECT d.* REPLACE (
                  {off('doc_id', md)} AS doc_id,
                  CASE WHEN r.range = 0 THEN d.text
                       ELSE shuffle_words(d.text, r.range * 1000003 + d.doc_id)
                  END AS text)
                FROM '{path("documents")}' d, {reps}""")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dest")
    ap.add_argument("n", type=int)
    ap.add_argument("--doc-mode", choices=["shuffle", "translate"],
                    default="shuffle",
                    help="copy-k>0 document text: word shuffle (breaks "
                         "word-3-gram overlap; chars overlap survives) or "
                         "word translation (disjoint shards at EVERY "
                         "shingle granularity)")
    args = ap.parse_args()
    print(f"building {args.n}x key-offset shards of {args.src} -> "
          f"{args.dest} (doc_mode={args.doc_mode})")
    build(args.src, args.dest, args.n, args.doc_mode)


main()
