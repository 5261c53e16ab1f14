#!/usr/bin/env python3
"""Scale-exponent audit: bench a query subset at 1x/4x/16x and fit exponents.

Automates the BASELINE.md scale-audit methodology (sessions 6-10):

 1. builds Nx key-offset shard datasets with scaleup.py (volume grows Nx,
    per-key structure — tree depth, basket size, per-user event counts —
    unchanged, documents word-shuffled per copy so the near-dup pair
    workload grows ~Nx not ~N^2x);
 2. lays them out as sf-named siblings (sf0.1 symlink, sf0.4, sf1.6) so
    graft.Bench's warmup picks the smallest sibling, exactly like the
    driver's layout;
 3. runs graft.Bench (in-run median-of-3, noop sink, local[32]) once per
    scale with SPARK_GRAFT_QUERIES filtering;
 4. fits a per-query scaling exponent e (t ~ scale^e) by least squares on
    log t vs log scale, and prints a markdown table ready for BASELINE.md.

An exponent near 1.0 is linear scan/shuffle work; well under 1.0 means
fixed per-query overhead (planning, iteration scheduling) still dominates
at these sizes; over ~1.2 deserves an explanation in BASELINE.md (the
word-3-gram gate tier is the documented case).

    python3 scripts/scale_audit.py /root/testdata/sf0.1 /tmp/scaleaudit \
        --scales 1,4,16 --queries i8_,i2_span_cut --out /tmp/audit.json
"""
import argparse
import json
import math
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def ensure_dataset(src: str, work: str, scale: int,
                   doc_mode: str = "shuffle") -> str:
    base_sf = float(os.path.basename(src.rstrip("/")).lstrip("sf"))
    if scale == 1:
        dest = os.path.join(work, os.path.basename(src.rstrip("/")))
        if not os.path.exists(dest):
            os.symlink(os.path.abspath(src), dest)
        return dest
    # doc_mode is part of the cache key: a shuffle-mode and a translate-mode
    # fixture at the same sf are DIFFERENT datasets (dup-density vs volume),
    # and silently reusing one for the other corrupts exponent comparisons
    dest = os.path.join(work, f"sf{base_sf * scale:g}-{doc_mode}")
    if not os.path.exists(os.path.join(dest, "documents.parquet")):
        subprocess.run(
            [sys.executable, os.path.join(HERE, "scaleup.py"), src, dest,
             str(scale), "--doc-mode", doc_mode], check=True)
    return dest


def run_bench(sf_dir: str, queries: str, cpus: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_QUERIES=queries, SPARK_GRAFT_CPUS=cpus)
    p = subprocess.run(["sbt", "runMain graft.Bench"], cwd=REPO, env=env,
                       capture_output=True, text=True, check=True)
    for line in p.stdout.splitlines():
        if line.startswith('{"metric"'):
            return json.loads(line)
    raise RuntimeError("no bench JSON line in sbt output:\n" + p.stdout[-2000:])


def fit_exponent(points):
    """Least-squares slope of log t vs log scale over all measured scales."""
    xs = [math.log(s) for s, _ in points]
    ys = [math.log(t) for _, t in points]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="base sf directory, e.g. /root/testdata/sf0.1")
    ap.add_argument("work", help="work dir for generated datasets")
    ap.add_argument("--scales", default="1,4,16")
    ap.add_argument("--queries", required=True,
                    help="comma-separated substring filter (SPARK_GRAFT_QUERIES)")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--out", default=None, help="write raw results JSON here")
    ap.add_argument("--doc-mode", choices=["shuffle", "translate"],
                    default="shuffle", help="scaleup.py document copy mode")
    args = ap.parse_args()

    scales = [int(s) for s in args.scales.split(",")]
    os.makedirs(args.work, exist_ok=True)
    results = {}
    for scale in scales:
        sf_dir = ensure_dataset(args.src, args.work, scale, args.doc_mode)
        print(f"== bench at {scale}x ({sf_dir})", flush=True)
        r = run_bench(sf_dir, args.queries, args.cpus)
        results[scale] = r["queries"]
        for q, t in sorted(r["queries"].items()):
            print(f"  {q}: {t:.2f} s", flush=True)

    names = sorted(set().union(*[set(v) for v in results.values()]))
    rows = []
    for q in names:
        pts = [(s, results[s][q]) for s in scales if q in results[s]]
        e = fit_exponent(pts) if len(pts) >= 2 else float("nan")
        rows.append((q, pts, e))

    print("\n| query | " + " | ".join(f"{s}x (s)" for s in scales) +
          " | exponent |")
    print("|---" * (len(scales) + 2) + "|")
    for q, pts, e in rows:
        times = {s: t for s, t in pts}
        cells = " | ".join(f"{times[s]:.2f}" if s in times else "-"
                           for s in scales)
        print(f"| {q} | {cells} | {e:.2f} |")

    if args.out:
        with open(args.out, "w") as f:
            json.dump({"scales": scales, "results": results,
                       "exponents": {q: e for q, _, e in rows}}, f, indent=2)
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
