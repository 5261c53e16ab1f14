package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting by degree-ordered edge orientation —
  * the co-occurrence-graph structure probe of a corpus pipeline (dense
  * triangle neighborhoods in a doc-similarity or co-citation graph mark
  * template families and boilerplate clusters worth collapsing before
  * training).
  *
  * Algorithm (after Suri & Vassilvitskii, "Counting Triangles and the
  * Curse of the Last Reducer", WWW 2011 — public literature, no
  * reference-repo counterpart): orient every undirected edge from its
  * lower to its higher endpoint in (degree, id) order, emit wedges from
  * each node's OUT-neighborhood only, and close them against the oriented
  * edge set. Every triangle has exactly one vertex with out-edges to the
  * other two under this total order, so each is found exactly once — no
  * `/3` correction, no duplicate elimination.
  *
  * Scale design: the naive wedge count Σ deg(v)² is quadratic in the
  * hottest node (the "last reducer"); orientation caps out-degree at
  * O(√m) for ANY degree distribution, bounding total wedges at O(m^{3/2})
  * — a skewed hub contributes only wedges where it is the SMALLEST corner.
  * Both the wedge self-join and the closing probe are plain equi-joins on
  * key columns (no adjacency list ever materializes in memory), so the
  * whole pass is three shuffles of edge-sized tables regardless of skew.
  * The oriented edge table is localCheckpointed once and replayed by all
  * three uses (both self-join sides + the closing probe).
  */
object Triangles {

  /** All triangles of the undirected graph `edges` (columns `a`, `b`;
    * deduped, `a < b`). Returns one row per triangle with corners
    * `(w, x, y)` — no meaningful corner order beyond "distinct". */
  def triangles(edges: DataFrame): DataFrame = {
    // pin the incoming edge set: it feeds the degree union (2 branches)
    // and the degree-attach join — an expensive upstream generator (e.g.
    // the basket self-join behind the co-purchase graph) would otherwise
    // run 3× (round-14 plan audit). Edge-sized, id pairs only.
    val e = edges.select(col("a"), col("b")).localCheckpoint()
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("node").as("a"), col("deg").as("deg_a")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("deg_b")), Seq("b"))
    // (deg, id) lexicographic order via struct comparison; ids differ so
    // the order is total and the orientation is well-defined
    val aFirst = struct(col("deg_a"), col("a")) < struct(col("deg_b"), col("b"))
    val oriented = withDeg.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"),
      when(aFirst, col("deg_b")).otherwise(col("deg_a")).as("dst_deg"))
      .localCheckpoint()
    val wedges = oriented.as("o1")
      .join(oriented.as("o2"), col("o1.src") === col("o2.src"))
      .filter(struct(col("o1.dst_deg"), col("o1.dst")) <
        struct(col("o2.dst_deg"), col("o2.dst")))
      .select(col("o1.src").as("w"), col("o1.dst").as("x"), col("o2.dst").as("y"))
    // the closing edge (x, y) respects (deg, id) order by construction of
    // the wedge filter, so it appears in `oriented` as src=x, dst=y iff
    // the undirected edge exists; semi join keeps all three corners
    wedges.join(
      oriented.select(col("src").as("x"), col("dst").as("y")),
      Seq("x", "y"), "left_semi")
  }

  /** Per-node triangle participation counts (the numerator of the local
    * clustering coefficient), descending. Driver-small at any scale once
    * limited by the caller. */
  def perNodeCounts(edges: DataFrame): DataFrame =
    triangles(edges)
      .select(explode(array(col("w"), col("x"), col("y"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
}
