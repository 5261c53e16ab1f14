package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Graph-analytics queries (EXT row I8): iterative weight propagation over
  * an edge set — the link-authority prior a crawl-curation pipeline feeds
  * into document quality scoring. Fixture graph: the part↔supplier
  * bipartite graph observed in lineitem (distinct (l_partkey, l_suppkey)
  * pairs, both directions), supplier nodes offset by 1e9 to share one
  * bigint id space.
  *
  * The oracle unrolls the three iterations as chained CTEs with the SAME
  * integer fixed-point arithmetic (`//` = `div`), so DuckDB reproduces the
  * ranks bit-for-bit — see [[graft.operators.PageRank]] for why that works.
  */
object GraphOps {

  private val SuppOffset = 1000000000L

  /** I8 — top-50 PageRank nodes of the part↔supplier graph after 3
    * damping-0.85 rounds. Suppliers (few, high-degree) collect rank from
    * every part they serve; the TakeOrdered top-k keeps the result
    * driver-small at any scale. */
  def pagerank(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = pairs
      .select(col("p").as("u"), (col("sk") + lit(SuppOffset)).as("v"))
      .unionAll(pairs
        .select((col("sk") + lit(SuppOffset)).as("u"), col("p").as("v")))
    PageRank.ranks(edges, 3)
      .orderBy(col("rank_u").desc, col("node"))
      .limit(50)
  }

  private val pagerankSql =
    """WITH pairs AS (
      |  SELECT DISTINCT l_partkey AS p, l_suppkey AS sk FROM lineitem),
      |edges AS (
      |  SELECT p AS u, sk + 1000000000 AS v FROM pairs
      |  UNION ALL
      |  SELECT sk + 1000000000 AS u, p AS v FROM pairs),
      |nodes AS (SELECT DISTINCT u AS node FROM edges),
      |params AS (SELECT COUNT(*) AS n FROM nodes),
      |deg AS (SELECT u, COUNT(*) AS outdeg FROM edges GROUP BY u),
      |r0 AS (SELECT node, 1000000000000 // n AS r FROM nodes, params),
      |it1 AS (
      |  SELECT n.node,
      |    (15 * (1000000000000 // p.n)) // 100
      |      + (85 * COALESCE(SUM(r.r // d.outdeg), 0)) // 100 AS r
      |  FROM nodes n CROSS JOIN params p
      |  LEFT JOIN edges e ON e.v = n.node
      |  LEFT JOIN r0 r ON r.node = e.u
      |  LEFT JOIN deg d ON d.u = e.u
      |  GROUP BY n.node, p.n),
      |it2 AS (
      |  SELECT n.node,
      |    (15 * (1000000000000 // p.n)) // 100
      |      + (85 * COALESCE(SUM(r.r // d.outdeg), 0)) // 100 AS r
      |  FROM nodes n CROSS JOIN params p
      |  LEFT JOIN edges e ON e.v = n.node
      |  LEFT JOIN it1 r ON r.node = e.u
      |  LEFT JOIN deg d ON d.u = e.u
      |  GROUP BY n.node, p.n),
      |it3 AS (
      |  SELECT n.node,
      |    (15 * (1000000000000 // p.n)) // 100
      |      + (85 * COALESCE(SUM(r.r // d.outdeg), 0)) // 100 AS r
      |  FROM nodes n CROSS JOIN params p
      |  LEFT JOIN edges e ON e.v = n.node
      |  LEFT JOIN it2 r ON r.node = e.u
      |  LEFT JOIN deg d ON d.u = e.u
      |  GROUP BY n.node, p.n)
      |SELECT node, r AS rank_u FROM it3
      |ORDER BY rank_u DESC, node LIMIT 50""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "i8_pagerank" -> pagerank _
  )

  val oracles: Map[String, String] = Map(
    "i8_pagerank" -> pagerankSql
  )
}
