package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{AhoCorasick, BlocklistExprs}

/** Aho–Corasick blocklist kernel ([[graft.functions.AhoCorasick]]):
  * whole-word phrase semantics, failure-link correctness, distinct-hit
  * counting, and parity with a naive per-pattern contains scan. */
class BlocklistSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mask(patterns: Seq[String], text: String): Long =
    new AhoCorasick(patterns.toArray).matchMask(UTF8String.fromString(text))

  test("whole-word phrase matching via space padding") {
    val p = Seq("slow table")
    assert(mask(p, "a slow table row") == 1L)
    assert(mask(p, "slow table") == 1L) // at both edges
    assert(mask(p, "a slowx table") == 0L) // word boundary on the left
    assert(mask(p, "a slow tables") == 0L) // word boundary on the right
    assert(mask(p, "preslow table post") == 0L)
    assert(mask(p, "SLOW Table x") == 1L) // ASCII case fold
  }

  test("overlapping patterns and shared prefixes all fire") {
    val p = Seq("a b", "b c", "a b c d")
    // "a b c" contains "a b" and "b c" but NOT "a b c d"
    assert(mask(p, "x a b c y") == 3L) // bits 0 and 1
    assert(mask(p, "a b c d") == 7L) // all three
    // shared-prefix miss: "dup row" must not fire on "dup" alone
    assert(mask(Seq("dup row", "big dup"), "dup big x dup") == 0L)
  }

  test("repeated pattern counts once; failure links cross words") {
    val ac = new AhoCorasick(Array("aa ab"))
    assert(ac.hits(UTF8String.fromString("aa aa ab aa ab")) == 1)
    // failure inside a partial match: "aa a" then "ab" needs the link
    assert(ac.hits(UTF8String.fromString("aa aa ab")) == 1)
    assert(ac.hits(UTF8String.fromString("aa ax ab")) == 0)
  }

  test("non-ASCII and punctuation reset instead of matching") {
    val p = Seq("slow table")
    assert(mask(p, "slow, table") == 0L) // comma breaks the phrase
    assert(mask(p, "slöw table") == 0L)
    assert(mask(p, "x slow tableé") == 0L) // é is not a boundary
  }

  test("pattern validation rejects malformed lists") {
    intercept[IllegalArgumentException](new AhoCorasick(Array("Bad Case")))
    intercept[IllegalArgumentException](new AhoCorasick(Array("two  spaces")))
    intercept[IllegalArgumentException](new AhoCorasick(Array(" lead")))
    intercept[IllegalArgumentException](new AhoCorasick(Array.empty[String]))
    intercept[IllegalArgumentException](
      new AhoCorasick(Array.tabulate(65)(i => s"p$i")))
  }

  test("kernel parity with naive contains over the fixture corpus") {
    val patterns = Seq("big dup", "dup row", "hash merge table",
      "slow table", "stream stream", "vector join")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = docs.select(col("doc_id"),
      BlocklistExprs.hits(col("text"), patterns).as("h"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val texts = docs.select(col("doc_id"), col("text")).collect()
    assert(texts.nonEmpty)
    var anyHit = false
    texts.foreach { r =>
      val padded = " " + r.getString(1).toLowerCase + " "
      val expect = patterns.count(p => padded.contains(" " + p + " "))
      assert(got(r.getLong(0)) == expect, s"doc ${r.getLong(0)}")
      if (expect > 0) anyHit = true
    }
    assert(anyHit, "fixture blocklist should hit some documents")
    // null text yields null hits
    val n = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
      .select(BlocklistExprs.hits(col("text"), patterns).as("h")).head()
    assert(n.isNullAt(0))
  }
}
