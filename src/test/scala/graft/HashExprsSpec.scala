package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HashExprs
import graft.llm.Dedup

/** Bit-parity harness for the fused [[graft.functions.Md5MinHashFromTextExpr]]:
  * the optimization round may NOT change what any md5-MinHash row computes,
  * so the fused kernel must equal the composed
  * `md5MinHashSig(charShingles(text, n), k)` on every input — including the
  * inputs the battery never hits (multibyte text, sub-shingle lengths,
  * nulls, degenerate repetition where the dedup table does all the work).
  */
class HashExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assertParity(texts: Seq[String], n: Int, k: Int): Unit = {
    val rows = texts.toDF("text")
      .select(
        col("text"),
        HashExprs.md5MinHashSig(Dedup.charShingles(col("text"), n), k).as("ref"),
        HashExprs.md5MinHashSigText(col("text"), n, k).as("fused"))
      .collect()
    rows.foreach { r =>
      val ref = if (r.isNullAt(1)) null else r.getSeq[Long](1)
      val fused = if (r.isNullAt(2)) null else r.getSeq[Long](2)
      assert(fused == ref,
        s"parity break at n=$n k=$k text=${Option(r.getString(0)).map(_.take(60))}")
    }
  }

  test("fused md5 minhash == charShingles + Md5MinHashSigExpr on random ascii") {
    val rnd = new scala.util.Random(42)
    val alpha = "abcde fgh"
    val texts = (1 to 200).map { _ =>
      val len = rnd.nextInt(40)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    assertParity(texts, n = 5, k = 64)
    assertParity(texts, n = 3, k = 8)
  }

  test("fused md5 minhash parity on multibyte text (2/3/4-byte chars)") {
    val rnd = new scala.util.Random(7)
    // mixed byte widths: ascii, U+00E9 (2B), U+4E09 (3B), U+1F642 (4B)
    val alpha = Seq("a", "b", " ", "é", "三", new String(Character.toChars(0x1F642)))
    val texts = (1 to 200).map { _ =>
      val len = rnd.nextInt(30)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.size))).mkString
    }
    assertParity(texts, n = 5, k = 16)
    assertParity(texts, n = 2, k = 16)
  }

  test("fused md5 minhash parity on degenerate repetition and edge lengths") {
    val texts = Seq(
      "", "a", "abcd", "abcde", "abcdef", // below/at/above the n=5 edge
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // one distinct shingle
      "abcabcabcabcabcabcabcabcabc", // period-3 repetition, 3 distinct
      ("lorem ipsum " * 50).trim, // bounded vocabulary, distinct ≪ occurrences
      "word " * 1 + "word") // shingle set smaller than table minimum
    assertParity(texts, n = 5, k = 64)
  }

  test("fused md5 minhash is null-in null-out like the composed form") {
    val rows = Seq[String](null, "hello world")
      .toDF("text")
      .select(HashExprs.md5MinHashSigText(col("text"), 5, 8).as("fused"))
      .collect()
    assert(rows(0).isNullAt(0))
    assert(!rows(1).isNullAt(0))
  }
}
