package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.functions.BpeKernel
import graft.llm.Bpe

/** BPE tokenizer training ([[graft.llm.Bpe]]) + encode kernel
  * ([[graft.functions.BpeKernel]]): hand-computed merge sequences,
  * greedy-left non-overlap discipline, the exact conservation identity the
  * `i5_bpe_train` gate relies on, and partitioning-determinism. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("merges follow hand-computed greedy argmax with lexicographic ties") {
    // "abab" + "ab": round 1 counts (a,b)=3, (b,a)=1 -> merge (a,b);
    // round 2 counts (ab,ab)=1 -> merge (ab,ab); round 3 exhausts.
    val df = Seq((0L, "abab ab")).toDF("doc_id", "text")
    val m = Bpe.train(df, "text", nMerges = 5)
    assert(m.merges == Seq(("a", "b"), ("ab", "ab")))
    assert(m.counts == Seq(3L, 1L))
    assert(m.tokensBefore == 6L)
  }

  test("same-symbol runs count non-overlapping (greedy-left)") {
    // "aaaa": (a,a) counts 2 (not 3); after merging, (aa,aa) counts 1
    val df = Seq((0L, "aaaa")).toDF("doc_id", "text")
    val m = Bpe.train(df, "text", nMerges = 5)
    assert(m.merges == Seq(("a", "a"), ("aa", "aa")))
    assert(m.counts == Seq(2L, 1L))
    // odd run: "aaa" merges once, leaving [aa, a]
    val m3 = Bpe.train(Seq((0L, "aaa")).toDF("doc_id", "text"), "text", 5)
    assert(m3.counts.head == 1L)
    assert(BpeKernel.encodeCount("aaa", Array("a", "a")) == 2)
  }

  test("ties break to the lexicographically smallest pair") {
    // "ba ba" and "ab ab": counts (b,a)=2 and (a,b)=2 -> (a,b) wins
    val df = Seq((0L, "ba ba ab ab")).toDF("doc_id", "text")
    val m = Bpe.train(df, "text", nMerges = 1)
    assert(m.merges == Seq(("a", "b")))
  }

  /** Independent symbol-level reimplementation of merge application. */
  private def naiveEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Vector[String] = word.map(String.valueOf).toVector
    merges.foreach { case (l, r) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result()
    }
    syms
  }

  test("encode kernel agrees with a naive reimplementation on fixture words") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(docs, "text", nMerges = 12)
    val words = docs.select(explode(split(trim(col("text")), " +")).as("w"))
      .filter(col("w") =!= "").distinct().limit(40).as[String].collect()
    val flat = model.merges.flatMap(p => Seq(p._1, p._2)).toArray
    words.foreach { w =>
      assert(BpeKernel.encodeCount(w, flat) == naiveEncode(w, model.merges).length,
        s"kernel/naive disagree on '$w'")
    }
  }

  test("conservation: tokens_after == tokens_before - sum(merge counts)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.train(docs, "text", nMerges = 20)
    assert(model.merges.length == 20, "fixture vocabulary must support 20 merges")
    val after = docs.agg(
      sum(graft.functions.BpeExprs.encodeCount(col("text"), model.merges)))
      .head().getLong(0)
    assert(after == model.tokensBefore - model.mergedTotal)
    // merge counts never increase mid-training on a fixed corpus? They can
    // (a merge can create a new frequent pair), but each must stay >= 1
    assert(model.counts.forall(_ >= 1L))
  }

  test("training is partitioning-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = Bpe.train(docs.repartition(13), "text", nMerges = 8)
    val b = Bpe.train(docs.repartition(2), "text", nMerges = 8)
    assert(a.merges == b.merges && a.counts == b.counts &&
      a.tokensBefore == b.tokensBefore)
  }

  test("null/empty text encodes to 0 tokens; type budget fails fast") {
    val df = Seq((0L, null.asInstanceOf[String]), (1L, "  "), (2L, "ab"))
      .toDF("doc_id", "text")
    val m = Bpe.train(df, "text", nMerges = 2)
    assert(m.tokensBefore == 2L)
    val total = df.agg(
      sum(graft.functions.BpeExprs.encodeCount(col("text"), m.merges)))
      .head().getLong(0)
    assert(total == 1L) // "ab" -> one merged token; null + blank -> 0
    val big = Seq.tabulate(40)(i => (i.toLong, s"w$i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bpe.train(big, "text", nMerges = 1, maxTypes = 10)
    }
    assert(e.getMessage.contains("word types"))
  }

  test("encode ids: naive parity, conservation, round-trip, null propagation") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
    val model = Bpe.train(docs, "text", nMerges = 12)
    val vocab = Bpe.vocabOf(docs, "text", model)
    val rows = docs.select(col("text"),
        graft.functions.BpeExprs.encodeIds(col("text"), model.merges, vocab)
          .as("ids"),
        graft.functions.BpeExprs.encodeCount(col("text"), model.merges)
          .as("tc"))
      .select(col("text"), col("ids"), col("tc"),
        graft.functions.BpeExprs.decodeConcat(col("ids"), vocab).as("dec"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getString(0)
      val ids = r.getSeq[Int](1)
      // driver recompute: per word, the naive merge application mapped
      // through the vocab's FIRST index (the expression's putIfAbsent)
      val expected = text.trim.split(" +").filter(_.nonEmpty).toSeq.flatMap {
        w => naiveEncode(w, model.merges).map(s => vocab.indexOf(s))
      }
      assert(ids == expected, s"ids diverge for: ${text.take(60)}")
      assert(ids.length.toLong == r.getLong(2),
        "id-sequence length must equal the count kernel")
      assert(r.getString(3) == text.trim.replaceAll(" +", ""),
        "decode must reproduce the whitespace-stripped document")
    }
  }

  test("astral-plane text: codepoint symbols end-to-end, no lone surrogates") {
    // non-BMP chars are 2 UTF-16 code units; code-unit symbols would split
    // them into lone surrogates absent from vocabOf's codepoint alphabet
    // and crash encodeIds. Codepoint granularity also makes tokensBefore
    // agree with the oracle's codepoint len().
    val df = Seq((0L, "😀😀 😀😀"),
      (1L, "a😀 a😀")).toDF("doc_id", "text")
    val m = Bpe.train(df, "text", nMerges = 3)
    assert(m.tokensBefore == 8L, "codepoints, not code units (would be 14)")
    val vocab = Bpe.vocabOf(df, "text", m)
    val rows = df.select(col("text"),
        graft.functions.BpeExprs.encodeIds(col("text"), m.merges, vocab)
          .as("ids"))
      .select(col("text"),
        graft.functions.BpeExprs.decodeConcat(col("ids"), vocab).as("dec"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(0).replaceAll(" +", ""),
        "astral round-trip must be exact")
    }
    // conservation holds at codepoint granularity too
    val after = df.agg(
      sum(graft.functions.BpeExprs.encodeCount(col("text"), m.merges)))
      .head().getLong(0)
    assert(after == m.tokensBefore - m.mergedTotal)
  }

  test("encode ids: null -> null, empty -> empty, unknown symbol fails loud") {
    val df = Seq((0L, null.asInstanceOf[String]), (1L, ""), (2L, "ab ab"))
      .toDF("doc_id", "text")
    val model = Bpe.train(df, "text", nMerges = 1)
    val vocab = Bpe.vocabOf(df, "text", model)
    val got = df.orderBy("doc_id").select(
        graft.functions.BpeExprs.encodeIds(col("text"), model.merges, vocab)
          .as("ids")).collect()
    assert(got(0).isNullAt(0), "null text must encode to NULL, not empty")
    assert(got(1).getSeq[Int](0).isEmpty, "empty text is the empty sequence")
    assert(got(2).getSeq[Int](0).length == 2)
    val e = intercept[Exception] {
      Seq((0L, "zq")).toDF("doc_id", "text").select(
        graft.functions.BpeExprs.encodeIds(col("text"), model.merges, vocab))
        .collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m => m != null && m.contains("not in the vocabulary")))
  }
}
