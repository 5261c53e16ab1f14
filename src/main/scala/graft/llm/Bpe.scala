package graft.llm

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Byte-pair-encoding tokenizer TRAINING over a document corpus (EXT row
  * I5 adjunct; no reference-repo counterpart) — the vocabulary-learning
  * step a pipeline runs before tokenizing 100 TB of text (SentencePiece/
  * GPT-2-style, Sennrich et al. 2016, arXiv:1508.07909).
  *
  * Split of labor, the classic one: the CORPUS-sized work — word-frequency
  * counting and the final encode — is distributed (one map-side-combined
  * `groupBy`, one codegen'd kernel scan); merge learning runs on the
  * collected word-TYPE table, which is bounded by vocabulary, not corpus
  * size (a fail-fast `maxTypes` budget guards the collect, the
  * [[Similarity]] broadcast-budget pattern — real corpora have ~10M types
  * at any scale, and production trainers run on exactly this frequency
  * table).
  *
  * Determinism + verifiability: pair counting is greedy-left
  * NON-OVERLAPPING (a run "aaaa" counts (a,a) twice, not three times), so
  * a merge's counted frequency EQUALS the number of applications when it
  * is applied — which makes total token count exactly conserve:
  * `tokens_after == tokens_before - Σ_rounds count_r`. The driver gate
  * query checks that identity with the distributed
  * [[graft.functions.BpeKernel]] encode on one side and exact integer
  * training statistics on the other. Ties in the argmax break to the
  * lexicographically smallest (left, right) pair.
  */
object Bpe {

  /** Learned model: merges in order with the (weighted, non-overlapping)
    * pair count each one had when selected, plus the corpus's initial
    * symbol count from the same type table. */
  case class BpeModel(merges: Seq[(String, String)], counts: Seq[Long],
      tokensBefore: Long) {
    def mergedTotal: Long = counts.sum
  }

  /** Greedy-left non-overlapping pair counting of one symbol sequence
    * into `acc`, weighted by `freq`. */
  private def countPairs(syms: Array[String], len: Int, freq: Long,
      acc: mutable.HashMap[(String, String), Long]): Unit = {
    var i = 0
    var countedPrev = false
    while (i < len - 1) {
      val same = syms(i) == syms(i + 1)
      if (same && i > 0 && syms(i - 1) == syms(i) && countedPrev) {
        countedPrev = false // overlaps the pair counted at i-1: skip
      } else {
        val k = (syms(i), syms(i + 1))
        acc.update(k, acc.getOrElse(k, 0L) + freq)
        countedPrev = same
      }
      i += 1
    }
  }

  /** In-place greedy-left application of one merge; returns the new
    * length. Identical discipline to [[graft.functions.BpeKernel]]. */
  private def applyMerge(syms: Array[String], len: Int, l: String,
      r: String): Int = {
    var read = 0
    var write = 0
    while (read < len) {
      if (read < len - 1 && syms(read) == l && syms(read + 1) == r) {
        syms(write) = l + r
        read += 2
      } else {
        syms(write) = syms(read)
        read += 1
      }
      write += 1
    }
    write
  }

  /** Learn up to `nMerges` merges from the whitespace-word frequency table
    * of `df.textCol`. Stops early if the vocabulary exhausts (every type
    * reduced to one symbol). */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      maxTypes: Int = 1 << 20): BpeModel = {
    require(nMerges >= 0, s"bad nMerges: $nMerges")
    val typeRows = df
      .select(explode(split(trim(col(textCol)), " +")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(F.count(lit(1)).as("freq"))
      .limit(maxTypes + 1)
      .collect()
    require(typeRows.length <= maxTypes,
      s"corpus has > $maxTypes word types; raise maxTypes or pre-normalize " +
        "— the driver-side merge loop is budgeted on the TYPE table")
    // codepoint symbols (NOT toCharArray): code units would split astral
    // characters into lone surrogates absent from [[vocabOf]]'s codepoint
    // alphabet, and tokens_before would disagree with the oracle's
    // codepoint len() — same granularity as BpeKernel.codepointSyms
    val seqs: Array[(Array[String], Long)] = typeRows.map { row =>
      val w = row.getString(0)
      val syms = new Array[String](w.codePointCount(0, w.length))
      var i = 0
      var k = 0
      while (i < w.length) {
        val cc = Character.charCount(w.codePointAt(i))
        syms(k) = w.substring(i, i + cc)
        k += 1
        i += cc
      }
      (syms, row.getLong(1))
    }
    var lens: Array[Int] = seqs.map(_._1.length)
    val tokensBefore = seqs.iterator.zip(lens.iterator)
      .map { case ((_, f), l) => f * l }.sum
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    val counts = mutable.ArrayBuffer.empty[Long]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val acc = mutable.HashMap.empty[(String, String), Long]
      var t = 0
      while (t < seqs.length) {
        countPairs(seqs(t)._1, lens(t), seqs(t)._2, acc)
        t += 1
      }
      if (acc.isEmpty) exhausted = true
      else {
        // argmax count, ties to the lexicographically smallest pair
        val (best, cnt) = acc.foldLeft((("", ""), -1L)) {
          case (cur @ (bk, bc), (k, c)) =>
            if (c > bc || (c == bc && (k._1 < bk._1 ||
              (k._1 == bk._1 && k._2 < bk._2)))) (k, c) else cur
        }
        t = 0
        while (t < seqs.length) {
          lens(t) = applyMerge(seqs(t)._1, lens(t), best._1, best._2)
          t += 1
        }
        merges += best
        counts += cnt
        round += 1
      }
    }
    BpeModel(merges.toSeq, counts.toSeq, tokensBefore)
  }

  /** Token-id vocabulary for [[graft.functions.BpeEncodeIdsExpr]]: every
    * distinct non-space character of the corpus (sorted — ids are
    * deterministic across partitionings) followed by each merge's symbol
    * in learned order; index = token id. The distinct-char collect is
    * bounded by the ALPHABET, not the corpus (guarded at 65536 — a corpus
    * whose charset exceeds the BMP-sized budget needs byte-level BPE, not
    * a bigger driver). */
  def vocabOf(df: DataFrame, textCol: String, model: BpeModel): Array[String] = {
    val base = df
      .select(explode(split(col(textCol), "")).as("c"))
      .filter(col("c") =!= "" && col("c") =!= " ")
      .distinct()
      .limit(65537)
      .collect().map(_.getString(0))
    require(base.length <= 65536,
      "vocabOf: corpus charset exceeds the 65536 driver budget")
    base.sorted ++ model.merges.map(p => p._1 + p._2)
  }
}
