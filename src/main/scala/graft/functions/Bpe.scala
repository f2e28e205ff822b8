package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding — learn merges from a corpus, apply them distributed.
  *
  * Scale split: the expensive part (word frequencies) is a distributed
  * aggregate; the LEARNED artifact is tiny (a merge list) so the greedy
  * pair-counting loop runs on the driver over the VOCABULARY (not the
  * corpus) and the apply side ships as a broadcast closure. This is the
  * standard shape for tokenizer training at 100 TB: shuffle once for counts,
  * never move the corpus again.
  *
  * The per-word merge loop is a UDF by necessity — iterated data-dependent
  * rewriting has no built-in Column form (preference order (d) in the build
  * brief, justified).
  */
object Bpe {

  final case class Model(merges: Seq[(String, String)]) {
    @transient private lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    /** Greedy lowest-rank merge application, GPT-2 style, over one word. */
    def encodeWord(word: String): Seq[String] = {
      var pieces = word.map(_.toString).toVector
      var continue = pieces.length > 1
      while (continue) {
        val candidates = pieces.zip(pieces.tail).filter(ranks.contains)
        if (candidates.isEmpty) continue = false
        else {
          val best = candidates.minBy(ranks)
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < pieces.length) {
            if (i < pieces.length - 1 &&
                pieces(i) == best._1 && pieces(i + 1) == best._2) {
              out += pieces(i) + pieces(i + 1); i += 2
            } else { out += pieces(i); i += 1 }
          }
          pieces = out.result()
          continue = pieces.length > 1
        }
      }
      pieces
    }
  }

  /** Learn `numMerges` merges from word frequencies (classic BPE: repeatedly
    * merge the most frequent adjacent pair; ties break lexicographically for
    * determinism).
    */
  def learn(wordCounts: Map[String, Long], numMerges: Int): Model = {
    var vocab = wordCounts.map { case (w, c) =>
      (w.map(_.toString).toVector, c)
    }
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.Map
        .empty[(String, String), Long]
      vocab.foreach { case (pieces, c) =>
        pieces.zip(pieces.tail).foreach(p =>
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c))
      }
      if (pairCounts.isEmpty) exhausted = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        vocab = vocab.map { case (pieces, c) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < pieces.length) {
            if (j < pieces.length - 1 &&
                pieces(j) == best._1 && pieces(j + 1) == best._2) {
              out += pieces(j) + pieces(j + 1); j += 2
            } else { out += pieces(j); j += 1 }
          }
          (out.result(), c)
        }
        i += 1
      }
    }
    Model(merges.result())
  }

  /** Distributed word-frequency aggregation → driver-side learn.
    *
    * The collect is bounded: only the `maxVocab` most frequent words reach
    * the driver (deterministic tie-break on the word), so a pathological
    * vocabulary — 100 TB of unique-ish tokens, URLs, hex blobs — cannot OOM
    * the driver. Truncation is also statistically sound: BPE merge ranks are
    * driven by high-frequency words; the dropped tail contributes (at most)
    * counts below the cut to pair counts. With the default cap the corpus
    * vocabularies here fit entirely, so results are unchanged.
    */
  def learnFromCorpus(docs: DataFrame, textCol: String, numMerges: Int,
                      maxVocab: Int = 1 << 16): Model = {
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxVocab)               // bounded TakeOrdered, not a full sort
      .collect()                     // vocabulary only, never the corpus
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    learn(counts, numMerges)
  }

  /** Broadcast-apply: text → BPE piece array. */
  def encodeUdf(model: Model): Column => Column = {
    val u = udf((text: String) =>
      if (text == null) null
      else text.toLowerCase
        .split(TextFunctions.TokenSplitRe).filter(_.nonEmpty)
        .flatMap(model.encodeWord).toSeq)
    (c: Column) => u(c)
  }
}
