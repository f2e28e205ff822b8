package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** BPE: classic textbook behavior on a tiny vocab, determinism, and the
  * distributed learn→broadcast-apply round trip on real documents.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learn merges most frequent pairs first (textbook example)") {
    // 'lo' dominates, then 'low'
    val model = Bpe.learn(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 6)
    assert(model.merges.take(2).toSet
      .intersect(Set(("e", "s"), ("s", "t"), ("l", "o"))).nonEmpty)
    // 'est' must eventually form for newest/widest (count 9 dominates)
    val pieces = model.encodeWord("newest")
    assert(pieces.mkString("|").contains("est") ||
      pieces.exists(_.contains("est")))
  }

  test("encode is deterministic and reversible by concatenation") {
    val model = Bpe.learn(Map("spark" -> 10L, "sparse" -> 5L), 4)
    val a = model.encodeWord("sparkles")
    val b = model.encodeWord("sparkles")
    assert(a == b && a.mkString == "sparkles")
  }

  test("vocab cap bounds the driver collect on an oversized vocabulary") {
    // 500 distinct words but a cap of 50: only the 50 most frequent words
    // (count desc, word asc) reach the driver. The dominant repeated word
    // still drives the first merges.
    val docs = (1 to 500).map(i => s"zz${"q" * (i % 7)}$i aaa aaa aaa")
      .toDF("text")
    val capped = Bpe.learnFromCorpus(docs, "text", numMerges = 2,
      maxVocab = 50)
    assert(capped.merges.nonEmpty)
    assert(capped.merges.head == ("a", "a")) // from the 1500 'aaa's
    // deterministic under the cap: same inputs → same merges
    val again = Bpe.learnFromCorpus(docs, "text", numMerges = 2,
      maxVocab = 50)
    assert(capped.merges == again.merges)
  }

  test("distributed learn + broadcast apply over documents") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val model = Bpe.learnFromCorpus(docs, "text", numMerges = 30)
    assert(model.merges.size == 30)
    val enc = Bpe.encodeUdf(model)
    val out = docs.select(col("doc_id"), enc(col("text")).as("pieces"))
    // every document round-trips: concatenated pieces == tokens joined
    val bad = out.join(docs, "doc_id")
      .select(col("doc_id"),
        concat_ws("", col("pieces")).as("joined"),
        concat_ws("", TextFunctions.tokens(col("text"))).as("want"))
      .filter(col("joined") =!= col("want"))
    assert(bad.isEmpty)
    // merges actually compress: fewer pieces than characters
    val stats = out.select(
      sum(size(col("pieces"))).cast("long").as("p")).head().getLong(0)
    val chars = docs.select(
      sum(length(regexp_replace(col("text"), "[^a-z]", ""))).cast("long"))
      .head().getLong(0)
    assert(stats < chars)
  }
}
