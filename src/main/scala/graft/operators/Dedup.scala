package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** THE named dedup surface — a user reaching for "jaccard dedup" lands
  * here, and lands on the LSH-gated path.
  *
  * Contract: `docs` has `doc_id` (unique id), `source` (block key — pairs
  * never cross it), `text`. All entry points share one shape:
  * MinHash-LSH banding proposes candidates (zero-shuffle banding, band-key
  * equi-join), exact Jaccard verifies ONLY those candidates (native
  * two-pointer intersect). Cost is O(docs × bands) + O(candidates) — never
  * O(pairs-sharing-a-token), which is why this is the default: the
  * all-pairs token self-join ([[exactJaccardBaseline]]) materializes the
  * full intersection mass and dies on a 100 TB low-dup corpus, where
  * candidates ≪ shared-token pairs.
  *
  * Recall is the documented dial: the default 8×2 banding recovers 97.5%
  * of exact pairs at threshold 0.5 (measured at sf0.01, vs 71% for 4×4) —
  * see `dd_jaccard_lsh_8x2`'s scaladoc for the A/B.
  */
object Dedup {

  /** Verified near-dup pairs `(doc_a, doc_b, jaccard)` with
    * `jaccard >= threshold`, candidates gated by `nBands`×`rowsPer`
    * MinHash banding. Defaults are the measured high-recall knob (8×2).
    */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.5,
                   nBands: Int = 8, rowsPer: Int = 2): DataFrame =
    nearDupPairsWithHandle(docs, threshold, nBands, rowsPer)._1

  /** [[nearDupPairs]] plus the cached banding it registers — the handle
    * the candidate self-join reads twice. One-shot callers (the
    * `CALL system.dedup_near` procedure) unpersist it after
    * materializing; query paths use the plain form (session-scoped,
    * CacheManager dedups by plan across reruns). Ownership lives HERE,
    * next to the `.cache()` — a caller re-deriving the plan to release
    * it would silently stop matching the moment the banding drifts.
    */
  def nearDupPairsWithHandle(docs: DataFrame, threshold: Double = 0.5,
                             nBands: Int = 8, rowsPer: Int = 2)
      : (DataFrame, DataFrame) = {
    val bands = TextQueries.statelessBands(
      docs.repartition(col("doc_id")), nBands, rowsPer).cache()
    (TextQueries.jaccardLshOf(docs, bands, threshold), bands)
  }

  /** The deduplicated corpus: `docs` minus every row that is the HIGHER id
    * of some verified near-dup pair — the greedy min-id survivor rule
    * (deterministic; transitive chains collapse to their lowest id member
    * whenever the gate proposes the chain's edges). For quality-aware
    * survivor choice compose [[nearDupPairs]] with the cluster +
    * keep-best-quality pattern of `dd_keep_best` instead.
    *
    * Plan shape (PlanSpec-gated): band-key equi-join for candidates, one
    * anti-join to drop losers — no token self-join anywhere.
    */
  def dedupNearExact(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    dedupNearExactWithHandle(docs, threshold)._1

  /** [[dedupNearExact]] plus the cached banding handle (see
    * [[nearDupPairsWithHandle]]).
    */
  def dedupNearExactWithHandle(docs: DataFrame, threshold: Double = 0.5)
      : (DataFrame, DataFrame) = {
    val (pairs, bands) = nearDupPairsWithHandle(docs, threshold)
    val losers = pairs.select(col("doc_b").as("doc_id")).distinct()
    (docs.join(losers, Seq("doc_id"), "left_anti"), bands)
  }

  /** Exact all-pairs Jaccard — the oracle/baseline twin (`dd_jaccard`
    * delegates here): exhaustive recall, O(shared-token pairs) cost. Use
    * only to measure the gated path's recall on a sample, never as the
    * pipeline default.
    */
  def exactJaccardBaseline(docs: DataFrame,
                           threshold: Double = 0.5): DataFrame = {
    val toksd = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(
        graft.functions.TextFunctions.tokens(col("text")))).as("tok"))
    val sizes = toksd.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = toksd.select(col("source"), col("tok"), col("doc_id").as("doc_a"))
    val b = toksd.select(col("source").as("source_b"),
      col("tok").as("tok_b"), col("doc_id").as("doc_b"))
    val inter = a.join(b,
        col("source") === col("source_b") && col("tok") === col("tok_b") &&
          col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
