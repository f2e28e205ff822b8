package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distinct-count sketches for corpus-scale profiling — approximate
  * COUNT(DISTINCT) over 100 TB without the exact count's full shuffle of
  * every distinct value. Two classic shapes:
  *
  *  - HyperLogLog registers ([[hllRegisters]]): each value hashes to one
  *    of 256 buckets whose register keeps the max leading-zero rank seen —
  *    the whole table reduces map-side to ≤256 rows (a partial-aggregable
  *    groupBy, the cheapest possible shuffle), mergeable across
  *    partitions/days by plain max. Estimate ±~6.5% (1.04/√256).
  *  - KMV / bottom-k minima ([[kmvMinima]]): the k smallest value hashes;
  *    a TakeOrdered over distinct hashes (no wide shuffle), mergeable by
  *    re-sorting the union. Estimate (k-1)/max-fraction, ±~12% at k=64.
  *
  * DETERMINISM over the built-in `approx_count_distinct`: these sketches
  * are exact functions of the value set (canonical-string MD5, integer
  * rank math via `bin()` string length — no FP anywhere in the sketch
  * itself), so the register/minima tables hash-match a SQL oracle
  * bit-for-bit on any engine with md5 — the property the driver's DuckDB
  * gate checks. Spark's HLL++ sketch is also deterministic but its
  * xxhash64-based register layout is not reproducible in other engines.
  * The float estimate is derived DRIVER-SIDE from the bounded sketch
  * (256 rows / k rows), off the hash-checked path.
  */
object Sketches {

  /** 2^8 buckets: the standard error is 1.04/sqrt(256) ≈ 6.5%. */
  val HllBuckets = 256

  /** Per-bucket HLL registers of `c` over `df`: bucket = first hex byte of
    * md5(cast(c as string)), rank = leading zeros + 1 of the next 60 hash
    * bits (exact integer math: 61 - bitlength via `bin()`; an all-zero
    * lane caps at 61). Only non-empty buckets appear; readers treat a
    * missing bucket as rank 0. NULL values contribute nothing (md5(NULL)
    * is NULL, the groupBy drops the null bucket before it forms).
    */
  def hllRegisters(df: DataFrame, c: Column): DataFrame = {
    val h = md5(c.cast("string"))
    val bucket = conv(substring(h, 1, 2), 16, 10).cast(LongType).as("bucket")
    val v = conv(substring(h, 3, 15), 16, 10).cast(LongType)
    val rank = when(h.isNull, lit(null).cast(LongType))
      .when(v === 0, lit(61L))
      .otherwise(lit(61L) - length(bin(v)).cast(LongType))
    df.select(bucket, rank.as("rank"))
      .where(col("rank").isNotNull)
      .groupBy("bucket").agg(max("rank").as("r"))
  }

  /** The HLL estimate from a [[hllRegisters]] table — driver-side over the
    * ≤256-row sketch (a bounded artifact, like a codebook), with the
    * standard small-range linear-counting correction.
    */
  def hllEstimate(registers: DataFrame): Double = {
    val regs = registers.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val m = HllBuckets
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val sum = (0 until m)
      .map(b => math.pow(2.0, -regs.getOrElse(b.toLong, 0L).toDouble)).sum
    val raw = alpha * m * m / sum
    val zeros = (0 until m).count(b => !regs.contains(b.toLong))
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  /** The k smallest distinct md5 hashes of `c` — a KMV (k-minimum-values)
    * distinct sketch. Plan shape: distinct on the hash (partial-aggable),
    * then a global TakeOrdered of k rows — no full sort, no wide result.
    */
  def kmvMinima(df: DataFrame, c: Column, k: Int = 64): DataFrame =
    df.select(md5(c.cast("string")).as("h"))
      .where(col("h").isNotNull)
      .distinct()
      .orderBy(col("h")).limit(k)

  /** KMV estimate: with fewer than k distinct values the sketch IS the
    * exact count; otherwise (k-1) / (fraction of hash space below the
    * k-th minimum), read from the first 60 bits of the largest kept hash.
    */
  def kmvEstimate(minima: DataFrame, k: Int = 64): Double = {
    val hs = minima.collect().map(_.getString(0)).sorted
    if (hs.length < k) hs.length.toDouble
    else {
      val top = java.lang.Long.parseLong(hs.last.substring(0, 15), 16)
      (k - 1).toDouble * math.pow(2.0, 60) / top.toDouble
    }
  }

  /** Power-of-2 histogram of a non-negative numeric column: bucket = bit
    * length of floor(value) (bucket b covers [2^(b-1), 2^b); floor(value)
    * = 0 lands in bucket 1 with it). The quantile-sketch counterpart of
    * [[hllRegisters]]: the table reduces map-side to ~64 count rows,
    * mergeable by ADDING counts — unlike rank-based sketches (t-digest,
    * Greenwald-Khanna) whose state depends on arrival order, this is an
    * exact integer function of the multiset, so it hash-matches a SQL
    * oracle. The price is resolution: quantile estimates are right to
    * within one power of 2 — the scale-profiling tradeoff (skew detection,
    * partition sizing, retention planning), not a percentile service.
    * Integer bit-length via `bin()` string length avoids FP log2 at
    * power-of-2 boundaries; floor() first because Spark truncates and
    * DuckDB rounds on double→bigint casts.
    */
  def histPow2(df: DataFrame, c: Column): DataFrame =
    df.select(length(bin(floor(c).cast(LongType))).cast(LongType)
        .as("bucket"))
      .where(c.isNotNull && c >= 0)
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Count-min sketch defaults: depth d rows × width w counters. Error
    * contract: an estimate never UNDER-counts, and over-counts by more
    * than 2N/w (N = stream length) with probability at most 2^-d —
    * ~0.8% of N at w=256 and 1/16 failure per item at d=4.
    */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Count-min sketch of `c` over `df`: `depth`×`width` counters where
    * row i's bucket for a value is the low 60 bits of
    * md5(i ++ ":" ++ canonical-string) mod `width`, and the counter is a
    * plain COUNT. The frequency-family member completing the sketch set
    * (distinct = HLL/KMV, quantiles = histPow2, membership = manifest
    * blooms, frequency = this). Why count-min and not Misra-Gries /
    * SpaceSaving: MG's under-counts depend on ARRIVAL ORDER, so two runs
    * (or two engines) legitimately disagree — count-min counters are
    * SUMS, an exact integer function of the multiset, so the sketch
    * hash-matches the DuckDB oracle bit-for-bit and merges across
    * partitions/days/tables by adding counters (spec-pinned). Plan
    * shape: the depth-fold explodes each row into d (row, bucket) pairs,
    * then ONE partial-aggable groupBy — every partition reduces map-side
    * to ≤ d×w rows, so the shuffle is ≤ 1024 groups at 100 TB exactly
    * like [[hllRegisters]]. NULLs contribute nothing. Estimates and
    * heavy-hitter extraction are [[cmsEstimate]] / [[cmsHeavyHitters]].
    */
  def cmSketch(df: DataFrame, c: Column, depth: Int = CmsDepth,
               width: Int = CmsWidth): DataFrame =
    df.select(c.cast("string").as("v"))
      .where(col("v").isNotNull)
      .select(explode(sequence(lit(0L), lit(depth - 1L))).as("i"), col("v"))
      .select(col("i"),
        (conv(substring(md5(concat(col("i").cast("string"), lit(":"),
          col("v"))), 3, 15), 16, 10).cast(LongType) % width).as("bucket"))
      .groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))

  /** Point-frequency estimate from a [[cmSketch]] table — driver-side
    * over the bounded d×w artifact: min over rows of the counter the
    * value hashes to (a missing counter is 0). Never below the true
    * count; above it by at most 2N/w with probability ≥ 1 - 2^-d.
    */
  def cmsEstimate(sketch: DataFrame, value: String,
                  depth: Int = CmsDepth, width: Int = CmsWidth): Long = {
    val m = sketch.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    (0 until depth).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$value".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val bucket = java.lang.Long.parseLong(h.substring(2, 17), 16) % width
      m.getOrElse((i.toLong, bucket), 0L)
    }.min
  }

  /** Heavy hitters of `c` via a broadcast [[cmSketch]] lookup: each
    * DISTINCT value (one partial-aggable shuffle) joins the ≤ d×w sketch
    * broadcast-side, its estimate is the min counter across the d rows,
    * and only values whose estimate reaches `minCount` survive. The
    * never-under-count guarantee makes this a NO-FALSE-NEGATIVE filter:
    * every truly-frequent value is in the output; the (bounded-probability)
    * over-counts admit only stragglers near the threshold. At 100 TB the
    * candidate set is the column's distinct values — already the minimum
    * any exact extraction pass must touch — while the sketch itself was
    * built in one map-side-reduced pass, so a week-over-week heavy-hitter
    * report builds one sketch per day and merges by adding counters.
    */
  def cmsHeavyHitters(df: DataFrame, c: Column, sketch: DataFrame,
                      minCount: Long, depth: Int = CmsDepth,
                      width: Int = CmsWidth): DataFrame = {
    val vals = df.select(c.cast("string").as("v"))
      .where(col("v").isNotNull).distinct()
    val perRow = vals
      .select(explode(sequence(lit(0L), lit(depth - 1L))).as("i"), col("v"))
      .select(col("i"), col("v"),
        (conv(substring(md5(concat(col("i").cast("string"), lit(":"),
          col("v"))), 3, 15), 16, 10).cast(LongType) % width).as("bucket"))
    perRow.join(broadcast(sketch), Seq("i", "bucket"), "left")
      .groupBy("v")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .where(col("est") >= minCount)
  }

  /** Quantile estimate from a [[histPow2]] sketch (driver-side over the
    * bounded histogram): walks the cumulative counts to the q-th row and
    * returns the geometric midpoint of its bucket's [2^(b-1), 2^b) range —
    * within 2x of the true quantile by construction.
    */
  def histQuantile(hist: DataFrame, q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile $q")
    val rows = hist.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val total = rows.map(_._2).sum
    if (total == 0) return Double.NaN
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    for ((b, n) <- rows) {
      cum += n
      if (cum >= target) {
        val lo = if (b <= 1) 0.0 else math.pow(2.0, (b - 1).toDouble)
        val hi = math.pow(2.0, b.toDouble)
        return (lo + hi) / 2
      }
    }
    math.pow(2.0, rows.last._1.toDouble)
  }
}
