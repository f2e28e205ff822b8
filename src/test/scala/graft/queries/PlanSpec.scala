package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Plan-quality gate (SURVEY §4): the physical properties that make these
  * queries survive a 100× scale-up are asserted, not hoped for — filter
  * pushdown into the parquet scan, column pruning, broadcast join selection
  * for dim joins, map-side partial aggregation, and shuffle counts.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): SparkPlan =
    graft.SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan

  private def planString(name: String): String = plan(name).toString

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val expanded = p.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    (p +: expanded).flatMap(_.collect(pf))
  }

  test("p1: predicates pushed into the parquet scan, columns pruned") {
    val s = planString("p1_project_filter")
    assert(s.contains("PushedFilters: [IsNotNull(c_mktsegment), IsNotNull(c_acctbal)"),
      s)
    // (plan toString truncates long filter lists — match stable prefixes)
    assert(s.contains("EqualTo(c_mktsegment,FURNITURE)") &&
      s.contains("GreaterThan(c_ac"), s)
    // scan must read only the 3 projected columns + filter columns
    assert(s.contains("ReadSchema: struct<c_custkey:bigint,c_name:string,c_acctbal:double,c_mktsegment:string>"),
      s)
  }

  test("j1: dim side broadcast, no sort-merge join, partial agg present") {
    val p = plan("j1_broadcast_join_agg")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty, p)
    val s = p.toString
    assert(!s.contains("SortMergeJoin"), s)
    // partial + final hash aggregate pair = map-side combine before shuffle
    assert(s.split("HashAggregate").length >= 3, s)
  }

  test("occupancy: broadcast room join; pre-explode filter reaches the scan") {
    val p = plan("occupancy_index")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty, p)
    val s = p.toString
    // PushPredicateThroughNonJoin: the retailprice filter sits below the
    // explodes, in the scan's PushedFilters
    assert(s.contains("GreaterThan(p_retailprice,901.0)"), s)
    assert(!s.contains("CartesianProduct"), s)
  }

  test("a1: column pruning - scan reads only the 6 needed lineitem columns") {
    val s = planString("a1_pricing_summary")
    // ReadSchema truncates in toString — assert on the scan's column list
    val scanCols = "FileScan parquet \\[([^\\]]*)\\]".r
      .findFirstMatchIn(s).map(_.group(1)).getOrElse(fail(s))
    val cols = scanCols.split(",").map(_.takeWhile(_ != '#')).toSet
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate"), s)
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_ship"), s)
  }

  test("pq: ADC ranking is all-broadcast, top-k map-side limited") {
    val p = plan("pq_adc_topk")
    // codebook, query tables and the four ADC lookups are all broadcast —
    // the scan side never enters a sort-merge join, and the final top-k is
    // TakeOrdered (each task keeps k rows; the driver merges task heads)
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.size >= 5, p)
    val s = p.toString
    assert(!s.contains("SortMergeJoin"), s)
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty, p)
  }

  test("pq encode: argmin is a partial aggregate, never a window rank") {
    val p = plan("pq_codes")
    val s = p.toString
    // the per-(vec,s) nearest-code argmin must collapse map-side: a Window
    // rank here would shuffle all n×4×16 candidate rows — the 16× exchange
    // the min(struct(dist,code)) agg exists to avoid
    assert(!s.contains("Window"), s)
    // partial + final HashAggregate pair = map-side combine before shuffle
    assert(s.split("HashAggregate").length >= 3, s)
    assert(!s.contains("SortMergeJoin"), s)
  }

  test("ivfpq: no cartesian, top-k map-side limited") {
    val p = plan("ivfpq_topk")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty, p)
    assert(p.toString.contains("TakeOrderedAndProject"), p.toString)
  }

  test("scd2: one shuffle pair for the full-outer diff, no cartesian") {
    val p = plan("scd2_apply")
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty, p)
    // full-outer join on the key → at most one exchange per side (+1 for the
    // union's final write is absent here since we only count the query plan)
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 4, s"unexpected shuffle count ${shuffles.size}\n$p")
  }

  test("q5: snowflake dims broadcast down the chain, no cartesian") {
    val p = plan("q5_local_supplier")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.size >= 3, p)
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty, p)
  }

  test("a7: per-key scalar broadcast; top-1 pre-filtered before the shuffle") {
    val p = plan("a7_count_writeback")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty, p)
    // WindowGroupLimit(Partial) = each map task keeps only its per-key top-1
    // before the exchange — the shuffle carries O(keys), not O(rows)
    assert(p.toString.contains("WindowGroupLimit"), p.toString)
    assert(!p.toString.contains("SortMergeJoin"), p)
  }

  test("e3 flatten: pure per-row pipeline, no shuffle at all") {
    val p = plan("e3_lessons_flatten")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    // parse_json → explodes → variant extraction is embarrassingly parallel;
    // any exchange here would be a scale bug
    assert(shuffles.isEmpty, p.toString)
  }

  test("cc: one edge shuffle per propagation round, labels broadcast") {
    val p = plan("dd_minhash_cluster_cc")
    // window-min round shape: each of the 3 rounds = BroadcastHashJoin
    // (labels are O(nodes)) + Window over the bucket key — never a
    // sort-merge self-join of the edges against aggregated bucket minima
    assert(!p.toString.contains("SortMergeJoin"), p)
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.size >= 3, p)
    val windows = "\\bWindow\\b".r.findAllIn(p.toString).size
    assert(windows >= 3, s"expected a window-min per round\n$p")
    // per round: one bucket-keyed exchange + one node-keyed agg exchange;
    // +1 for the initial label distinct (banding's exchange hides in the
    // shared InMemoryRelation)
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 7, s"unexpected shuffle count ${shuffles.size}\n$p")
  }

  test("jaccard_lsh: pair verification never shuffles the candidate stream") {
    val p = plan("dd_jaccard_lsh")
    // the per-doc token arrays are a narrow per-row projection of the
    // corpus, broadcast onto the pair stream — candidates flow from the
    // distinct straight through two broadcast hash joins
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.size >= 2, p)
    // exchanges: the band-keyed candidate self-join pair + the pair
    // distinct; the old explode+groupBy array rebuild added two more
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 3, s"unexpected shuffle count ${shuffles.size}\n$p")
  }

  test("dedupNearExact: band-gated candidates, never a token self-join") {
    val p = plan("dd_dedup_near_exact")
    val s = p.toString
    // the default surface's candidates come from the band-key equi-join …
    assert(s.contains("band_key"), s)
    // … never from the all-pairs token self-join (its tok/tok_b equi-join
    // is the O(shared-token-pairs) scale-killer the facade demotes)
    assert(!s.contains("tok_b"), s)
    // losers drop via one anti-join; nothing degenerates to a cartesian
    assert(s.contains("LeftAnti"), s)
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty, p)
  }

  test("sim_topk_batch: queries broadcast; per-query top-k limited map-side") {
    val p = plan("sim_topk_batch")
    assert(p.toString.contains("WindowGroupLimit"), p.toString)
    assert(!p.toString.contains("SortMergeJoin"), p)
    // the scan side never shuffles before the rank limit: the only
    // exchange carries each task's surviving top-5-per-query rows
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1, s"unexpected shuffle count ${shuffles.size}\n$p")
  }

  test("sim_cosine_brute: query vector broadcast, no shuffle of embeddings") {
    val p = plan("sim_cosine_brute")
    val shuffles = collectAll(p) { case e: ShuffleExchangeExec => e }
    // the scan side streams map-side; only the 1-row query side may exchange
    assert(shuffles.isEmpty ||
      shuffles.forall(_.child.toString.contains("vec_id#")), p.toString)
    assert(!p.toString.contains("SortMergeJoin"), p)
  }

  test("q6: every predicate pushed to the scan; single partial-agg scalar") {
    val s = planString("q6_forecast_revenue")
    // plan toString truncates long filter lists — match the stable prefix
    assert(s.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "IsNotNull(l_discount), IsNotNull(l_quantity), " +
      "GreaterThanOrEqual(l_shipda"), s)
    // the scan reads only the 4 needed columns of 16
    assert(s.contains("ReadSchema: struct<l_quantity:double," +
      "l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"),
      s)
    // filter-and-sum to one row: exactly one exchange (partial → final)
    val shuffles = collectAll(plan("q6_forecast_revenue")) {
      case e: ShuffleExchangeExec => e }
    assert(shuffles.size <= 1, s)
  }

  test("hll sketch: map-side partial agg; the exchange carries buckets") {
    val p = plan("sk_hll_registers")
    val s = p.toString
    // partial + final pair around one exchange — the whole table reduces
    // to <=256 rows before the only shuffle
    assert(s.split("HashAggregate").length >= 3, s)
    assert(collectAll(p) { case e: ShuffleExchangeExec => e }.size == 1, s)
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty, p)
  }

  test("rerank: candidate set broadcast into stage 2, no sort-merge join") {
    val p = plan("sim_rerank_topk")
    val s = p.toString
    // stage 1 ADC tables and the 32-candidate set all broadcast; the
    // full-vector side never shuffles for the re-rank join
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.size >= 5, s)
    assert(!s.contains("SortMergeJoin"), s)
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty, p)
  }

  test("decontaminate: both joins broadcast, never a gram self-join") {
    val p = plan("tx_decontaminate")
    val s = p.toString
    val bhj = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(bhj.size >= 2, s) // bench grams inner + contaminated anti
    assert(bhj.exists(_.joinType.toString.contains("LeftAnti")), s)
    assert(!s.contains("SortMergeJoin"), s)
    assert(collectAll(p) { case c: CartesianProductExec => c }.isEmpty, p)
  }

  test("derived epoch-nanos range predicate reaches the parquet scan " +
      "as a pushed timestamp bound (casual read path)") {
    import org.apache.spark.sql.functions.col
    val ev = graft.sources.Tables(spark, dir, "events")
    // pick a mid-range bound so the pruning is non-trivial
    val mid = ev.agg(org.apache.spark.sql.functions.expr(
      "CAST(avg(ts) AS BIGINT)")).head.getLong(0)
    val q = ev.filter(col("ts") >= mid).select("event_id", "ts")
    val s = q.queryExecution.executedPlan.toString
    // EpochNanosPushdown adds `ts >= timestamp(floorDiv(X,1000))` beside
    // the exact derived-column predicate, so PushedFilters is non-empty
    // again on the us-era file — parquet row-group stats prune
    assert(s.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts,"),
      s"ts range bound must reach the scan:\n$s")
    // exactness: the redundant bound loses no rows vs the raw filter
    val expect = ev.collect().map(_.getAs[Long]("ts")).count(_ >= mid)
    assert(q.count() == expect)
    // upper bounds and equality push too
    val s2 = ev.filter(col("ts") < mid).queryExecution.executedPlan.toString
    assert(s2.contains("LessThanOrEqual(ts,"), s2)
  }

  test("ndv column stats flip the filtered-dim join to broadcast " +
      "under CBO") {
    val wh = java.nio.file.Files.createTempDirectory("ndvspec").toString
    spark.conf.set("spark.sql.catalog.ndvcat",
      "graft.sources.v2.TxLogCatalog")
    spark.conf.set("spark.sql.catalog.ndvcat.warehouse", wh)
    // twin dims: identical data, one maintains an NDV sketch on `cat`
    for ((t, props) <- Seq(
        ("dim_ndv", " TBLPROPERTIES ('ndvCols'='cat')"), ("dim_raw", "")))
      spark.sql(s"CREATE TABLE ndvcat.db.$t (k BIGINT, cat BIGINT, " +
        s"pay STRING) USING txlog PARTITIONED BY (bucket(4, k))$props")
    for (t <- Seq("dim_ndv", "dim_raw"))
      spark.sql(s"INSERT INTO ndvcat.db.$t SELECT id, id % 1000, " +
        "md5(cast(id as string)) FROM range(200000)")
    val t0 = graft.sources.TxLogTable(spark, s"$wh/db/dim_ndv")
    // the sketch landed and estimates ~1000 within KMV error (±12%)
    val est = t0.ndvOf(t0.latestVersion.get).getOrElse("cat",
      fail("no #ndv:cat line in the manifest"))
    assert(est > 700 && est < 1400, s"ndv(cat) estimate off: $est")
    val dimBytes = t0.fileSizes(None).map(_._2).sum
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // between the full dim (no broadcast) and dim/1000 (broadcast)
      "spark.sql.autoBroadcastJoinThreshold" -> (dimBytes / 4).toString)
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def q(t: String) =
        spark.sql(s"""SELECT f.id, d.pay FROM range(1000000) f
          JOIN ndvcat.db.$t d ON f.id = d.k WHERE d.cat = 7""")
      // WITH the sketch: filter selectivity 1/ndv shrinks the estimate
      // below the threshold -> the filtered dim BROADCASTS
      val pn = q("dim_ndv").queryExecution.executedPlan
      assert(collectAll(pn) { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"ndv stats must flip the join to broadcast:\n$pn")
      // WITHOUT it: no distinctCount, the filter keeps the full-size
      // estimate, the same join stays a sort-merge
      val pr = q("dim_raw").queryExecution.executedPlan
      assert(collectAll(pr) { case b: BroadcastHashJoinExec => b }.isEmpty &&
        pr.toString.contains("SortMergeJoin"),
        s"control without ndv stats must NOT broadcast:\n$pr")
      // correctness unaffected by the pick
      assert(q("dim_ndv").count() == q("dim_raw").count())
      // CALL detail surfaces the estimate for the operator
      val det = spark.sql("CALL ndvcat.system.detail('db.dim_ndv')")
      assert(det.columns.contains("ndv") &&
        det.head.getAs[String]("ndv").startsWith("cat≈"), det.head.toString)
      // manifest min/max ride along as value bounds: a RANGE filter's
      // estimate shrinks to (max - x)/(max - min) of the rows instead
      // of the no-stats default (the full row count)
      val rf = spark.sql(
        "SELECT * FROM ndvcat.db.dim_ndv WHERE cat > 989")
      val est2 = rf.queryExecution.optimizedPlan.stats.rowCount
      assert(est2.exists(rc => rc > BigInt(0) && rc < BigInt(20000)),
        s"range selectivity must come from min/max bounds: $est2")
      val rfRaw = spark.sql(
        "SELECT * FROM ndvcat.db.dim_raw WHERE cat > 989")
      val estRaw = rfRaw.queryExecution.optimizedPlan.stats.rowCount
      assert(estRaw.forall(_ > BigInt(150000)),
        s"control without bounds must keep the full estimate: $estRaw")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
