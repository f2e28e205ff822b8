package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming correctness = agreement with the batch twin on the same data
  * (SURVEY §2.10): windowed stats vs a batch groupBy, streaming dedup vs
  * batch distinct, stateful sessionizer vs the w2 gap logic.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDir = "/root/testdata/sf0.001"

  private def stageEvents(copies: Int): String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    // Tables normalizes ts to epoch-nanos LongType whatever the driver's
    // parquet writer emitted (TIMESTAMP(NANOS) or timestamp[us]) — the
    // staged copies carry the engine's contract type.
    val ev = graft.sources.Tables(spark, sfDir, "events")
    (1 to copies).foreach(_ =>
      ev.write.mode("append").parquet(dir))
    dir
  }

  test("windowed stats: stream (complete mode) equals batch groupBy") {
    val dir = stageEvents(1)
    val streamed = StreamOps.drainToMemory(spark, dir, "win_stats",
      StreamOps.windowedStats(_), OutputMode.Complete)
      .select(col("window.start"), col("event_type"), col("n"))
    val batch = StreamOps.windowedStats(spark.read.parquet(dir))
      .select(col("window.start"), col("event_type"), col("n"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup: duplicated source collapses to batch distinct") {
    val dir = stageEvents(2)     // every event twice
    val streamed = StreamOps.drainToMemory(spark, dir, "dedup_out",
      StreamOps.dedup(_))
    val n = spark.read.parquet(dir)
      .select(countDistinct(col("event_id"))).head().getLong(0)
    assert(streamed.count() == n)
    assert(streamed.groupBy("event_id").count()
      .filter(col("count") > 1).isEmpty)
  }

  test("stream-stream interval join equals batch inequality join") {
    val dir = stageEvents(1)
    def src = spark.readStream.schema(StreamOps.eventSchema).parquet(dir)
    val q = StreamOps.viewsBeforePurchase(
        src.filter(col("event_type") === "purchase"),
        src.filter(col("event_type") === "view"))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ssj").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ssj").count()

    val ev = spark.read.parquet(dir)
    val bp = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts").as("pts"))
    val bv = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("ts").as("vts"))
    val batch = bp.join(bv,
      col("user_id") === col("vu") &&
        col("vts") <= col("pts") &&
        col("vts") >= col("pts") - lit(3600L * 1000000000L)).count()
    assert(streamed == batch && streamed > 0)
  }

  test("incremental refresh via foreachBatch equals batch recompute") {
    // the north-star extension (SURVEY §2.10): re-run the batch merge ops per
    // micro-batch — here a per-event_type stats table maintained with the
    // engine's Upsert, then compared against a one-shot batch aggregate
    val dir = stageEvents(1)
    val wh = Files.createTempDirectory("graft-inc").toString
    val tablePath = s"$wh/type_stats"
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("n",
          org.apache.spark.sql.types.LongType))))
      .write.mode("overwrite").parquet(tablePath)

    val src = spark.readStream.schema(StreamOps.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val q = src.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val delta = batch.groupBy("event_type")
          .agg(count(lit(1)).as("n"))
        val cur = spark.read.parquet(tablePath)
        // incremental rule: new total = old + delta per key (the additive
        // form of the merge-by-rewrite upsert)
        val updated = cur.withColumnRenamed("n", "old_n")
          .join(delta.withColumnRenamed("n", "delta_n"),
            Seq("event_type"), "full_outer")
          .select(col("event_type"),
            (coalesce(col("old_n"), lit(0L)) +
              coalesce(col("delta_n"), lit(0L))).as("n"))
        val tmp = s"$tablePath.tmp"
        updated.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(tablePath)
        ()
    }.start()
    q.processAllAvailable()
    q.stop()

    val incremental = spark.read.parquet(tablePath)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val batch = spark.read.parquet(dir).groupBy("event_type")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(incremental == batch)
  }

  test("stateful sessionizer equals batch gap logic (sentinel-flushed)") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val gapNs = 30L * 60 * 1000000000L

    val ev = graft.sources.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts")).as[StreamOps.SessionEvent]
    // far-future sentinel per user flushes every real session out of state
    val maxTs = ev.agg(max("ts")).head().getLong(0)
    val sentinels = ev.select(col("user_id")).distinct()
      .withColumn("ts", lit(maxTs + 10 * gapNs))
      .as[StreamOps.SessionEvent]

    val input = MemoryStream[StreamOps.SessionEvent]
    val q = StreamOps.sessionize(input.toDS(), gapNs).writeStream
      .outputMode(OutputMode.Append).format("memory")
      .queryName("sessions").start()
    input.addData(ev.collect().toSeq)
    q.processAllAvailable()
    input.addData(sentinels.collect().toSeq)
    q.processAllAvailable()
    q.stop()

    val streamedCounts = spark.table("sessions")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))

    // batch twin: gap-flag + running sum, ordered by ts
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val batchCounts = graft.sources.Tables(spark, sfDir, "events")
      .withColumn("flag",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") - lag(col("ts"), 1).over(w) > gapNs, 1).otherwise(0))
      .groupBy("user_id")
      .agg(sum(col("flag")).as("n_sessions"))

    val diff = streamedCounts.as("s")
      .join(batchCounts.as("b"), "user_id")
      .filter(col("s.n_sessions") =!= col("b.n_sessions"))
    assert(streamedCounts.count() == batchCounts.count())
    assert(diff.isEmpty)
  }

  test("streaming LSH near-dup: single batch equals batch bucket-min") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    val input = MemoryStream[StreamOps.BandRow]
    val q = StreamOps.lshOwnership(input.toDS()).writeStream
      .outputMode(OutputMode.Append).format("memory")
      .queryName("lsh_own").start()
    val bandRows = StreamOps.streamingBands(docs)
      .as[StreamOps.BandRow].collect().toSeq
    input.addData(bandRows)
    q.processAllAvailable()
    q.stop()

    // batch twin: owner of each bucket = min doc_id in the bucket
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "band_key")
    val expected = graft.queries.TextQueries.bandsOf(docs)
      .withColumn("owner", min("doc_id").over(w))
    val got = spark.table("lsh_own")
    assert(got.count() == expected.count())
    val diff = got.as("g")
      .join(expected.as("e"), Seq("doc_id", "band", "band_key"))
      .filter(col("g.owner") =!= col("e.owner"))
    assert(diff.isEmpty)
    // per-doc dup verdict: dup iff any bucket is owned by another doc —
    // equals the batch dd_minhash_cluster is_dup flag
    val streamDup = got.groupBy("doc_id")
      .agg(max(col("is_dup")).as("is_dup"))
    val batchDup = expected.groupBy("doc_id")
      .agg((min(col("owner")) =!= first(col("doc_id"))).as("is_dup"))
    val dupDiff = streamDup.as("sd").join(batchDup.as("bd"), "doc_id")
      .filter(col("sd.is_dup") =!= col("bd.is_dup"))
    assert(dupDiff.isEmpty)
  }

  test("streaming keyed merge into tx-log: one version per batch, U8 result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val t = graft.sources.TxLogTable(spark,
      Files.createTempDirectory("txsink").resolve("t").toString)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    val ckpt = Files.createTempDirectory("txsink-ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamOps.upsertIntoTxLog(
      input.toDF().toDF("id", "v"), t, Seq("id"), ckpt)
    input.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    // batch 2 updates key 2, inserts key 3 twice — the greater row wins
    // deterministically, independent of arrival partition order
    input.addData((2L, "b2"), (3L, "c0"), (3L, "c9"))
    q.processAllAvailable()
    q.stop()
    def rows(v: Option[Int]) = t.snapshot(schema, v).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows(None) == Set((1L, "a"), (2L, "b2"), (3L, "c9")))
    // each microbatch published exactly one version; the first batch's
    // state is still time-travelable
    assert(t.versions == Seq(0, 1))
    assert(rows(Some(0)) == Set((1L, "a"), (2L, "b")))
  }

  test("streaming merge preserves a partitioned table's layout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val t = graft.sources.TxLogTable(spark,
      Files.createTempDirectory("txsinkp").resolve("t").toString)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("k", StringType)))
    t.commit(Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "k"),
      overwrite = true, partitionCols = Seq("k"))
    val ckpt = Files.createTempDirectory("txsinkp-ckpt").toString
    val input = MemoryStream[(Long, String, String)]
    val q = StreamOps.upsertIntoTxLog(
      input.toDF().toDF("id", "v", "k"), t, Seq("id"), ckpt)
    input.addData((2L, "b2", "y"), (3L, "c", "x"))
    q.processAllAvailable()
    q.stop()
    assert(t.partitionColsOf(t.latestVersion.get) == Seq("k"))
    val snap = t.snapshot(schema)
    assert(snap.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(snap.filter($"k" === "x").count() == 2)
  }

  test("partition-aligned streaming merge rewrites only touched partitions") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.nio.file.Paths
    import org.apache.spark.sql.types._
    val t = graft.sources.TxLogTable(spark,
      Files.createTempDirectory("txsinkd").resolve("t").toString)
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("id", LongType),
      StructField("v", StringType)))
    t.commit(Seq(("x", 1L, "a"), ("y", 2L, "b")).toDF("k", "id", "v"),
      overwrite = true, partitionCols = Seq("k"))
    def filesUnder(part: String): Set[String] =
      scala.util.Using.resource(
          Files.walk(Paths.get(t.root, "data", part))) { s =>
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isRegularFile(_))
          .map(_.getFileName.toString).toSet
      }
    val yBefore = filesUnder("k=y")
    val ckpt = Files.createTempDirectory("txsinkd-ckpt").toString
    val input = MemoryStream[(String, Long, String)]
    // keys ⊇ partition cols → the sink takes the pruned-merge path
    val q = StreamOps.upsertIntoTxLog(
      input.toDF().toDF("k", "id", "v"), t, Seq("k", "id"), ckpt)
    input.addData(("x", 1L, "a2"), ("x", 3L, "c"))
    q.processAllAvailable()
    q.stop()
    // k=y partition: not in the batch, its files must be untouched
    assert(filesUnder("k=y") == yBefore)
    val snap = t.snapshot(schema).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(snap == Set(("x", 1L, "a2"), ("x", 3L, "c"), ("y", 2L, "b")))
    assert(t.partitionColsOf(t.latestVersion.get) == Seq("k"))
  }

  test("partition-aligned merge keeps null-partition rows not in the batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val t = graft.sources.TxLogTable(spark,
      Files.createTempDirectory("txsinkn").resolve("t").toString)
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("id", LongType),
      StructField("v", StringType)))
    // a null partition value is a real partition (__HIVE_DEFAULT_PARTITION__)
    t.commit(Seq(("x", 1L, "a"), (null, 2L, "b")).toDF("k", "id", "v"),
      overwrite = true, partitionCols = Seq("k"))
    val ckpt = Files.createTempDirectory("txsinkn-ckpt").toString
    val input = MemoryStream[(Option[String], Long, String)]
    val q = StreamOps.upsertIntoTxLog(
      input.toDF().toDF("k", "id", "v"), t, Seq("k", "id"), ckpt)
    // the batch writes INTO the null partition; commitDynamic rewrites it
    // wholesale, so row (null, 2, "b") must ride through the merge — a
    // non-null-safe semi-join would silently delete it
    input.addData((None, 3L, "c"))
    q.processAllAvailable()
    q.stop()
    val snap = t.snapshot(schema).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getString(2))).toSet
    assert(snap == Set(
      (Some("x"), 1L, "a"), (None, 2L, "b"), (None, 3L, "c")))
  }

  test("streaming merge drops metadata columns from a change-feed input") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.types._
    val t = graft.sources.TxLogTable(spark,
      Files.createTempDirectory("txsinkm").resolve("t").toString)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    val ckpt = Files.createTempDirectory("txsinkm-ckpt").toString
    // a stream fed from changesBetween carries _commit_version; the sink
    // must merge on the data columns only and not propagate the metadata
    val input = MemoryStream[(Long, String, Long)]
    val q = StreamOps.upsertIntoTxLog(
      input.toDF().toDF("id", "v", "_commit_version"), t, Seq("id"), ckpt)
    input.addData((1L, "a2", 7L), (2L, "b", 7L))
    q.processAllAvailable()
    q.stop()
    val snap = t.snapshot(schema)
    assert(snap.columns.toSeq == Seq("id", "v"))
    assert(snap.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a2"), (2L, "b")))
  }

  test("streaming LSH near-dup: later arrivals flagged against first owner") {
    import spark.implicits._
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamOps.BandRow]
    val q = StreamOps.lshOwnership(input.toDS()).writeStream
      .outputMode(OutputMode.Append).format("memory")
      .queryName("lsh_own2").start()
    // trigger 1: doc 10 claims bucket X; trigger 2: doc 3 (smaller id!)
    // arrives in X and a fresh bucket Y
    input.addData(StreamOps.BandRow(10L, 0L, "X"))
    q.processAllAvailable()
    input.addData(StreamOps.BandRow(3L, 0L, "X"),
      StreamOps.BandRow(3L, 1L, "Y"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("lsh_own2")
      .collect().map(r => (r.getLong(0), r.getString(2),
        r.getLong(3), r.getBoolean(4))).toSet
    // arrival order wins: doc 10 stays owner of X, doc 3 is the dup there
    assert(rows == Set(
      (10L, "X", 10L, false),
      (3L, "X", 10L, true),
      (3L, "Y", 3L, false)))
  }

  test("watermarked dedup state persists ACROSS micro-batches") {
    // batch 1 delivers the even events; batch 2 re-delivers EVERYTHING
    // (at-least-once upstream). The sink must hold exactly the evens
    // after batch 1 and exactly one copy of each event after batch 2 —
    // re-deliveries die against state built in a PREVIOUS batch, not
    // merely within-batch distinct.
    val dir = Files.createTempDirectory("graft-xbatch").toString
    val ev = graft.sources.Tables(spark, sfDir, "events")
    val tbl = graft.sources.TxLogTable(spark, s"$dir/t")
    tbl.commit(ev.filter(col("event_id") % 2 === 0), overwrite = true)
    val q = spark.readStream.format("txlog").schema(ev.schema).load(tbl.root)
      .withColumn("ets",
        timestamp_micros((col("ts") / 1000000L).cast("long") * 1000L))
      .withWatermark("ets", "3650 days")
      .dropDuplicates("event_id", "ets")
      .writeStream.format("memory").queryName("xbatch_dedup")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      q.processAllAvailable()
      val evens = ev.filter(col("event_id") % 2 === 0).count()
      assert(spark.table("xbatch_dedup").count() == evens)
      tbl.commit(ev, overwrite = false)
      q.processAllAvailable()
      assert(spark.table("xbatch_dedup").count() == ev.count())
      assert(spark.table("xbatch_dedup").groupBy("event_id").count()
        .filter(col("count") > 1).isEmpty)
    } finally q.stop()
  }
}
