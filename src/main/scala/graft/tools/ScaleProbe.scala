package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale probe: replicate the sf0.1 documents corpus 10× (doc_id offset per
  * copy keeps ids unique; duplication structure scales with it) and time the
  * round-2 heavy operators. Run:
  *   sbt -batch "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Engine writes pin INT64 TIMESTAMP_MICROS (not Spark's legacy
      // INT96, which carries NO column statistics): every staged
      // timestamp column gets real min/max footer stats, so manifest
      // range pruning works on time predicates without any partitioning.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def rep(k: Int): DataFrame = (0 until k).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_.unionByName(_))
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    val what = if (args.isEmpty)
                 Set("dedup", "txlog", "stream", "skip", "merge", "bloom",
                   "harvest", "mergestr", "semdedup", "metacount",
                   "manifest", "mv")
               else args.toSet

    // MATERIALIZED-VIEW REFRESH IS O(CHANGED GROUPS) (r16): grow the
    // source 10× in groups, touch the SAME 100 groups, and the
    // refresh's written bytes (replacement rows + DV mask) must stay
    // ~flat while the view itself grows 10× — the hourly-refresh-at-
    // 100TB claim, measured rather than asserted.
    if (what("mv")) {
      import org.apache.spark.sql.types.{DoubleType, LongType,
        StructField, StructType}
      def dataBytes(root: String): Long = {
        val d = java.nio.file.Paths.get(root, "data")
        scala.util.Using.resource(java.nio.file.Files.walk(d)) { s =>
          s.filter(java.nio.file.Files.isRegularFile(_))
            .mapToLong(java.nio.file.Files.size(_)).sum()
        }
      }
      def run(groups: Long): (Long, Long, Double) = {
        val dir = java.nio.file.Files.createTempDirectory("mvprobe")
        val src = graft.sources.TxLogTable(spark,
          dir.resolve("src").toString)
        val schema = StructType(Seq(StructField("k", LongType),
          StructField("v", DoubleType)))
        src.commit(spark.range(groups * 4).select(
          (col("id") % groups).as("k"),
          (col("id") % 97).cast("double").as("v")), overwrite = true)
        val mvRoot = dir.resolve("mv").toString
        graft.operators.MaterializedView.create(spark, mvRoot,
          s"probe$groups", src, schema, Seq("k"), Seq("total" -> "v"))
        val mvBytes = dataBytes(mvRoot)
        src.commit(spark.range(100).select(col("id").as("k"),
          lit(1.0).as("v")), overwrite = false) // touch 100 groups
        val before = dataBytes(mvRoot)
        val t0 = System.nanoTime()
        val st = graft.operators.MaterializedView.refresh(spark, mvRoot)
        val dt = (System.nanoTime() - t0) / 1e9
        require(st.mode == "incremental" && st.groupsChanged == 100, st)
        (mvBytes, dataBytes(mvRoot) - before, dt)
      }
      val (sz0, w0, s0) = run(50000L)
      val (sz1, w1, s1) = run(500000L)
      println(f"[probe] mv: view 50k groups = $sz0 B, refresh(100 " +
        f"changed) wrote $w0 B in $s0%.1f s")
      println(f"[probe] mv: view 500k groups = $sz1 B, refresh(100 " +
        f"changed) wrote $w1 B in $s1%.1f s")
      println(f"[probe] mv: view grew ${sz1.toDouble / sz0}%.1fx, " +
        f"refresh bytes grew ${w1.toDouble / w0}%.2fx")
      require(sz1 > sz0 * 5, s"the view must actually grow: $sz0 -> $sz1")
      require(w1 < w0 * 3,
        s"refresh write cost must track changed groups, not view size: " +
          s"$w0 -> $w1")
    }

    // O(delta) COMMIT METADATA (the r15 VERDICT's #1): the bytes a
    // single-file append PUTs must stay ~flat as the table grows 10× in
    // file count, while the self-contained CHECKPOINT grows linearly
    // with it — i.e. the per-commit cost scales with the commit, not
    // the table. Method: grow to ~100 files, vacuum (materializes the
    // survivor → a clean checkpoint to measure), single-file append,
    // record both sizes; repeat at ~1000 files; assert the ratios.
    if (what("manifest")) {
      import spark.implicits._
      val dir = java.nio.file.Files.createTempDirectory("maniprobe")
        .resolve("t").toString
      val t = graft.sources.TxLogTable(spark, dir)
      def mpath(v: Int) = java.nio.file.Paths.get(dir, "_log",
        f"v$v%08d.manifest")
      def grow(files: Int): Unit =
        while (t.fileCount(None) < files)
          t.commit((0 until 250).map(i => (i.toLong, "x")).toDF("id", "v")
            .repartition(25), overwrite = false)
      t.commit(Seq((0L, "seed")).toDF("id", "v"), overwrite = true)
      val measured = Seq(100, 1000).map { files =>
        grow(files)
        t.vacuum(keep = 1, minAgeMillis = 0, retainMillis = 0)
        val cp = t.latestVersion.get
        val cpBytes = java.nio.file.Files.size(mpath(cp))
        val av = t.commit(Seq((-1L, "probe")).toDF("id", "v"),
          overwrite = false)
        val apBytes = java.nio.file.Files.size(mpath(av))
        val delta = new String(java.nio.file.Files.readAllBytes(mpath(av)),
          java.nio.charset.StandardCharsets.UTF_8)
          .linesIterator.exists(_.startsWith("#delta="))
        println(s"[probe] manifest: files=${t.fileCount(None)} " +
          s"checkpoint=$cpBytes B, single-append commit=$apBytes B " +
          s"(delta=$delta)")
        require(delta, "a single-file append on a big table must delta")
        (t.fileCount(None), cpBytes, apBytes)
      }
      val (f0, cp0, ap0) = measured.head
      val (f1, cp1, ap1) = measured.last
      println(f"[probe] manifest: ${f1.toDouble / f0}%.1fx files -> " +
        f"checkpoint ${cp1.toDouble / cp0}%.1fx, " +
        f"append commit ${ap1.toDouble / ap0}%.2fx")
      require(cp1 > cp0 * 5,
        s"checkpoint must grow with file count: $cp0 -> $cp1")
      require(ap1 < ap0 * 2,
        s"append commit bytes must stay ~flat (O(delta)): $ap0 -> $ap1")
    }

    // SQL row-level DML under LIVE MOR tombstones, under table growth:
    // k key-banded appends, a MOR delete leaving tombstones live, then a
    // SQL UPDATE touching ONE band. Two flat-ness properties at stake:
    //  - the operation scan stays manifest-PRUNED (rewritten files ≈ one
    //    band regardless of k — the mask must not defeat pruning), and
    //  - the masked scan's cost is bounded by the rows it actually reads
    //    (tombstone map is a driver-built hash probe per row), so UPDATE
    //    wall time stays ~flat as the table grows 10×.
    // Correctness is asserted in-probe: deleted keys never resurrect,
    // and the rewritten band carries the update.
    // the catalog instance is cached per name — configure ONCE, table per k
    if (what("mor")) {
      val wh = java.nio.file.Files.createTempDirectory("morprobe").toString
      spark.conf.set("spark.sql.catalog.morcat",
        "graft.sources.v2.TxLogCatalog")
      spark.conf.set("spark.sql.catalog.morcat.warehouse", wh)
      for (k <- Seq(10, 100)) {
      val n = 100000L
      spark.sql(s"CREATE TABLE morcat.db.t$k (id BIGINT, v STRING) " +
        "USING txlog")
      val t = graft.sources.TxLogTable(spark, s"$wh/db/t$k")
      (0 until k).foreach { i =>
        t.commit(spark.range(i * n, (i + 1) * n)
            .selectExpr("id", "cast(id as string) as v"),
          overwrite = false)
      }
      // MOR-delete 1k keys scattered over band 3, tombstones stay live
      t.deleteByKeysMor(
        spark.range(3 * n, 3 * n + 10000, 10).selectExpr("id"))
      val before = t.addedVersions(None)
      time(s"mor sql-update x$k") {
        spark.sql(s"UPDATE morcat.db.t$k SET v = concat('U', v) " +
          s"WHERE id >= ${3 * n + 5000} AND id < ${3 * n + 6000}")
        1L
      }
      val after = t.addedVersions(None)
      val rewrote = after.count { case (rel, v) =>
        !before.contains(rel) && v > before.values.max }
      println(s"[probe] mor x$k rewrote $rewrote of ${after.size} files " +
        s"(pruned + masked; tombstones live)")
      val got = spark.sql(s"SELECT count(*) FROM morcat.db.t$k " +
        s"WHERE id >= ${3 * n} AND id < ${3 * n} + 10000").head.getLong(0)
      require(got == 9000L, s"mask broken: expected 9000 survivors, got $got")
      val upd = spark.sql(s"SELECT count(*) FROM morcat.db.t$k " +
        "WHERE v LIKE 'U%'").head.getLong(0)
      require(upd == 900L, s"update lost rows under mask: $upd of 900")
      spark.sql(s"DROP TABLE morcat.db.t$k")
      }
    }

    // Bloom HARVEST memory under per-file growth: one file of N rows with
    // bloom columns enabled. The round-5 harvest buffered O(rows × k)
    // positions in a single aggregation buffer before dedup (an executor
    // OOM hazard on exactly the large files blooms exist for); the
    // explode + collect_set form keeps per-group state bounded by m, so
    // cost must scale ~linearly with rows (scan-bound) — never
    // superlinearly, never OOM.
    if (what("harvest")) for (n <- Seq(1000000L, 10000000L)) {
      val t = graft.sources.TxLogTable(spark,
        java.nio.file.Files.createTempDirectory("harvestprobe")
          .resolve("t").toString)
      time(s"bloom harvest 1 file × ${n / 1000000}M rows") {
        t.commit(spark.range(n).select(col("id")).coalesce(1),
          overwrite = true, bloomCols = Seq("id"))
        n
      }
    }

    // STRING-keyed merge under growth, both pruning handles:
    //  (a) key-CLUSTERED appends — the batch hull against the :spre range
    //      stats confines the rewrite to the band's files (the handle
    //      bloom saturation cannot break);
    //  (b) key-SCATTERED appends (every file spans the whole key range, so
    //      the hull prunes nothing) with blooms sized ~40 bits/value —
    //      only the probe-set bloom pass clears files there.
    // Rewritten-file counts must stay ~flat as the table grows 10×; a
    // string merge without these handles rewrites ALL files at any size.
    if (what("mergestr")) for (k <- Seq(10, 100)) {
      val n = 100000L
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "s STRING, v STRING")
      def key(e: String) = s"concat('k', lpad(cast(($e) as string), 10, '0'))"
      // (a) clustered bands: append i holds ids [i·n, (i+1)·n)
      val tc = graft.sources.TxLogTable(spark,
        java.nio.file.Files.createTempDirectory("mergestrprobe")
          .resolve("t").toString)
      (0 until k).foreach { i =>
        tc.commit(spark.range(i * n, (i + 1) * n)
            .selectExpr(s"${key("id")} as s", "cast(id as string) as v"),
          overwrite = false)
      }
      val batchC = spark.range(3 * n + 100, 3 * n + 1100)
        .selectExpr(s"${key("id")} as s", "concat('upd', id) as v")
      var st: graft.sources.TxLogTable.MergeStats = null
      time(s"merge cow STRING clustered x$k") {
        st = tc.merge(schema, batchC, Seq("s")); st.version.toLong
      }
      println(s"[probe] string clustered x$k rewrote ${st.rewritten} of " +
        s"${st.rewritten + st.carried} files (hull pruning)")
      // (b) scattered: append i holds ids ≡ i (mod k) — every file spans
      // the full range; blooms at 2^17 bits carry ~40 bits/value at
      // n/file ≈ 3k, low enough FPP for a 1000-key probe set
      val ts = graft.sources.TxLogTable(spark,
        java.nio.file.Files.createTempDirectory("mergestrprobe2")
          .resolve("t").toString)
      (0 until k).foreach { i =>
        ts.commit(spark.range(10000)
            .selectExpr(s"${key(s"id * $k + $i")} as s",
              "cast(id as string) as v"),
          overwrite = false, bloomCols = Seq("s"), bloomBits = 1 << 17)
      }
      val batchS = spark.range(100, 1100)
        .selectExpr(s"${key(s"id * $k + 3")} as s",
          "concat('upd', id) as v")
      time(s"merge cow STRING scattered x$k") {
        st = ts.merge(schema, batchS, Seq("s")); st.version.toLong
      }
      println(s"[probe] string scattered x$k rewrote ${st.rewritten} of " +
        s"${st.rewritten + st.carried} files (bloom pruning)")
      // (c) OVER-CAP scattered batch: 10⁵ distinct keys — far beyond
      // MaxMergeProbeKeys (10⁴), so no driver-side probe set exists and
      // the hull spans the whole domain. The distributed bloom probe is
      // the only live handle: the rewrite must still touch only the
      // files that genuinely hold batch keys (every 8th append below),
      // never degrade to a full rewrite.
      val batchOver = (0 until 8).map(j =>
        spark.range(12500).selectExpr(
          s"${key(s"id * $k + ${j % math.min(k, 8)}")} as s",
          "concat('upd', id) as v")).reduce(_.unionByName(_))
      time(s"merge cow STRING over-cap 100k keys x$k") {
        st = ts.merge(schema, batchOver, Seq("s")); st.version.toLong
      }
      println(s"[probe] string over-cap x$k rewrote ${st.rewritten} of " +
        s"${st.rewritten + st.carried} files (distributed bloom probe; " +
        s"batch hits ${math.min(k, 8)} of $k appends)")
    }

    // Bloom skipping under growth: k scattered appends (append i holds
    // ids ≡ i mod k, so every file spans ~the whole id range and min/max
    // stats prune NOTHING); a point lookup's candidate set must stay ~1
    // file (+ ~1% FPP of k) as the table grows 10x — the evidence that
    // unclustered id lookups stay O(1 files) at any table size.
    if (what("bloom")) for (k <- Seq(10, 100)) {
      val t = graft.sources.TxLogTable(spark,
        java.nio.file.Files.createTempDirectory("bloomprobe")
          .resolve("t").toString)
      time(s"bloom build x$k") {
        (0 until k).foreach { i =>
          t.commit(spark.range(10000)
            .select((col("id") * k + i).as("id")),
            overwrite = false, bloomCols = Seq("id"))
        }
        k.toLong
      }
      val probe = 7777L * k + 3 // lives in append 3 only
      val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT")
      val rangeCand = t.candidateFiles("id", probe, probe).size
      val bloomCand = t.candidateFilesWhere(col("id") === probe).size
      time(s"bloom point-lookup x$k (range $rangeCand/${t.fileCount()}, " +
          s"bloom $bloomCand/${t.fileCount()} files)") {
        t.snapshotWhere(schema, col("id") === probe).count()
      }
    }

    if (what("dedup")) for (k <- Seq(1, 10)) {
      val docs = rep(k).cache(); docs.count()
      // conv clusters over k× corpus
      time(s"cluster_conv x$k") {
        val bands = graft.queries.TextQueries.bandsOf(docs)
        graft.operators.LabelPropagation
          .connectedComponents(bands, "doc_id", Seq("band", "band_key"))
          .count()
      }
      time(s"jaccard_lsh x$k") {
        graft.queries.TextQueries.jaccardLshOf(docs).count()
      }
      docs.unpersist(true)
      spark.sharedState.cacheManager.clearCache()
    }

    // tx-log backend: k partitioned appends, then snapshot + time travel.
    // Commit cost must stay ~flat per commit (one delta write + one
    // manifest rewrite); snapshot cost is one scan over the listed files.
    if (what("txlog")) for (k <- Seq(10, 100)) {
      val root = java.nio.file.Files.createTempDirectory("txprobe")
        .resolve("t").toString
      val t = graft.sources.TxLogTable(spark, root)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v STRING, part STRING")
      time(s"txlog commits x$k") {
        (0 until k).map { i =>
          t.commit(spark.range(i * 10L, i * 10L + 10)
              .selectExpr("id", "cast(id as string) as v",
                s"'p${i % 4}' as part"),
            overwrite = false, partitionCols = Seq("part"))
        }.last.toLong
      }
      time(s"txlog snapshot x$k") { t.snapshot(schema).count() }
      time(s"txlog timetravel x$k") { t.snapshot(schema, Some(k / 2)).count() }
    }

    // data skipping: k× the events table appended as k ts-banded commits,
    // then a one-band range scan via manifest stats vs the full-snapshot
    // filter. The pruned scan must stay ~flat as k grows (it reads one
    // band's files regardless of table size) while the full scan grows
    // linearly — the property that makes time-range queries affordable on
    // an hourly-appended 100 TB table.
    if (what("skip")) for (k <- Seq(10, 100)) {
      val ev = graft.sources.Tables(spark, "/root/testdata/sf0.1", "events")
        .selectExpr("event_id", "ts div 1000 as ts_us", "value")
      val mm = ev.agg(min("ts_us"), max("ts_us")).head
      val (mn, mx) = (mm.getLong(0), mm.getLong(1))
      val span = mx - mn + 1
      val t = graft.sources.TxLogTable(spark,
        java.nio.file.Files.createTempDirectory("skipprobe")
          .resolve("t").toString)
      // k disjoint ts bands: band i shifted by i spans → k× rows, k bands
      time(s"skip build x$k") {
        (0 until k).map { i =>
          t.commit(ev.select(
              (col("event_id") + lit(i * 10000000L)).as("event_id"),
              (col("ts_us") + lit(i * span)).as("ts_us"), col("value")),
            overwrite = false)
        }.last.toLong
      }
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts_us BIGINT, value DOUBLE")
      val (lo, hi) = (mn + (k / 2) * span, mn + (k / 2) * span + span - 1)
      time(s"skip pruned-scan x$k (${t.candidateFiles("ts_us", lo, hi).size}"
          + s"/${t.fileCount()} files)") {
        t.snapshotRange(schema, "ts_us", lo, hi).count()
      }
      time(s"skip full-filter x$k") {
        t.snapshot(schema)
          .filter(col("ts_us") >= lo && col("ts_us") <= hi).count()
      }
    }

    // copy-on-write merge: a key-clustered table of k×N rows, then a keyed
    // update touching ONE key band. Rewritten-file count and merge time
    // must stay ~flat as the table grows k× — the manifest key-range stats
    // bound the rewrite to the band's files, while the old full-rewrite
    // fallback would grow linearly (measured side by side below).
    if (what("merge")) for (k <- Seq(10, 100)) {
      val n = 100000L
      val t = graft.sources.TxLogTable(spark,
        java.nio.file.Files.createTempDirectory("mergeprobe")
          .resolve("t").toString)
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "id BIGINT, v STRING")
      // k disjoint key bands of n rows each (k appends, band-clustered)
      (0 until k).foreach { i =>
        t.commit(spark.range(i * n, (i + 1) * n)
            .selectExpr("id", "cast(id as string) as v"),
          overwrite = false)
      }
      val batch = spark.range(3 * n + 100, 3 * n + 1100)
        .selectExpr("id", "concat('upd', id) as v")
      var st: graft.sources.TxLogTable.MergeStats = null
      time(s"merge cow x$k") {
        st = t.merge(schema, batch, Seq("id"))
        st.version.toLong
      }
      println(s"[probe] merge cow x$k rewrote ${st.rewritten} of " +
        s"${st.rewritten + st.carried} files")
      time(s"merge full-rewrite x$k") {
        val merged = graft.operators.Upsert.deleteInsert(
          t.snapshot(schema), batch, Seq("id"))
        t.commit(merged, overwrite = true).toLong
      }
    }

    // SEQUENCE PACKING under growth: shard count = ⌈tokens / T⌉, so a 10×
    // corpus gets ~10× shards at a constant per-shard window size — wall
    // time must scale ~linearly (scan-bound), never superlinearly (which
    // is what a FIXED shard count degrades to once shards outgrow a
    // partition: one giant sort per shard).
    if (what("pack")) for (k <- Seq(1, 10)) {
      val T = 65536L
      val base10 = rep(k).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      time(s"pack sequences x$k") {
        val total = base10.agg(sum("n_tokens")).head.getLong(0)
        val shards = math.max(1L, (total + T - 1) / T)
        println(s"[probe]   shards=$shards (total=$total tokens)")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("shard").orderBy("doc_id")
          .rowsBetween(Long.MinValue, -1)
        base10.withColumn("shard", col("doc_id") % shards)
          .withColumn("pack_seq",
            (coalesce(sum("n_tokens").over(w), lit(0L)) / 512)
              .cast("long"))
          .agg(max("pack_seq")).head.getLong(0)
      }
    }

    // Filtered metadata COUNT under table growth: `COUNT(*) WHERE p = x`
    // on a partitioned catalog table is answered from the manifest
    // (LocalTableScan — no file opened), so its wall time must stay
    // ~FLAT as the table grows 10×, while the same count with a
    // non-partition conjunct (which must scan) grows with the data. The
    // answers are cross-checked against each other for exactness.
    if (what("metacount")) {
      val wh = java.nio.file.Files.createTempDirectory("metaprobe").toString
      spark.conf.set("spark.sql.catalog.metacat",
        "graft.sources.v2.TxLogCatalog")
      spark.conf.set("spark.sql.catalog.metacat.warehouse", wh)
      for (k <- Seq(10, 100)) {
        val n = 100000L
        spark.sql(s"CREATE TABLE metacat.db.t$k (id BIGINT, p INT) " +
          "USING txlog PARTITIONED BY (p)")
        val t = graft.sources.TxLogTable(spark, s"$wh/db/t$k")
        (0 until k).foreach(i =>
          t.commit(spark.range(i * n, (i + 1) * n)
              .selectExpr("id", s"CAST(id % 16 AS INT) AS p"),
            overwrite = false, partitionCols = Seq("p")))
        var meta = 0L
        time(s"metacount collapse x$k") {
          val q = spark.sql(
            s"SELECT count(*) AS c FROM metacat.db.t$k WHERE p = 3")
          require(q.queryExecution.executedPlan.toString
            .contains("LocalTableScan"), "collapse must fire")
          meta = q.head.getLong(0)
          meta
        }
        time(s"metacount scan x$k") {
          val full = spark.sql(s"SELECT count(*) AS c FROM metacat.db.t$k " +
            "WHERE p = 3 AND id >= 0").head.getLong(0)
          require(full == meta,
            s"manifest count $meta != scanned count $full")
          full
        }
        spark.sql(s"DROP TABLE metacat.db.t$k")
      }
    }

    // Semantic dedup under corpus growth: k derives from the corpus
    // (k = ⌈rows/targetCell⌉, SemDedup.apply) so the per-cluster O(cell²)
    // pair work stays FLAT as the corpus grows 10× — with a pinned k the
    // cells (and the quadratic candidate-pair term) would grow 10×. The
    // probe reports derived k, avg/max cell size, and total candidate
    // pairs per cluster; the flatness invariant is avg cell ≤ 2× target
    // at every corpus size.
    if (what("semdedup")) for (k <- Seq(1, 10)) {
      implicit val sp: SparkSession = spark
      val embBase =
        spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      val emb = (0 until k).map(i => embBase
          .withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_.unionByName(_))
      val rows = emb.count()
      val targetCell = 250L
      val kk = graft.operators.SemDedup.kFor(rows, targetCell)
      var dd: DataFrame = null
      time(s"semdedup x$k (rows=$rows, k=$kk)") {
        dd = graft.operators.SemDedup(emb, tau = 0.3,
          targetCell = targetCell, rows = Some(rows))
          .localCheckpoint()
        dd.count()
      }
      val cells = dd.groupBy("cluster").count()
      val st = cells.agg(avg("count"), max("count"),
        sum(col("count") * (col("count") - 1) / 2)).head
      val (avgCell, maxCell, pairs) =
        (st.getDouble(0), st.getLong(1), st.getDouble(2))
      println(f"[probe] semdedup x$k: avg cell $avgCell%.1f, " +
        f"max cell $maxCell, candidate pairs $pairs%.0f " +
        f"(${pairs / rows}%.1f per row)")
      require(avgCell <= 2.0 * targetCell,
        s"semdedup cells grew with the corpus: avg $avgCell at x$k")
    }

    // streaming LSH bucket-ownership over a k× corpus, fed as a file
    // stream in multiple microbatches; state is one long per bucket.
    if (what("stream")) for (k <- Seq(1, 10)) {
      import spark.implicits._
      implicit val sp: SparkSession = spark
      val bandsDir = java.nio.file.Files.createTempDirectory("bandsprobe")
        .toString
      graft.queries.TextQueries
        .statelessBands(rep(k).repartition(col("doc_id")))
        .write.mode("overwrite").parquet(bandsDir)
      time(s"stream lsh_ownership x$k") {
        val src = spark.readStream
          .schema("doc_id BIGINT, band BIGINT, band_key STRING")
          .option("maxFilesPerTrigger", "8")
          .parquet(bandsDir)
        val q = graft.streaming.StreamOps
          .lshOwnership(src.as[graft.streaming.StreamOps.BandRow])
          .writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .format("memory").queryName(s"probe_own_$k")
          .start()
        q.processAllAvailable(); q.stop()
        spark.table(s"probe_own_$k").count()
      }
    }
    // Bucketed SPJ vs shuffled join under table growth: same two tables,
    // same join, conf on vs off. The SPJ plan's advantage should GROW
    // with the data (the shuffle it avoids is O(rows)); the probe prints
    // both walls and asserts the SPJ plan really had zero exchanges.
    if (what("bucketjoin")) {
      val wh = java.nio.file.Files.createTempDirectory("bkprobe").toString
      spark.conf.set("spark.sql.catalog.bkcat",
        "graft.sources.v2.TxLogCatalog")
      spark.conf.set("spark.sql.catalog.bkcat.warehouse", wh)
      for (k <- Seq(1, 10)) {
        val n = 1000000L * k
        spark.sql(s"CREATE TABLE bkcat.db.fact$k (k BIGINT, v DOUBLE) " +
          "USING txlog PARTITIONED BY (bucket(32, k))")
        spark.sql(s"CREATE TABLE bkcat.db.dim$k (k BIGINT, w DOUBLE) " +
          "USING txlog PARTITIONED BY (bucket(32, k))")
        spark.sql(s"INSERT INTO bkcat.db.fact$k " +
          s"SELECT id % ${n / 4}, CAST(id AS DOUBLE) FROM range($n)")
        spark.sql(s"INSERT INTO bkcat.db.dim$k " +
          s"SELECT id, CAST(id AS DOUBLE) FROM range(${n / 4})")
        val q = s"""SELECT /*+ MERGE(f) */ f.k, f.v, d.w
          FROM bkcat.db.fact$k f JOIN bkcat.db.dim$k d ON f.k = d.k"""
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plan = spark.sql(q).queryExecution.executedPlan.toString
        require(!plan.contains("Exchange") && plan.contains("TxLogSpjScan"),
          s"bucketed probe join must be shuffle-free:\n$plan")
        time(s"bucketjoin spj x$k") { spark.sql(q).count() }
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
        time(s"bucketjoin shuffled x$k") { spark.sql(q).count() }
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      }
    }

    // Runtime DPP under growth: star join where the dim filter selects
    // 2 of 20 partitions. With DPP the fact scan reads ~10% of files at
    // EXECUTION; disabled, it scans everything. The gap should widen
    // with the fact (the avoided work is O(table)); the probe also
    // requires the prune really fired via the introspection hook.
    if (what("dpp")) {
      val wh = java.nio.file.Files.createTempDirectory("dppprobe").toString
      spark.conf.set("spark.sql.catalog.dppcat2",
        "graft.sources.v2.TxLogCatalog")
      spark.conf.set("spark.sql.catalog.dppcat2.warehouse", wh)
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly",
        "false")
      val dimDir = java.nio.file.Files.createTempDirectory("dppdim")
        .toString
      spark.range(20).selectExpr("cast(id as int) p",
        "case when id in (3, 7) then 'hot' else 'cold' end name")
        .write.mode("overwrite").parquet(dimDir)
      spark.read.parquet(dimDir).createOrReplaceTempView("dpp_probe_dim")
      for (k <- Seq(1, 10)) {
        val n = 1000000L * k
        spark.sql(s"CREATE TABLE dppcat2.db.fact$k " +
          "(id BIGINT, pay STRING, p INT) USING txlog PARTITIONED BY (p)")
        spark.sql(s"INSERT INTO dppcat2.db.fact$k SELECT id, " +
          s"repeat(cast(id as string), 8), cast(id % 20 as int) " +
          s"FROM range($n)")
        // aggregate over the WIDE column: column pruning would otherwise
        // reduce the scan to the dictionary-coded key and hide the prune
        val q = s"""SELECT sum(length(f.pay)) FROM dppcat2.db.fact$k f
          JOIN dpp_probe_dim d ON f.p = d.p WHERE d.name = 'hot'"""
        graft.sources.v2.TxLogSpjScan.lastRuntimePrune.set((0, 0))
        time(s"dpp on x$k") { spark.sql(q).head.getLong(0) }
        val (before, after) =
          graft.sources.v2.TxLogSpjScan.lastRuntimePrune.get()
        require(before > after && after > 0,
          s"dpp probe expected a runtime prune, got $before -> $after")
        println(s"[probe] dpp x$k pruned $before -> $after files")
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
        time(s"dpp off x$k") { spark.sql(q).head.getLong(0) }
        spark.conf.set(
          "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
      }
    }

    // Recovery ops are O(manifest), not O(data): restore and clone on a
    // table holding 10× the files (and 10× the rows) should cost ~the
    // file-count-proportional metadata work only — wall time grows with
    // the LINE count, never the byte count. The probe also proves clone
    // writes zero data bytes (directory sizes: clone data dir adds only
    // hard links).
    if (what("recovery")) for (k <- Seq(10, 100)) {
      val root = java.nio.file.Files.createTempDirectory("recovprobe")
        .toString
      val t = graft.sources.TxLogTable(spark, s"$root/t")
      val n = 100000L
      (0 until k).foreach { i =>
        t.commit(spark.range(i * n, (i + 1) * n)
            .selectExpr("id", "cast(id as string) as v"),
          overwrite = false)
      }
      val good = t.latestVersion.get
      t.commit(spark.range(5).selectExpr("id", "'bad' as v"),
        overwrite = true) // the bad write to undo
      time(s"recovery restore x$k") { t.restore(good); t.fileCount().toLong }
      time(s"recovery clone x$k") {
        t.cloneTo(s"$root/clone"); 1L }
      val cloneBytes = {
        import scala.jdk.CollectionConverters._
        val d = java.nio.file.Paths.get(s"$root/clone/data")
        scala.util.Using.resource(java.nio.file.Files.walk(d)) { s =>
          s.iterator().asScala.count(java.nio.file.Files.isRegularFile(_)) }
      }
      println(s"[probe] recovery x$k: ${t.fileCount()} files restored; " +
        s"clone linked $cloneBytes files, zero bytes copied")
    }
    // BUCKET-SPEC EVOLUTION under growth: the scale hole rebucket exists
    // to close is per-bucket BYTES — a table bucketed bucket(8, k) at X
    // rows has 10× the per-bucket bytes at 10X rows, and the key-grouped
    // join plan AQE cannot skew-split then runs monster co-partitions.
    // The probe appends 10×, measures max-per-bucket bytes before and
    // after `rebucket(80)`, and requires the rewrite restores ~the
    // original per-bucket size (±2×: hash variance) while the join
    // stays zero-Exchange at the new count.
    if (what("rebucket")) {
      val wh = java.nio.file.Files.createTempDirectory("rbkprobe").toString
      spark.conf.set("spark.sql.catalog.rbkcat",
        "graft.sources.v2.TxLogCatalog")
      spark.conf.set("spark.sql.catalog.rbkcat.warehouse", wh)
      spark.sql("CREATE TABLE rbkcat.db.fact (k BIGINT, v STRING) " +
        "USING txlog PARTITIONED BY (bucket(8, k))")
      spark.sql("CREATE TABLE rbkcat.db.dim (k BIGINT, w DOUBLE) " +
        "USING txlog PARTITIONED BY (bucket(8, k))")
      val t = graft.sources.TxLogTable(spark, s"$wh/db/fact")
      def maxBucketBytes: Long =
        t.fileSizes(None).groupBy(_._1.takeWhile(_ != '/'))
          .values.map(_.map(_._2).sum).max
      val n = 1000000L
      spark.sql("INSERT INTO rbkcat.db.fact SELECT id, " +
        s"repeat(cast(id as string), 4) FROM range($n)")
      spark.sql("INSERT INTO rbkcat.db.dim SELECT id, " +
        s"CAST(id AS DOUBLE) FROM range($n)")
      val perBucket1 = maxBucketBytes
      spark.sql("INSERT INTO rbkcat.db.fact SELECT id, " +
        s"repeat(cast(id as string), 4) FROM range($n, ${10 * n})")
      val perBucket10 = maxBucketBytes
      time("rebucket 8 -> 80 at 10x") {
        spark.sql("CALL rbkcat.system.rebucket('db.fact', 80)").count() }
      val perBucketAfter = maxBucketBytes
      println(s"[probe] rebucket max-bucket-bytes: $perBucket1 @1x -> " +
        s"$perBucket10 @10x -> $perBucketAfter after rebucket(80)")
      require(perBucketAfter < perBucket10 / 4 &&
        perBucketAfter < perBucket1 * 2,
        s"rebucket must restore per-bucket bytes: $perBucketAfter vs " +
          s"$perBucket1 @1x / $perBucket10 @10x")
      // dim evolves too; the join replans zero-Exchange at the new count
      spark.sql("CALL rbkcat.system.rebucket('db.dim', 80)").count()
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = """SELECT /*+ MERGE(f) */ f.k, f.v, d.w
        FROM rbkcat.db.fact f JOIN rbkcat.db.dim d ON f.k = d.k"""
      val plan = spark.sql(q).queryExecution.executedPlan.toString
      require(!plan.contains("Exchange") && plan.contains("TxLogSpjScan"),
        s"post-rebucket join must stay shuffle-free:\n$plan")
      time("rebucket spj join at 80") { spark.sql(q).count() }

      // FILE-SIZE TARGETING: rebucket back DOWN to 8 buckets with a
      // deliberately small target — per-bucket bytes are ~10x the
      // target, so the rewrite must SPLIT each cell (salt path for this
      // unsorted table) instead of emitting one multi-GB unsplit file
      // per cell, and max per-FILE bytes must land near the target.
      val tgt = 4L * 1024 * 1024
      time("rebucket 80 -> 8 with 4MB target") {
        spark.sql("CALL rbkcat.system.rebucket('db.fact', 8, NULL, 0, " +
          s"$tgt)").count() }
      val sizes = t.fileSizes(None).map(_._2)
      println(s"[probe] rebucket file sizes after 4MB-target: " +
        s"n=${sizes.size} max=${sizes.max} avg=${sizes.sum / sizes.size}")
      require(sizes.max < 3 * tgt,
        s"rebucket must bound per-file bytes near the target: " +
          s"max=${sizes.max} vs target=$tgt")

      // SORTED table: the same target-bytes rewrite must split cells by
      // RANGE — within-file order preserved (staging sorts) and the
      // multi-file ordering report still ARMED (range-disjoint files),
      // so the post-rebucket merge join keeps zero Sort nodes.
      spark.sql("CREATE TABLE rbkcat.db.sfact (k BIGINT, v STRING) " +
        "USING txlog PARTITIONED BY (bucket(4, k)) " +
        "TBLPROPERTIES ('sortCols'='k')")
      spark.sql("CREATE TABLE rbkcat.db.sdim (k BIGINT, w DOUBLE) " +
        "USING txlog PARTITIONED BY (bucket(4, k)) " +
        "TBLPROPERTIES ('sortCols'='k')")
      spark.sql("INSERT INTO rbkcat.db.sfact SELECT id, " +
        s"repeat(cast(id as string), 4) FROM range($n) ORDER BY id")
      spark.sql("INSERT INTO rbkcat.db.sdim SELECT id, " +
        s"CAST(id AS DOUBLE) FROM range($n) ORDER BY id")
      time("sorted rebucket 4 -> 8 with 4MB target") {
        spark.sql("CALL rbkcat.system.rebucket('db.sfact', 8, NULL, 0, " +
          s"$tgt)").count() }
      spark.sql("CALL rbkcat.system.rebucket('db.sdim', 8, NULL, 0, " +
        s"$tgt)").count()
      val st = graft.sources.TxLogTable(spark, s"$wh/db/sfact")
      val ssz = st.fileSizes(None).map(_._2)
      val perDir = st.entries(None).groupBy(_.rel.takeWhile(_ != '/'))
      println(s"[probe] sorted rebucket: n=${ssz.size} files " +
        s"max=${ssz.max} multi-file dirs=" +
        perDir.count(_._2.size > 1) + "/" + perDir.size)
      require(ssz.max < 3 * tgt && perDir.values.exists(_.size > 1),
        s"sorted rebucket must range-split cells: max=${ssz.max}")
      val qs = """SELECT /*+ MERGE(f) */ f.k, f.v, d.w
        FROM rbkcat.db.sfact f JOIN rbkcat.db.sdim d ON f.k = d.k"""
      val ps = spark.sql(qs).queryExecution.executedPlan.toString
      require(!ps.contains("Exchange") && !ps.contains("Sort ") &&
        ps.contains("SortMergeJoin"),
        s"target-bytes sorted rebucket must stay armed:\n$ps")
      time("sorted rebucket armed join (multi-file, 4MB files)") {
        spark.sql(qs).count() }
    }

    // GRID bucketing under growth: the composite-key layout's two
    // independent prune levels must keep their shape as the corpus
    // grows — a full-tuple point lookup reads ~1/(n1·n2) of the files
    // and HALF the tuple still reads ~1/n2, at 1M and 10M rows alike
    // (the file-set fraction is the at-scale claim; each level is a
    // manifest-only decision).
    if (what("grid")) {
      val wh = java.nio.file.Files.createTempDirectory("gridprobe")
        .toString
      spark.conf.set("spark.sql.catalog.gridcat",
        "graft.sources.v2.TxLogCatalog")
      spark.conf.set("spark.sql.catalog.gridcat.warehouse", wh)
      for (k <- Seq(1, 10)) {
        val n = 1000000L * k
        spark.sql(s"CREATE TABLE gridcat.db.g$k (t BIGINT, e BIGINT, " +
          "v STRING) USING txlog " +
          "PARTITIONED BY (bucket(8, t), bucket(8, e))")
        time(s"grid insert x$k") {
          spark.sql(s"INSERT INTO gridcat.db.g$k SELECT id % 1000, id, " +
            s"cast(id as string) FROM range($n)")
          n
        }
        val t = graft.sources.TxLogTable(spark, s"$wh/db/g$k")
        val all = t.entries(None).size
        import org.apache.spark.sql.functions.col
        val full = t.candidateFilesWhere(
          col("t") === 7L && col("e") === 7007L).size
        val half = t.candidateFilesWhere(col("e") === 7007L).size
        println(s"[probe] grid x$k files=$all full-tuple=$full " +
          s"(~1/64 = ${all / 64}) half-tuple=$half (~1/8 = ${all / 8})")
        require(full <= math.max(1, all / 32) &&
          half <= math.max(1, all / 4),
          s"grid prune shape lost at x$k: $all/$full/$half")
        // the pruned point lookup answers exactly
        require(spark.sql(s"SELECT count(*) FROM gridcat.db.g$k " +
          "WHERE t = 7 AND e = 7007").head.getLong(0) == 1L)
      }
    }

    // SORTED bucket layout under growth: after compaction the SPJ scan
    // reports its declared ordering and the merge join drops BOTH Sort
    // nodes (in-probe require). The avoided work is an O(n log n)
    // per-partition sort of each side on every join — measured against
    // the unsorted twin at 1M and 10M rows; the at-scale claim is the
    // plan shape (a 100 TB side never sorts), local wall quantifies the
    // local share.
    if (what("sortedjoin")) {
      val wh = java.nio.file.Files.createTempDirectory("sortprobe")
        .toString
      spark.conf.set("spark.sql.catalog.srtcat",
        "graft.sources.v2.TxLogCatalog")
      spark.conf.set("spark.sql.catalog.srtcat.warehouse", wh)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      for (k <- Seq(1, 10)) {
        val n = 1000000L * k
        for ((suffix, props) <- Seq(
          ("s", " TBLPROPERTIES ('sortCols'='k')"), ("u", ""))) {
          spark.sql(s"CREATE TABLE srtcat.db.a$suffix$k (k BIGINT, " +
            "v STRING) USING txlog PARTITIONED BY (bucket(16, k))" + props)
          spark.sql(s"CREATE TABLE srtcat.db.b$suffix$k (k BIGINT, " +
            "w STRING) USING txlog PARTITIONED BY (bucket(16, k))" + props)
          spark.sql(s"INSERT INTO srtcat.db.a$suffix$k SELECT id, " +
            s"cast(id as string) FROM range($n)")
          spark.sql(s"INSERT INTO srtcat.db.b$suffix$k SELECT id, " +
            s"cast(id as string) FROM range(0, $n, 2)")
          spark.sql(s"CALL srtcat.system.compact('db.a$suffix$k', 1)")
          spark.sql(s"CALL srtcat.system.compact('db.b$suffix$k', 1)")
        }
        val qs = s"""SELECT /*+ MERGE(a) */ a.k, a.v, b.w
          FROM srtcat.db.as$k a JOIN srtcat.db.bs$k b ON a.k = b.k"""
        val qu = s"""SELECT /*+ MERGE(a) */ a.k, a.v, b.w
          FROM srtcat.db.au$k a JOIN srtcat.db.bu$k b ON a.k = b.k"""
        val ps = spark.sql(qs).queryExecution.executedPlan.toString
        require(!ps.contains("Exchange") && !ps.contains("Sort ") &&
          ps.contains("SortMergeJoin"),
          s"sorted probe join must be Sort- and Exchange-free:\n$ps")
        val pu = spark.sql(qu).queryExecution.executedPlan.toString
        require(!pu.contains("Exchange") && pu.contains("Sort "),
          s"unsorted twin must keep its Sorts:\n$pu")
        time(s"sortedjoin sorted x$k") { spark.sql(qs).count() }
        time(s"sortedjoin unsorted x$k") { spark.sql(qu).count() }

        // MULTI-FILE arming at scale: the same sorted pair built from
        // TWO range-disjoint ORDER-BY'd appends and NEVER compacted —
        // the ordering must arm from manifest range-disjointness alone
        // and the Sort-free plan shape must hold at 1x and 10x alike
        for (suffix <- Seq("m")) {
          spark.sql(s"CREATE TABLE srtcat.db.a$suffix$k (k BIGINT, " +
            "v STRING) USING txlog PARTITIONED BY (bucket(16, k)) " +
            "TBLPROPERTIES ('sortCols'='k')")
          spark.sql(s"CREATE TABLE srtcat.db.b$suffix$k (k BIGINT, " +
            "w STRING) USING txlog PARTITIONED BY (bucket(16, k)) " +
            "TBLPROPERTIES ('sortCols'='k')")
          for (half <- 0 to 1) {
            spark.sql(s"INSERT INTO srtcat.db.a$suffix$k SELECT id, " +
              s"cast(id as string) FROM range(${half * n / 2}, " +
              s"${(half + 1) * n / 2}) ORDER BY id")
            spark.sql(s"INSERT INTO srtcat.db.b$suffix$k SELECT id, " +
              s"cast(id as string) FROM range(${half * n / 2}, " +
              s"${(half + 1) * n / 2}, 2) ORDER BY id")
          }
          val t = graft.sources.TxLogTable(spark, s"$wh/db/a$suffix$k")
          val perDir = t.entries(None).groupBy(_.rel.takeWhile(_ != '/'))
          require(perDir.values.exists(_.size > 1),
            s"multi-file probe table must be multi-file: " +
              perDir.view.mapValues(_.size).toMap)
          val qm = s"""SELECT /*+ MERGE(a) */ a.k, a.v, b.w
            FROM srtcat.db.a$suffix$k a
            JOIN srtcat.db.b$suffix$k b ON a.k = b.k"""
          val pm = spark.sql(qm).queryExecution.executedPlan.toString
          require(!pm.contains("Exchange") && !pm.contains("Sort ") &&
            pm.contains("SortMergeJoin"),
            s"multi-file sorted join must arm without compacting at " +
              s"x$k:\n$pm")
          time(s"sortedjoin multifile-armed x$k (no compact)") {
            spark.sql(qm).count() }
        }
      }
    }

    // SKEW in key-grouped joins: KeyGroupedPartitioning is exactly the
    // plan shape AQE's skew-join splitting does not touch (OptimizeSkewedJoin
    // rewrites ShuffleQueryStage reads — an SPJ has none), so a hot key
    // concentrates a co-partition on one task. Three measured handles:
    //  (a) the bucketed SPJ as-is (zero Exchange, hot bucket = one task);
    //  (b) partially-clustered distribution ON — Spark keeps the larger
    //      side's per-split input partitions UNGROUPED and replicates the
    //      smaller side's matching partitions, so the hot bucket fans out
    //      across tasks while the plan stays Exchange-free;
    //  (c) the shuffled join with AQE skew handling (bucketing off) —
    //      the baseline that pays two full shuffles for its balance.
    // The probe prints all three; (b) must plan zero Exchanges and beat
    // (a) on a hot-key corpus — that conf is the documented mitigation.
    if (what("spjskew")) {
      val wh = java.nio.file.Files.createTempDirectory("skewprobe").toString
      spark.conf.set("spark.sql.catalog.skewcat",
        "graft.sources.v2.TxLogCatalog")
      spark.conf.set("spark.sql.catalog.skewcat.warehouse", wh)
      spark.sql("CREATE TABLE skewcat.db.fact (k BIGINT, v STRING) " +
        "USING txlog PARTITIONED BY (bucket(8, k))")
      spark.sql("CREATE TABLE skewcat.db.dim (k BIGINT, w DOUBLE) " +
        "USING txlog PARTITIONED BY (bucket(8, k))")
      val n = 2000000L
      // uniform base + a 100×-hot key 7: one bucket carries ~half the rows
      spark.sql("INSERT INTO skewcat.db.fact " +
        s"SELECT id % 100000, repeat(cast(id as string), 4) " +
        s"FROM range($n)")
      spark.sql("INSERT INTO skewcat.db.fact " +
        s"SELECT 7, repeat(cast(id as string), 4) FROM range($n)")
      spark.sql("INSERT INTO skewcat.db.dim " +
        "SELECT id, CAST(id AS DOUBLE) FROM range(100000)")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = """SELECT /*+ MERGE(f) */ sum(length(f.v) * d.w)
        FROM skewcat.db.fact f JOIN skewcat.db.dim d ON f.k = d.k"""
      val pc =
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution" +
          ".enabled"
      // the scalar SUM needs its one Exchange SinglePartition gather; the
      // JOIN itself must stay shuffle-free (exactly that one Exchange)
      def joinShuffleFree(plan: String): Boolean =
        plan.split("Exchange").length - 1 == 1 &&
          plan.contains("Exchange SinglePartition") &&
          plan.contains("TxLogSpjScan")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set(pc, "false")
      val planA = spark.sql(q).queryExecution.executedPlan.toString
      require(joinShuffleFree(planA),
        s"skew probe (a) must be the zero-shuffle SPJ:\n$planA")
      time("spjskew grouped (hot bucket = 1 task)") {
        spark.sql(q).head.getDouble(0).toLong }
      spark.conf.set(pc, "true")
      val planB = spark.sql(q).queryExecution.executedPlan.toString
      require(joinShuffleFree(planB),
        s"skew probe (b) must keep the join Exchange-free:\n$planB")
      time("spjskew partially-clustered (hot bucket fans out)") {
        spark.sql(q).head.getDouble(0).toLong }
      spark.conf.set(pc, "false")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      time("spjskew shuffled + AQE skew join") {
        spark.sql(q).head.getDouble(0).toLong }
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    }

    // NDV maintenance cost under table growth: the commit-path fold
    // sketches only the BATCH's staged files, so appending with ndvCols
    // declared must cost ~the same at 1x and 10x table size (the
    // O(delta) claim); CALL analyze is the documented O(table) pass —
    // both printed, honestly.
    if (what("ndv")) {
      val wh = java.nio.file.Files.createTempDirectory("ndvprobe").toString
      spark.conf.set("spark.sql.catalog.ndvcat2",
        "graft.sources.v2.TxLogCatalog")
      spark.conf.set("spark.sql.catalog.ndvcat2.warehouse", wh)
      for ((t, props) <- Seq(
          ("tn", " TBLPROPERTIES ('ndvCols'='cat')"), ("tp", "")))
        spark.sql(s"CREATE TABLE ndvcat2.db.$t (k BIGINT, cat BIGINT, " +
          s"v STRING) USING txlog PARTITIONED BY (bucket(8, k))$props")
      def grow(t: String, from: Long, to: Long): Unit =
        spark.sql(s"INSERT INTO ndvcat2.db.$t SELECT id, id % 50000, " +
          s"repeat(cast(id as string), 4) FROM range($from, $to)")
      def appendSec(t: String): Double = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        grow(t, 20000000L + i * 10000, 20000000L + (i + 1) * 10000)
        (System.nanoTime() - t0) / 1e9
      }.min
      grow("tn", 0, 1000000); grow("tp", 0, 1000000)
      val (n1, p1) = (appendSec("tn"), appendSec("tp"))
      grow("tn", 1000000, 10000000); grow("tp", 1000000, 10000000)
      val (n10, p10) = (appendSec("tn"), appendSec("tp"))
      println(f"[probe] ndv 10k-append: 1x plain $p1%.2f s vs ndv $n1%.2f" +
        f" s; 10x plain $p10%.2f s vs ndv $n10%.2f s " +
        f"(fold overhead ${n1 - p1}%.2f -> ${n10 - p10}%.2f s)")
      require(n10 - p10 < math.max((n1 - p1) * 4, 1.0),
        s"ndv fold overhead must stay delta-bound: " +
          s"${n1 - p1} @1x -> ${n10 - p10} @10x")
      val a0 = System.nanoTime()
      spark.sql("CALL ndvcat2.system.analyze('db.tp', 'cat')").count()
      println(f"[probe] ndv analyze at 10x: " +
        f"${(System.nanoTime() - a0) / 1e9}%.1f s (O(table), by design)")
      val est = graft.sources.TxLogTable(spark, s"$wh/db/tn")
      val e = est.ndvOf(est.latestVersion.get)("cat")
      require(e > 25000 && e < 100000, s"ndv(cat) estimate off: $e")
      println(s"[probe] ndv(cat) estimate $e (true 50000, KMV k=64)")
    }

    // SORTED layout × skew — the conflict the two contracts create:
    // the reported ordering is a per-task whole-files-in-range-order
    // guarantee, so an ARMED sorted scan emits exactly ONE task per
    // bucket dir and neither byte-splitting nor partially-clustered
    // per-split fan-out can touch a hot bucket (there are no splits to
    // fan). The probe makes bucket skew the REBUCKETABLE way — many
    // moderately-hot KEYS colliding into one of 4 buckets (a single
    // 100× key is unfixable by any layout; its ceiling is one task's
    // throughput in every engine) — and measures the three handles:
    //  (a) armed sorted SPJ as-is: hot bucket = one task, Sort-free;
    //  (b) partially-clustered ON: documented NO-OP here — nothing
    //      fans out when each dir is already one input partition;
    //  (c) CALL system.rebucket both sides to 16: the colliding keys
    //      re-spread, the rewrite re-arms trivially (one sorted file
    //      per bucket), and the join is balanced again, still with
    //      zero Sort and zero Exchange.
    // Conclusion the probe prints: for sorted tables, REBUCKET (spec
    // evolution) is the skew mitigation; the split-based handles are
    // traded away by the ordering contract, by design.
    if (what("sortedskew")) {
      val wh = java.nio.file.Files.createTempDirectory("sskprobe").toString
      spark.conf.set("spark.sql.catalog.sskcat",
        "graft.sources.v2.TxLogCatalog")
      spark.conf.set("spark.sql.catalog.sskcat.warehouse", wh)
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.sql("CREATE TABLE sskcat.db.sfact (k BIGINT, v STRING) " +
        "USING txlog PARTITIONED BY (bucket(4, k)) " +
        "TBLPROPERTIES ('sortCols'='k')")
      spark.sql("CREATE TABLE sskcat.db.sdim (k BIGINT, w DOUBLE) " +
        "USING txlog PARTITIONED BY (bucket(4, k)) " +
        "TBLPROPERTIES ('sortCols'='k')")
      // 16 keys that COLLIDE into bucket 0 of 4 (exact engine hash) but
      // spread under 16 — the multi-key hot bucket rebucket exists for
      val hotKeys = spark.range(0, 100000).toDF("id")
        .filter(graft.sources.TxLogTable.bucketIdCol("id", 4) === 0)
        .limit(16).collect().map(_.getLong(0))
      val hotArr = s"array(${hotKeys.mkString(",")})"
      val n = 2000000L
      // ONE insert, globally ORDER BY k — the sorted-ingest shape: the
      // write's range shuffle hands each staging task a contiguous key
      // slice, so every bucket dir's files are range-disjoint (boundary
      // ties from the hot keys allowed: single exact sort col) and the
      // ordering arms WITHOUT a compact
      spark.sql(s"""INSERT INTO sskcat.db.sfact
        SELECT * FROM (
          SELECT id % 100000 AS k, repeat(cast(id as string), 4) AS v
          FROM range($n)
          UNION ALL
          SELECT element_at($hotArr, cast(id % 16 + 1 AS INT)) AS k,
                 repeat(cast(id as string), 4) AS v
          FROM range($n))
        ORDER BY k""")
      spark.sql("INSERT INTO sskcat.db.sdim " +
        "SELECT id, CAST(id AS DOUBLE) FROM range(100000)")
      val q = """SELECT /*+ MERGE(f) */ sum(length(f.v) * d.w)
        FROM sskcat.db.sfact f JOIN sskcat.db.sdim d ON f.k = d.k"""
      def joinShuffleFree(plan: String): Boolean =
        plan.split("Exchange").length - 1 == 1 &&
          plan.contains("Exchange SinglePartition") &&
          plan.contains("TxLogSpjScan")
      val pc =
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution" +
          ".enabled"
      spark.conf.set(pc, "false")
      val planA = spark.sql(q).queryExecution.executedPlan.toString
      require(joinShuffleFree(planA) && !planA.contains("Sort "),
        s"sorted skew probe (a) must be the armed zero-shuffle SPJ:\n$planA")
      time("sortedskew armed grouped (hot bucket = 1 task)") {
        spark.sql(q).head.getDouble(0).toLong }
      spark.conf.set(pc, "true")
      time("sortedskew partially-clustered (NO-OP: 1 partition/dir)") {
        spark.sql(q).head.getDouble(0).toLong }
      spark.conf.set(pc, "false")
      spark.sql("CALL sskcat.system.rebucket('db.sfact', 16)")
      spark.sql("CALL sskcat.system.rebucket('db.sdim', 16)")
      val planC = spark.sql(q).queryExecution.executedPlan.toString
      require(joinShuffleFree(planC) && !planC.contains("Sort "),
        s"post-rebucket join must stay armed and shuffle-free:\n$planC")
      time("sortedskew rebucket(16) re-spread (still Sort-free)") {
        spark.sql(q).head.getDouble(0).toLong }
      println("[probe] sortedskew: partially-clustered cannot fan out an " +
        "armed sorted scan (ordering = one whole-dir task); rebucket is " +
        "the sorted layout's skew mitigation")
    }

    // Change-feed catch-up under a LONG version backlog: the same total
    // byte volume committed as 50 vs 500 versions, then one batch CDC
    // read over the whole range. Two properties at stake:
    //  - plan width is INDEPENDENT of backlog length (one scan leaf +
    //    one broadcast version map — not one scan per version chained
    //    by union: that alternative plans a 500-leaf tree whose driver
    //    planning and codegen cost grow with backlog LENGTH), and
    //  - catch-up wall time scales with BYTES, not version count: the
    //    500-version read of the same data lands within noise of the
    //    50-version read.
    if (what("cdc")) {
      val results = scala.collection.mutable.Map.empty[Int, (Int, Double)]
      for (k <- Seq(50, 500)) {
        val root = java.nio.file.Files.createTempDirectory("cdcprobe")
          .resolve("t").toString
        val t = graft.sources.TxLogTable(spark, root)
        val schema = org.apache.spark.sql.types.StructType.fromDDL(
          "id BIGINT, v STRING")
        val total = 1000000L
        val per = total / k
        time(s"cdc backlog build x$k") {
          (0 until k).foreach { i =>
            t.commit(spark.range(i * per, (i + 1) * per)
                .selectExpr("id", "cast(id as string) as v"),
              overwrite = false)
          }; k.toLong
        }
        val top = t.latestVersion.get
        val feed = t.changesBetween(schema, -1, top)
        val nLeaves = feed.queryExecution.executedPlan.collectLeaves().length
        val t0 = System.nanoTime()
        val n = feed.count()
        val secs = (System.nanoTime() - t0) / 1e9
        require(n == total, s"cdc x$k: $n rows, expected $total")
        require(feed.select("_commit_version").distinct().count() == k,
          s"cdc x$k: every version must tag its own files")
        println(f"[probe] cdc catch-up x$k versions: $secs%.1f s, " +
          s"$nLeaves plan leaves")
        results(k) = (nLeaves, secs)
      }
      val (l50, s50) = results(50); val (l500, s500) = results(500)
      require(l500 == l50,
        s"plan leaves grew with backlog: $l50 -> $l500")
      println(f"[probe] cdc: leaves $l50=$l500 (backlog-independent); " +
        f"wall ${s500 / s50}%.2fx for 10x the versions at equal bytes")
    }

    // ANN AUTO-BUILD TRAINS ON THE SAMPLE, NOT THE CORPUS (r17): grow
    // the vector corpus 10× and the k-means TRAINING INPUT must stay
    // pinned at ~trainSample rows (the stride widens instead), while k
    // scales with the corpus (cell size is the invariant) — that input
    // bound is the asserted claim. The full-corpus trainer runs at the
    // same derived k for comparison: at probe SF (20k vectors) both are
    // job-overhead-bound so wall-clock is informational; the structural
    // difference is the trainer's per-iteration input (253 rows vs
    // 20 000 — 79×), which is what a billion-vector corpus amplifies.
    if (what("annauto")) {
      val embBase = spark.read
        .parquet("/root/testdata/sf0.1/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      def corpusOf(k: Int): DataFrame = (0 until k).map(i =>
        embBase.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
        .reduce(_.unionByName(_))
      val results = scala.collection.mutable.Map.empty[Int, (Long, Double)]
      for (k <- Seq(1, 10)) {
        val dir = java.nio.file.Files.createTempDirectory(s"annauto$k")
        val corpusRoot = dir.resolve("corpus").toString
        val c = graft.sources.TxLogTable(spark, corpusRoot)
        val emb = corpusOf(k)
        c.commit(emb, overwrite = true)
        val rows = emb.count()
        val stride = math.max(1L, (rows + 255L) / 256L)
        val trainRows = emb
          .filter(pmod(col("vec_id"), lit(stride)) === 0).count()
        val t0 = System.nanoTime()
        val (_, autoK) = graft.operators.AnnIndex.buildAuto(spark,
          corpusRoot, dir.resolve("index").toString, emb.schema,
          iterations = 2, targetCell = 250L, trainSample = 256L,
          pq = false)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[probe] annauto x$k: $rows rows -> k=$autoK, " +
          f"train=$trainRows rows (stride $stride), build $secs%.1f s")
        results(k) = (trainRows, secs)
      }
      val (tr1, _) = results(1); val (tr10, s10) = results(10)
      // ceil-division stride overshoots by at most rows/stride² extra
      // sampled ids — the bound is the SAMPLE, never the corpus
      require(tr1 <= 260 && tr10 <= 260,
        s"training input must stay sample-bounded: $tr1 -> $tr10")
      // the old full-corpus trainer at the same derived k, 10× corpus
      locally {
        val dir = java.nio.file.Files.createTempDirectory("annfull10")
        val corpusRoot = dir.resolve("corpus").toString
        val emb = corpusOf(10)
        graft.sources.TxLogTable(spark, corpusRoot)
          .commit(emb, overwrite = true)
        val rows = emb.count()
        val kFull = ((rows + 249L) / 250L).toInt
        val t0 = System.nanoTime()
        graft.operators.AnnIndex.build(spark, corpusRoot,
          dir.resolve("index").toString, emb.schema, k = kFull,
          iterations = 2, pq = false)
        val sFull = (System.nanoTime() - t0) / 1e9
        println(f"[probe] annauto: full-corpus trainer x10 $sFull%.1f s " +
          f"(input $rows rows/iter) vs sampled $s10%.1f s " +
          f"(input ${results(10)._1} rows/iter)")
      }
    }
    spark.stop()
  }
}
