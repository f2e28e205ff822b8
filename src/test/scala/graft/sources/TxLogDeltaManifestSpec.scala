package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Delta manifests (O(delta) commit metadata): small commits publish a
  * `#delta=` manifest against their base, a self-contained CHECKPOINT is
  * written at the chain-interval boundary (or whenever the delta encoding
  * would not be smaller), readers resolve chains transparently, vacuum
  * materializes the oldest survivor before dropping its chain, and the
  * `#minReader=` gate refuses layouts this reader does not understand.
  */
class TxLogDeltaManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def fresh(): TxLogTable =
    TxLogTable(spark,
      Files.createTempDirectory("txdelta").resolve("t").toString)

  private def rows(t: TxLogTable, version: Option[Int] = None)
      : Set[(Long, String)] =
    t.snapshot(schema, version).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def rawManifest(t: TxLogTable, v: Int): String =
    new String(Files.readAllBytes(
      Paths.get(t.root, "_log", f"v$v%08d.manifest")), UTF_8)

  private def isDelta(t: TxLogTable, v: Int): Boolean =
    rawManifest(t, v).linesIterator.exists(_.startsWith("#delta="))

  test("appends publish deltas; every version resolves exactly; " +
    "checkpoint lands at the interval boundary") {
    val t = fresh()
    val expect = scala.collection.mutable.Map.empty[Int, Set[(Long, String)]]
    var acc = Set.empty[(Long, String)]
    (0 until 14).foreach { i =>
      val v = t.commit(Seq((i.toLong, s"r$i")).toDF("id", "v"),
        overwrite = i == 0)
      acc += ((i.toLong, s"r$i"))
      expect(v) = acc
    }
    // v0 is always full; the chain checkpoints before reaching the
    // default interval (10), so among v1..v13 there must be at least one
    // full manifest and many deltas
    assert(!isDelta(t, 0))
    val deltas = (1 to 13).count(isDelta(t, _))
    val fulls = (1 to 13).count(v => !isDelta(t, v))
    assert(deltas >= 10, s"expected mostly delta commits, got $deltas")
    assert(fulls >= 1, s"chain must checkpoint within the interval")
    // time travel is exact at EVERY version, including across the
    // checkpoint boundary
    expect.foreach { case (v, want) => assert(rows(t, Some(v)) == want) }
    // commit metadata is O(delta): a delta manifest stays small while
    // the table's full line list grows with file count
    val lastDelta = (1 to 13).filter(isDelta(t, _)).max
    val full = (1 to 13).filter(v => !isDelta(t, v)).max
    assert(rawManifest(t, lastDelta).length <
      rawManifest(t, full).length / 2,
      "delta commit bytes must undercut a checkpoint's")
  }

  test("COW delete flows through #rm= removals and stays exact") {
    val t = fresh()
    t.commit((0L until 40L).map(i => (i, s"v$i")).toDF("id", "v"),
      overwrite = true)
    (0 until 3).foreach { i => // push past v0 so the delete is a delta
      t.commit(Seq((100L + i, "x")).toDF("id", "v"), overwrite = false)
    }
    val v = t.deleteWhere(schema, org.apache.spark.sql.functions
      .col("id") < 10L).version
    assert(isDelta(t, v), "a row-level delete is a small file-set change")
    assert(rawManifest(t, v).linesIterator.exists(_.startsWith("#rm=")),
      "the rewritten file must be removed via #rm=")
    assert(rows(t).map(_._1).forall(id => id >= 10L))
    assert(rows(t).size == 33)
  }

  test("overwrite and whole-table compaction checkpoint for free") {
    val t = fresh()
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    (0 until 4).foreach(i =>
      t.commit(Seq((10L + i, "b")).toDF("id", "v"), overwrite = false))
    val ow = t.commit(Seq((7L, "z")).toDF("id", "v"), overwrite = true)
    assert(!isDelta(t, ow),
      "an overwrite removes every base file — the delta encoding loses " +
        "the size race and the commit self-contains")
    (0 until 4).foreach(i =>
      t.commit(Seq((20L + i, "c")).toDF("id", "v"), overwrite = false))
    val cp = t.compact(schema)
    assert(!isDelta(t, cp), "a full compaction rewrites every file")
    assert(rows(t).map(_._1) == Set(7L, 20L, 21L, 22L, 23L))
  }

  test("vacuum materializes the oldest survivor, then drops the full " +
    "prefix: delta chains never extend retention") {
    val t = fresh()
    (0 until 8).foreach(i =>
      t.commit(Seq((i.toLong, s"r$i")).toDF("id", "v"), overwrite = i == 0))
    val latest = t.latestVersion.get
    assert(isDelta(t, latest))
    val (droppedM, _) = t.vacuum(keep = 1, minAgeMillis = 0,
      retainMillis = 0)
    // keep=1 reclaims everything below latest, exactly as pre-delta:
    // the survivor was checkpointed in place first
    assert(droppedM == latest && t.versions == Seq(latest))
    assert(!isDelta(t, latest),
      "the survivor must have been materialized to self-contained form")
    assert(rows(t, Some(latest)) == (0 to latest).map(i =>
      (i.toLong, s"r$i")).toSet)
    // and the table keeps working: further commits delta against the
    // materialized survivor
    t.commit(Seq((99L, "post")).toDF("id", "v"), overwrite = false)
    assert(rows(t).contains((99L, "post")))
  }

  test("restore republishes a delta version's RESOLVED content") {
    val t = fresh()
    (0 until 5).foreach(i =>
      t.commit(Seq((i.toLong, s"r$i")).toDF("id", "v"), overwrite = i == 0))
    assert(isDelta(t, 3))
    val rv = t.restore(3)
    assert(rows(t) == (0 to 3).map(i => (i.toLong, s"r$i")).toSet)
    // the restored manifest must carry no delta machinery pointing at the
    // RESTORED version's chain — resolution strips it before republish
    // (it may itself be delta-encoded against ITS base, v4)
    val raw = rawManifest(t, rv)
    raw.linesIterator.filter(_.startsWith("#delta=")).foreach { l =>
      assert(l == s"#delta=4", s"restore's own delta must target its " +
        s"immediate base, got $l")
    }
  }

  test("CDC changesBetween stays exact across delta manifests") {
    val t = fresh()
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    (0 until 4).foreach(i =>
      t.commit(Seq((10L + i, s"b$i")).toDF("id", "v"), overwrite = false))
    assert((1 to 4).forall(isDelta(t, _)))
    val got = t.changesBetween(schema, 2, 4).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((12L, "b2"), (13L, "b3")))
  }

  test("logCheckpointInterval=1 disables deltas entirely") {
    spark.conf.set("spark.graft.sql.logCheckpointInterval", "1")
    try {
      val t = fresh()
      (0 until 5).foreach(i =>
        t.commit(Seq((i.toLong, "x")).toDF("id", "v"), overwrite = i == 0))
      (0 to 4).foreach(v => assert(!isDelta(t, v)))
    } finally spark.conf.unset("spark.graft.sql.logCheckpointInterval")
  }

  test("#minReader above this reader's version is refused loudly") {
    val t = fresh()
    t.commit(Seq((1L, "a")).toDF("id", "v"), overwrite = true)
    val log = Paths.get(t.root, "_log")
    Files.write(log.resolve(f"v${1}%08d.manifest"),
      "#minReader=99\n#futureLayout=zstd-manifest\n".getBytes(UTF_8),
      StandardOpenOption.CREATE_NEW)
    val e = intercept[IllegalStateException](rows(t))
    assert(e.getMessage.contains("reader version 99"))
    assert(e.getMessage.contains(
      s"supports ${TxLogTable.SupportedReaderVersion}"))
  }

  test("metadata-only commits (schema evolution) are near-empty deltas") {
    val t = fresh()
    t.commit((0L until 30L).map(i => (i, s"v$i")).toDF("id", "v"),
      overwrite = true)
    // catalog-created tables record #schema; emulate via create-path:
    val t2 = TxLogTable(spark,
      Files.createTempDirectory("txdelta").resolve("t2").toString)
    t2.create(schema)
    t2.commit((0L until 30L).map(i => (i, s"v$i")).toDF("id", "v"),
      overwrite = false)
    val v = t2.addColumn("w", IntegerType)
    assert(isDelta(t2, v), "an ALTER adds/removes no files")
    assert(!rawManifest(t2, v).linesIterator.exists(l =>
      !l.startsWith("#")), "zero data lines in the delta")
    assert(rawManifest(t2, v).length < rawManifest(t2, 1).length,
      "the ALTER's commit bytes must not pay the file list")
  }
}
