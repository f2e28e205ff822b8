package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Model-based property test for the transaction-log table: a random
  * interleaving of append / overwrite / compact / vacuum must agree with a
  * trivial in-memory model at every step — current snapshot (multiset),
  * surviving version ids, and time travel to every surviving version.
  * The hand-written TxLogTableSpec covers each operation's contract; this
  * covers their COMPOSITIONS (compact-then-append, vacuum-after-compact,
  * overwrite-after-vacuum, ...) far beyond the enumerated matrix.
  */
class TxLogPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private sealed trait Op
  private case class Append(rows: List[(Long, String)]) extends Op
  private case class Overwrite(rows: List[(Long, String)]) extends Op
  private case class Merge(rows: List[(Long, String)]) extends Op
  private case class MergeStr(rows: List[(Long, String)]) extends Op
  private case class Replace(rows: List[(Long, String)]) extends Op
  private case class Delete(ids: List[Long]) extends Op
  private case class DeletePos(ids: List[Long]) extends Op  // DV mask
  private case class UpdatePos(ids: List[Long]) extends Op  // DV update
  private case object Compact extends Op
  private case object ZOrder extends Op
  private case class Vacuum(keep: Int) extends Op
  private case class Pin(back: Int) extends Op   // register change-feed cursor
  private case object Unpin extends Op           // release it
  private case class TagAt(back: Int) extends Op // immutable named ref
  private case object DropTag extends Op         // release the ref
  private case class Rebucket(n: Int) extends Op
  private case class GridRebucket(n1: Int, n2: Int) extends Op

  private val rowsGen: Gen[List[(Long, String)]] =
    Gen.resize(3, Gen.nonEmptyListOf(for {
      id <- Gen.choose(1L, 5L)
      s <- Gen.oneOf("a", "b", "c")
    } yield (id, s)))

  private val opGen: Gen[Op] = Gen.frequency(
    4 -> rowsGen.map(Append),
    2 -> rowsGen.map(Overwrite),
    3 -> rowsGen.map(Merge),
    2 -> rowsGen.map(MergeStr),
    2 -> rowsGen.map(Replace),
    2 -> Gen.resize(3, Gen.nonEmptyListOf(Gen.choose(1L, 6L))).map(Delete),
    2 -> Gen.resize(3, Gen.nonEmptyListOf(Gen.choose(1L, 6L)))
      .map(DeletePos),
    2 -> Gen.resize(3, Gen.nonEmptyListOf(Gen.choose(1L, 6L)))
      .map(UpdatePos),
    1 -> Gen.const(Compact),
    1 -> Gen.const(ZOrder),
    1 -> Gen.choose(1, 3).map(Vacuum),
    1 -> Gen.choose(0, 2).map(Pin),
    1 -> Gen.const(Unpin),
    1 -> Gen.choose(0, 2).map(TagAt),
    1 -> Gen.const(DropTag))

  // first op must create the table
  private val programGen: Gen[List[Op]] = for {
    head <- rowsGen.map(Overwrite)
    tail <- Gen.resize(9, Gen.listOf(opGen))
  } yield head :: tail

  private def forAllSeeded[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default.withSize(9), Seed(1000L + i)))
    }

  private def snapRows(t: TxLogTable, v: Option[Int]): List[(Long, String)] =
    t.snapshot(schema, v).collect()
      .map(r => (r.getLong(0), r.getString(1))).toList.sorted

  test("bucketed interleavings: hidden layout survives every op sequence") {
    // the bucket-layout invariant under random compositions of append /
    // overwrite / keyed merge / delete / compact / vacuum / REBUCKET:
    // every data file stays under the layout's _bkt dir(s) (the staging
    // chokepoint derives the ids on EVERY path, under whatever spec is
    // current) and the visible rows always match the in-memory model —
    // layout maintenance and spec evolution can never cost correctness.
    // Runs over BOTH layout shapes: the single bucket level and the
    // two-level composite-key GRID (rebucket targets the grid's second
    // level by key).
    val bucketOpGen: Gen[Op] = Gen.frequency(
      4 -> rowsGen.map(Append),
      2 -> rowsGen.map(Overwrite),
      3 -> rowsGen.map(Merge),
      2 -> Gen.resize(3, Gen.nonEmptyListOf(Gen.choose(1L, 6L)))
        .map(Delete),
      1 -> Gen.const(Compact),
      1 -> Gen.oneOf(2, 3, 8).map(Rebucket),
      1 -> Gen.zip(Gen.oneOf(2, 3), Gen.oneOf(2, 4))
        .map { case (a, b) => GridRebucket(a, b) },
      1 -> Gen.choose(1, 3).map(Vacuum))
    val programGenB: Gen[List[Op]] = Gen.resize(8, Gen.listOf(bucketOpGen))
    val layouts = Seq(
      (Seq(("id", 4)), Seq(TxLogTable.BucketCol)),
      (Seq(("id", 2), ("v", 2)),
        Seq(TxLogTable.bucketColAt(0), TxLogTable.bucketColAt(1))))
    for ((specs, layout) <- layouts)
    forAllSeeded(programGenB, n = 4) { program =>
      val t = TxLogTable(spark,
        Files.createTempDirectory("txpropb").resolve("t").toString)
      t.create(schema, partitionCols = layout, bucketSpecs = specs,
        ndvCols = Seq("id"))
      // a grid rebucket needs its target level named: evolve the LAST
      val rbKey = if (specs.length > 1) Some(specs.last._1) else None
      var model = List.empty[(Long, String)]
      program.foreach { op =>
        op match {
          case Append(rows) =>
            t.commit(rows.toDF("id", "v"), overwrite = false,
              partitionCols = layout)
            model = model ++ rows
          case Overwrite(rows) =>
            t.commit(rows.toDF("id", "v"), overwrite = true,
              partitionCols = layout)
            model = rows
          case Merge(rows) =>
            t.merge(schema, rows.toDF("id", "v"), Seq("id"))
            val ids = rows.map(_._1).toSet
            model = model.filterNot(r => ids(r._1)) ++ rows
          case Delete(ids) =>
            t.deleteWhere(schema,
              org.apache.spark.sql.functions.col("id").isin(ids: _*))
            model = model.filterNot(r => ids.contains(r._1))
          case Compact => t.compact(schema, 2)
          case Rebucket(n) => t.rebucket(schema, n, rbKey)
          case GridRebucket(n1, n2) =>
            // both levels in ONE rewrite — must be exactly one version
            val v0 = t.latestVersion.get
            if (specs.length > 1)
              t.rebucket(schema, n1, Some(specs.head._1),
                alsoKeys = Seq(specs.last._1 -> n2))
            else t.rebucket(schema, n1)
            assert(t.latestVersion.get == v0 + 1,
              s"grid rebucket must bump exactly one version from $v0")
          case Vacuum(keep) =>
            t.vacuum(keep, minAgeMillis = 0, retainMillis = 0)
          case _ => ()
        }
        // every file sits under ALL the layout's bucket levels, in order
        val levelPat = layout.map(bc => s"$bc=\\d+").mkString("/") + "/.*"
        assert(t.entries(None).forall(_.rel.matches(levelPat)),
          s"bucket layout lost after $op: ${t.entries(None).map(_.rel)}")
        // every level's id stays within the CURRENT spec's range
        // (rebucket swaps the spec atomically with the rewritten layout)
        val specsNow = t.latestVersion.map(t.bucketSpecsOf).getOrElse(Nil)
        assert(t.entries(None).forall { e =>
          val segs = TxLogTable.partitionSegmentsOf(e.rel)
          specsNow.zipWithIndex.forall { case ((_, n), i) =>
            segs(TxLogTable.bucketColAt(i)).toInt < n }
        }, s"bucket id out of range after $op ($specsNow): " +
          t.entries(None).map(_.rel))
        assert(snapRows(t, None) == model.sorted,
          s"model divergence after $op")
        // NDV sketch invariant under the whole op mix: with < k distinct
        // values the KMV fold is EXACT on everything added since the
        // last reset, so the estimate is never below the visible truth
        // (stale-LOW would mis-size CBO picks) and never above the 1..6
        // key domain (stale-HIGH is bounded by what ever existed)
        if (t.latestVersion.exists(v => t.entries(Some(v)).nonEmpty)) {
          val est = t.ndvOf(t.latestVersion.get).getOrElse("id", -1L)
          val visible = model.map(_._1).distinct.size
          assert(est >= visible && est <= 6,
            s"ndv invariant broke after $op: est=$est visible=$visible")
        }
      }
    }
  }

  test("stage-then-publish races refuse a concurrent rebucket loudly") {
    // the stage-before-loop write paths (commit / group replace /
    // dynamic overwrite) derive hidden bucket ids at STAGING; if a
    // rebucket lands before their publish, retrying would publish files
    // whose _bkt segments lie under the new hash — the guard turns that
    // silent corruption into a serializable-conflict rerun
    val t = TxLogTable(spark,
      Files.createTempDirectory("txspec-guard").resolve("t").toString)
    t.create(schema, partitionCols = Seq(TxLogTable.BucketCol),
      bucketSpecs = Seq(("id", 4)))
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      overwrite = false, partitionCols = Seq(TxLogTable.BucketCol))
    val specAtStage = t.latestVersion.map(t.bucketSpecsOf).get
    // unchanged spec: guard passes
    t.requireSpecUnchanged(specAtStage, t.latestVersion, "test")
    // spec evolved between staging and publish: guard refuses
    t.rebucket(schema, 8)
    val e = intercept[java.util.ConcurrentModificationException] {
      t.requireSpecUnchanged(specAtStage, t.latestVersion, "test")
    }
    assert(e.getMessage.contains("concurrent rebucket"))
    // normal writes against the NEW spec proceed fine
    t.commit(Seq((3L, "c")).toDF("id", "v"),
      overwrite = false, partitionCols = Seq(TxLogTable.BucketCol))
    assert(snapRows(t, None) == List((1L, "a"), (2L, "b"), (3L, "c")))
    assert(t.entries(None).forall { e =>
      e.rel.stripPrefix("_bkt=").takeWhile(_ != '/').toInt < 8 })
  }

  test("partitioned interleavings: dynamic overwrite vs per-partition model") {
    val schemaP = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("k", StringType)))
    val parts = Vector("x", "y", "z")
    val rowsGenP: Gen[List[(Long, String, String)]] =
      Gen.resize(4, Gen.nonEmptyListOf(for {
        id <- Gen.choose(1L, 5L)
        s <- Gen.oneOf("a", "b")
        k <- Gen.oneOf(parts)
      } yield (id, s, k)))
    sealed trait POp
    case class Dyn(rows: List[(Long, String, String)]) extends POp
    case class Full(rows: List[(Long, String, String)]) extends POp
    case class PAppend(rows: List[(Long, String, String)]) extends POp
    case object PCompact extends POp
    val pOpGen: Gen[POp] = Gen.frequency(
      4 -> rowsGenP.map(Dyn), 1 -> rowsGenP.map(Full),
      2 -> rowsGenP.map(PAppend), 1 -> Gen.const(PCompact))
    val programGenP: Gen[List[POp]] = for {
      head <- rowsGenP.map(Full)
      tail <- Gen.resize(8, Gen.listOf(pOpGen))
    } yield head :: tail

    def filesUnder(t: TxLogTable, part: String): Set[String] = {
      val dir = java.nio.file.Paths.get(t.root, "data", s"k=$part")
      if (!Files.isDirectory(dir)) Set.empty
      else scala.util.Using.resource(Files.walk(dir)) { s =>
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(Files.isRegularFile(_))
          .map(_.getFileName.toString).toSet
      }
    }

    forAllSeeded(programGenP, n = 5) { program =>
      val t = TxLogTable(spark,
        Files.createTempDirectory("txpropP").resolve("t").toString)
      var model = Map.empty[String, List[(Long, String)]] // partition → rows
      program.foreach { op =>
        op match {
          case Full(rows) =>
            t.commit(rows.toDF("id", "v", "k"), overwrite = true,
              partitionCols = Seq("k"))
            model = rows.groupBy(_._3)
              .view.mapValues(_.map(r => (r._1, r._2))).toMap
          case PAppend(rows) =>
            t.commit(rows.toDF("id", "v", "k"), overwrite = false,
              partitionCols = Seq("k"))
            rows.groupBy(_._3).foreach { case (k, rs) =>
              model += k -> (model.getOrElse(k, Nil) ++ rs.map(r => (r._1, r._2)))
            }
          case Dyn(rows) =>
            val touched = rows.map(_._3).toSet
            val before = (parts.toSet -- touched)
              .map(p => p -> filesUnder(t, p)).toMap
            t.commitDynamic(rows.toDF("id", "v", "k"), Seq("k"))
            // untouched partitions' files are bit-identical on disk
            before.foreach { case (p, fs) =>
              assert(filesUnder(t, p) == fs, s"partition $p rewritten by $op")
            }
            touched.foreach { k =>
              model += k -> rows.filter(_._3 == k).map(r => (r._1, r._2))
            }
          case PCompact =>
            t.compact(schemaP, numFiles = 1)
        }
        val got = t.snapshot(schemaP).collect()
          .map(r => (r.getString(2), (r.getLong(0), r.getString(1))))
          .groupBy(_._1).view.mapValues(_.map(_._2).toList.sorted).toMap
        val want = model.filter(_._2.nonEmpty)
          .view.mapValues(_.sorted).toMap
        assert(got == want, s"after $op")
      }
    }
  }

  test("random op interleavings agree with the in-memory model") {
    runInterleavings(n = 6)
  }

  // The SAME model under aggressive delta-manifest checkpointing:
  // interval=3 makes every program churn through delta chains AND
  // checkpoint boundaries constantly, so time travel, vacuum floors,
  // restore, merge file accounting, and the CDC replay fold are all
  // exercised against resolved (not self-contained) manifests — the
  // composition evidence for the round-16 log format.
  test("random op interleavings under aggressive delta-manifest " +
    "checkpointing (interval=3)") {
    spark.conf.set("spark.graft.sql.logCheckpointInterval", "3")
    try runInterleavings(n = 4)
    finally spark.conf.unset("spark.graft.sql.logCheckpointInterval")
  }

  private def runInterleavings(n: Int): Unit = {
    forAllSeeded(programGen, n = n) { program =>
      val t = TxLogTable(spark,
        Files.createTempDirectory("txprop").resolve("t").toString)
      // model: per committed version, the visible multiset of rows
      var history = Map.empty[Int, List[(Long, String)]]
      var live = List.empty[Int] // surviving (non-vacuumed) versions, asc
      var pin = Option.empty[Int] // registered cursor's pinned version
      var tagPin = Option.empty[Int] // live tag's pinned version
      var resets = Set.empty[Int] // overwrite versions: CDC resets there
      program.foreach { op =>
        op match {
          case Append(rows) =>
            val base = live.lastOption.map(history).getOrElse(Nil)
            val v = t.commit(rows.toDF("id", "v"), overwrite = false)
            history += v -> (base ++ rows); live :+= v
          case Overwrite(rows) =>
            // blooms on the string column from the first commit: every
            // later op (string-keyed merge included) inherits and
            // maintains them, so the composition coverage includes the
            // bloom-pruned merge path
            val v = t.commit(rows.toDF("id", "v"), overwrite = true,
              bloomCols = Seq("v"))
            history += v -> rows; live :+= v; resets += v
          case Merge(rows) =>
            // delete-insert by key: current rows with a batch id replaced,
            // every batch row (including in-batch id duplicates) inserted
            val base = live.lastOption.map(history).getOrElse(Nil)
            val before = t.fileCount()
            val st = t.merge(schema, rows.toDF("id", "v"), Seq("id"))
            assert(st.rewritten + st.carried + st.dropped == before,
              s"merge file accounting: $st vs $before files")
            val ids = rows.map(_._1).toSet
            history += st.version -> (base.filterNot(r => ids(r._1)) ++ rows)
            live :+= st.version
          case MergeStr(rows) =>
            // delete-insert keyed on the STRING column: pruning (when the
            // table carries blooms) must never change results — the model
            // is the same key-replacement semantics as the integral merge
            val base = live.lastOption.map(history).getOrElse(Nil)
            val before = t.fileCount()
            val st = t.merge(schema, rows.toDF("id", "v"), Seq("v"))
            assert(st.rewritten + st.carried + st.dropped == before,
              s"string merge file accounting: $st vs $before files")
            val vs = rows.map(_._2).toSet
            history += st.version -> (base.filterNot(r => vs(r._2)) ++ rows)
            live :+= st.version
          case Replace(rows) =>
            // predicate-scoped atomic overwrite over the rows' id hull:
            // everything in [lo, hi] is replaced by the batch, one version
            val base = live.lastOption.map(history).getOrElse(Nil)
            val (lo, hi) = (rows.map(_._1).min, rows.map(_._1).max)
            val before = t.fileCount()
            val st = t.replaceWhere(schema,
              org.apache.spark.sql.functions.col("id").between(lo, hi),
              rows.toDF("id", "v"))
            assert(st.rewritten + st.carried + st.dropped == before,
              s"replaceWhere file accounting: $st vs $before files")
            history += st.version ->
              (base.filterNot(r => r._1 >= lo && r._1 <= hi) ++ rows)
            live :+= st.version
          case Delete(ids) =>
            // DELETE where id IN (...): rows with a listed id removed; the
            // IN-list bounds let deleteWhere carry range-disjoint files
            val base = live.lastOption.map(history).getOrElse(Nil)
            val before = t.fileCount()
            val st = t.deleteWhere(schema,
              org.apache.spark.sql.functions.col("id").isin(ids: _*))
            assert(st.rewritten + st.carried + st.dropped == before,
              s"delete file accounting: $st vs $before files")
            val dead = ids.toSet
            history += st.version -> base.filterNot(r => dead(r._1))
            live :+= st.version
          case DeletePos(ids) =>
            // positional (deletion-vector) DELETE composed with
            // everything else: zero data files rewritten ALWAYS, masked
            // rows invisible to snapshot, time travel, and every later
            // op's read path (merge/compact materialize, never
            // resurrect). A predicate matching no surviving row is a
            // clean no-op — no version committed.
            val base = live.lastOption.map(history).getOrElse(Nil)
            val dead = ids.toSet
            val st = t.deleteWherePos(schema,
              org.apache.spark.sql.functions.col("id").isin(ids: _*))
            assert(st.rewritten == 0,
              s"DV delete must never rewrite data files: $st")
            if (base.exists(r => dead(r._1))) {
              history += st.version -> base.filterNot(r => dead(r._1))
              live :+= st.version
            } else assert(live.lastOption.contains(st.version) ||
              (live.isEmpty && st.version == -1),
              s"no-match DV delete must not commit: $st vs $live")
          case UpdatePos(ids) =>
            // positional UPDATE: matched rows masked in place and
            // re-written once with v = 'u' — O(matched rows), zero
            // whole-file rewrites; the model replaces them in place
            val base = live.lastOption.map(history).getOrElse(Nil)
            val hit = ids.toSet
            val st = t.updateWherePos(schema,
              org.apache.spark.sql.functions.col("id").isin(ids: _*),
              Seq("v" -> org.apache.spark.sql.functions.lit("u")))
            assert(st.rewritten == 0,
              s"DV update must never rewrite data files: $st")
            if (base.exists(r => hit(r._1))) {
              history += st.version -> base.map(r =>
                if (hit(r._1)) (r._1, "u") else r)
              live :+= st.version
            } else assert(live.lastOption.contains(st.version) ||
              (live.isEmpty && st.version == -1),
              s"no-match DV update must not commit: $st vs $live")
          case Compact =>
            val v = t.compact(schema, numFiles = 1)
            history += v -> live.lastOption.map(history).getOrElse(Nil)
            live :+= v
            assert(t.fileCount() == 1, s"compact left ${t.fileCount()} files")
          case ZOrder =>
            // layout-only rewrite: rows unchanged, new version appended
            val v = t.compactZOrder(schema, "id", "id", numFiles = 2)
            history += v -> live.lastOption.map(history).getOrElse(Nil)
            live :+= v
          case Vacuum(keep) =>
            t.vacuum(keep, minAgeMillis = 0L, retainMillis = 0L)
            // survivors = everything at or above min(keep boundary,
            // cursor pin, tag pin) — all floors are "v >= X" shapes on
            // an ascending list, so the drop is always a prefix
            val keepFloor = live.takeRight(keep).headOption
              .getOrElse(Int.MaxValue)
            val floor = math.min(
              math.min(keepFloor, pin.getOrElse(Int.MaxValue)),
              tagPin.getOrElse(Int.MaxValue))
            live = live.filter(_ >= floor)
          case Pin(back) =>
            // cursor at `back` versions behind the head: vacuum must
            // preserve the window a lagging consumer still needs
            val target = live(math.max(0, live.size - 1 - back))
            t.registerCursor("prop-cursor", target)
            pin = Some(target)
          case Unpin =>
            t.releaseCursor("prop-cursor")
            pin = None
          case TagAt(back) =>
            // an immutable named ref: only ONE live fuzz tag at a time
            // (re-tagging the same name must refuse — pinned by spec);
            // the tag floors vacuum exactly like a cursor pin
            if (tagPin.isEmpty) {
              val target = live(math.max(0, live.size - 1 - back))
              t.tag("prop-tag", Some(target))
              tagPin = Some(target)
            }
          case DropTag =>
            t.dropTag("prop-tag")
            tagPin = None
        }
        assert(t.versions == live, s"after $op")
        // snapshot + time travel to every surviving version match the model
        live.foreach { v =>
          assert(snapRows(t, Some(v)) == history(v).sorted,
            s"version $v after $op")
        }
      }
      // CDC REPLAY invariant over the whole surviving range: folding the
      // change feed version-by-version (deletes before inserts — a COW
      // or DV update is delete(old)+insert(new) in one commit; an
      // overwrite RESETS to its inserts; maintenance rewrites are
      // skipped and change nothing) reproduces the model at EVERY step.
      // This ties the entire DML matrix to the feed consumers actually
      // read — a delete event lost to compaction folding, a phantom
      // insert from a carried row, or an inexact DV event diverges here.
      if (live.size > 1) {
        var state = history(live.head).sorted
        live.sliding(2).foreach {
          case List(a, b) =>
            val ev = t.changesWithDeletes(schema, a, b,
                skipRewrites = true).collect()
              .map(r => (r.getLong(0), r.getString(1),
                r.getString(r.fieldIndex("_change_type"))))
            val ins = ev.filter(_._3 == "insert").map(e => (e._1, e._2))
            val dels = ev.filter(_._3 == "delete").map(e => (e._1, e._2))
            state =
              if (resets(b)) ins.toList.sorted
              else {
                val deleted = scala.collection.mutable.ListBuffer(
                  dels.toSeq: _*)
                (state.filterNot { r =>
                  val i = deleted.indexOf(r)
                  if (i >= 0) { deleted.remove(i); true } else false
                } ++ ins).sorted
              }
            assert(state == history(b).sorted,
              s"CDC replay diverged at version $b (of $live)")
          case _ => ()
        }
      }
    }
  }

  test("schema-evolution interleavings: add/rename/drop/widen compose " +
      "with DML against an evolving-width model") {
    // the column-mapping contract under RANDOM compositions: a rename is
    // pure metadata (old files keep physical names, the map re-binds),
    // an add reads as NULL from pre-add files, a drop projects away but
    // never frees bytes, a widen promotes at read — and EVERY DML op
    // (append under the current schema, keyed merge, positional delete,
    // compact) must keep agreeing with a model that evolves its row
    // width alongside. This is where mapping bugs live: a merge that
    // rewrites files AFTER a rename mixes old-physical and new-physical
    // files in one table; a compact materializes the map; a DV mask
    // must survive all of it.
    import org.apache.spark.sql.Row
    sealed trait SOp
    case class SAppend(n: Int) extends SOp
    case class SMerge(n: Int) extends SOp
    case class SDeletePos(ids: List[Long]) extends SOp
    case object SAdd extends SOp
    case object SRename extends SOp
    case object SDrop extends SOp
    case object SWiden extends SOp
    case object SCompact extends SOp
    val sOpGen: Gen[SOp] = Gen.frequency(
      4 -> Gen.choose(1, 3).map(SAppend),
      3 -> Gen.choose(1, 3).map(SMerge),
      2 -> Gen.resize(3, Gen.nonEmptyListOf(Gen.choose(1L, 6L)))
        .map(SDeletePos),
      2 -> Gen.const(SAdd),
      2 -> Gen.const(SRename),
      1 -> Gen.const(SDrop),
      1 -> Gen.const(SWiden),
      1 -> Gen.const(SCompact))
    val programGenS: Gen[List[SOp]] =
      Gen.resize(10, Gen.listOf(sOpGen))

    forAllSeeded(programGenS, n = 5) { program =>
      val t = TxLogTable(spark,
        Files.createTempDirectory("txpropS").resolve("t").toString)
      var sch = StructType(Seq(
        StructField("id", LongType),
        StructField("a", StringType),
        StructField("w", IntegerType)))
      t.create(sch)
      var widened = false
      var addSeq = 0
      var valSeq = 0
      // model rows keyed by LOGICAL column name; numeric values held
      // canonically as Long (the widen makes Int vs Long a read detail)
      var model = List.empty[Map[String, Any]]
      // (version, schema-at-version, rows-at-version) for time travel
      var hist = List.empty[(Int, StructType, List[Map[String, Any]])]
      def canon(v: Any): Any = v match {
        case i: Int => i.toLong
        case x => x
      }
      def freshRows(n: Int): List[Map[String, Any]] =
        (1 to n).toList.map { _ =>
          valSeq += 1
          sch.fields.map { f =>
            f.name -> (f.dataType match {
              case LongType if f.name == "id" => (valSeq % 5 + 1).toLong
              case LongType => valSeq.toLong
              case IntegerType => valSeq
              case StringType =>
                if (valSeq % 4 == 0) null else s"s$valSeq"
              case dt => fail(s"unexpected type $dt")
            })
          }.toMap
        }
      def toDf(rows: List[Map[String, Any]]) = {
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(
          rows.map(r => Row.fromSeq(
            sch.fields.toSeq.map(f => r(f.name)))).asJava,
          sch)
      }
      program.foreach { op =>
        op match {
          case SAppend(n) =>
            val rows = freshRows(n)
            t.commit(toDf(rows), overwrite = false)
            model = model ++ rows
          case SMerge(n) =>
            val rows = freshRows(n)
            t.merge(sch, toDf(rows), Seq("id"))
            val ids = rows.map(_("id")).toSet
            model = model.filterNot(r => ids(r("id"))) ++ rows
          case SDeletePos(ids) =>
            val dead = ids.toSet
            val st = t.deleteWherePos(sch,
              org.apache.spark.sql.functions.col("id").isin(ids: _*))
            assert(st.rewritten == 0, s"DV delete rewrote: $st")
            model = model.filterNot(r =>
              dead(r("id").asInstanceOf[Long]))
          case SAdd =>
            addSeq += 1
            val name = s"c$addSeq"
            t.addColumn(name, StringType)
            sch = StructType(sch.fields :+
              StructField(name, StringType))
            model = model.map(_ + (name -> null))
          case SRename =>
            // rename a random non-id, non-w column (w stays for widen)
            sch.fields.map(_.name)
              .find(n => n != "id" && n != "w") match {
              case Some(old) =>
                val nu = old + "r"
                t.renameColumn(old, nu)
                sch = StructType(sch.fields.map(f =>
                  if (f.name == old) f.copy(name = nu) else f))
                model = model.map(r => r - old + (nu -> r(old)))
              case None => ()
            }
          case SDrop =>
            // keep at least one renameable column alive
            val cands = sch.fields.map(_.name)
              .filter(n => n != "id" && n != "w")
            if (cands.length > 1) {
              val victim = cands.last
              t.dropColumn(victim)
              sch = StructType(sch.fields.filterNot(_.name == victim))
              model = model.map(_ - victim)
            }
          case SWiden =>
            if (!widened) {
              t.widenColumn("w", LongType)
              sch = StructType(sch.fields.map(f =>
                if (f.name == "w") f.copy(dataType = LongType) else f))
              widened = true
            }
          case SCompact =>
            if (t.latestVersion.nonEmpty) t.compact(sch, numFiles = 1)
        }
        // recorded schema tracks the evolution exactly
        assert(t.tableSchema.map(_.fieldNames.toSeq)
          .contains(sch.fieldNames.toSeq),
          s"recorded schema diverged after $op: ${t.tableSchema}")
        t.latestVersion.foreach { v =>
          if (!hist.headOption.exists(_._1 == v))
            hist ::= (v, sch, model)
        }
        // snapshot under the CURRENT schema equals the evolving model
        val got = t.snapshot(sch).collect().toList.map(r =>
          sch.fieldNames.map(n =>
            n -> canon(r.get(r.fieldIndex(n)))).toMap)
        def key(m: Map[String, Any]) =
          sch.fieldNames.map(n => String.valueOf(m(n))).mkString("|")
        assert(got.sortBy(key) ==
          model.map(m => m.map { case (k, v) => k -> canon(v) })
            .sortBy(key),
          s"model divergence after $op (schema ${sch.fieldNames.toSeq})")
      }
      // TIME TRAVEL ACROSS THE EVOLUTION: every version replays under
      // its own RECORDED schema with its own rows — a v written three
      // renames and a drop ago must read back exactly as it was,
      // through whatever colmap history accumulated after it (the
      // reproducibility contract a pinned training run depends on)
      hist.foreach { case (v, vs, rows) =>
        assert(t.schemaOf(v).map(_.fieldNames.toSeq)
          .contains(vs.fieldNames.toSeq),
          s"version $v lost its recorded schema")
        val got = t.snapshot(vs, Some(v)).collect().toList.map(r =>
          vs.fieldNames.map(n =>
            n -> canon(r.get(r.fieldIndex(n)))).toMap)
        def key(m: Map[String, Any]) =
          vs.fieldNames.map(n => String.valueOf(m(n))).mkString("|")
        assert(got.sortBy(key) ==
          rows.map(m => m.map { case (k, x) => k -> canon(x) })
            .sortBy(key),
          s"time travel to v$v diverged under schema " +
            vs.fieldNames.toSeq)
      }
    }
  }

  test("time segments: write expression and prune arithmetic agree on " +
      "random instants, every unit") {
    // the hidden-partitioning contract: TxLogTable.timeSegCol (the Spark
    // expression every staging write derives dirs from) and
    // TxLogTable.segOfMicros (the driver-side bound the pruner compares
    // against) must render IDENTICAL segments for the same instant — a
    // disagreement silently mis-prunes. Random epochs across 1970..2100
    // plus the edges of each unit, checked for all four units at once.
    val gen = Gen.chooseNum(0L, 4102444800L) // 1970..2100, seconds
    val seeds = Seed(20260815L)
    val epochs = Gen.listOfN(300, gen)
      .apply(Gen.Parameters.default, seeds).get
    val edgy = epochs ++ Seq(0L, 86399L, 86400L, 31535999L, 31536000L,
      951782399L /* 2000-02-29 boundary - 1 */, 951782400L)
    val df = edgy.toDF("e")
      .selectExpr("e", "timestamp_seconds(e) AS ts")
    val derived = TxLogTable.TimeUnits.foldLeft(df) { (acc, u) =>
      acc.withColumn(s"seg_$u", TxLogTable.timeSegCol("ts", u))
    }
    derived.collect().foreach { r =>
      val us = r.getLong(0) * 1000000L
      TxLogTable.TimeUnits.foreach { u =>
        val spark_ = r.getAs[String](s"seg_$u")
        val driver = TxLogTable.segOfMicros(us, u)
        assert(spark_ == driver,
          s"unit $u disagrees at epoch ${r.getLong(0)}: " +
            s"write=$spark_ prune=$driver")
      }
    }
    // and the segment strings ORDER like the instants do (the property
    // the lexicographic dir-range prune rests on)
    TxLogTable.TimeUnits.foreach { u =>
      val pairs = edgy.sorted.map(e =>
        e -> TxLogTable.segOfMicros(e * 1000000L, u))
      pairs.sliding(2).foreach {
        case Seq((e1, s1), (e2, s2)) =>
          assert(s1 <= s2,
            s"unit $u: segment order must follow time order " +
              s"($e1 -> $s1, $e2 -> $s2)")
        case _ => ()
      }
    }
  }

  test("time-partitioned pruning soundness: snapshotWhere equals " +
      "filter-after-scan on random ranges") {
    import org.apache.spark.sql.functions.{col, lit}
    val root = Files.createTempDirectory("txprop-tseg").resolve("t")
    val t = TxLogTable(spark, root.toString)
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampType)))
    t.create(sch, partitionCols = Seq("_tp"),
      timeSpecs = Seq(("ts", "day")))
    // five days of data across three commits, plus NULL instants
    t.commit(spark.sql("SELECT id, timestamp_seconds(1704067200 + " +
      "id * 7200) AS ts FROM range(60)"), overwrite = false,
      partitionCols = Seq("_tp"))
    t.commit(spark.sql("SELECT id + 100 AS id, " +
      "timestamp_seconds(1704067200 + 86400 * 2 + id * 7200) AS ts " +
      "FROM range(36)"), overwrite = false, partitionCols = Seq("_tp"))
    t.commit(spark.sql("SELECT id + 200 AS id, CAST(NULL AS TIMESTAMP) AS ts " +
      "FROM range(5)"), overwrite = false, partitionCols = Seq("_tp"))
    val full = t.snapshot(sch)
    val seeds = Seed(42L)
    val boundsGen = Gen.listOfN(40,
      Gen.chooseNum(1704067200L - 86400, 1704067200L + 86400L * 7))
    val bounds = boundsGen.apply(Gen.Parameters.default, seeds).get
    bounds.grouped(2).foreach {
      case List(a, b) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val pred = col("ts") >= lit(java.time.Instant.ofEpochSecond(lo)) &&
          col("ts") < lit(java.time.Instant.ofEpochSecond(hi))
        val pruned = t.snapshotWhere(sch, pred).count()
        val naive = full.filter(pred).count()
        assert(pruned == naive,
          s"range [$lo, $hi) pruned=$pruned naive=$naive")
      case _ => ()
    }
    // IS NULL rides the nullness stats, never the segment bounds
    assert(t.snapshotWhere(sch, col("ts").isNull).count() == 5)
  }
}
