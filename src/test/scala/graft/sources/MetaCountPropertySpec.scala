package graft.sources

import java.nio.file.Files

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property test for the partition-filtered metadata aggregate collapse:
  * on random partitioned tables (random partition values INCLUDING nulls,
  * random multi-commit layouts) and random equality/IN predicates, the
  * SQL `COUNT(*)` / `MIN` / `MAX` answers must equal the same query
  * computed by a forced scan — whether or not the collapse fired — and
  * the collapse MUST fire whenever the predicate is partition-only
  * without null ambiguity. The hand-written TxLogCatalogSpec covers the
  * enumerated corners (IN-lists, contradictions, sentinel, tombstones);
  * this covers the composition space.
  */
class MetaCountPropertySpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.mcprop", "graft.sources.v2.TxLogCatalog")
    s.conf.set("spark.sql.catalog.mcprop.warehouse",
      Files.createTempDirectory("mcprop-wh").toString)
    s
  }

  private case class Shape(commits: List[List[(Long, Option[Int])]],
                           predVals: List[Int], useIn: Boolean)

  private val shapeGen: Gen[Shape] = for {
    nCommits <- Gen.choose(1, 4)
    commits <- Gen.listOfN(nCommits, Gen.resize(8, Gen.nonEmptyListOf(for {
      id <- Gen.choose(0L, 50L)
      p <- Gen.frequency(5 -> Gen.choose(0, 3).map(Some(_)),
        1 -> Gen.const(None))
    } yield (id, p))))
    nVals <- Gen.choose(1, 3)
    predVals <- Gen.listOfN(nVals, Gen.choose(0, 4))
    useIn <- Gen.oneOf(true, false)
  } yield Shape(commits, predVals, useIn)

  test("random layouts × random partition predicates: collapse == scan") {
    import spark.implicits._
    val seed0 = Seed(20260814L)
    var seed = seed0
    (1 to 25).foreach { i =>
      val shape = shapeGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      spark.sql(s"DROP TABLE IF EXISTS mcprop.ns.t$i")
      spark.sql(s"CREATE TABLE mcprop.ns.t$i (id BIGINT, p INT) " +
        "USING txlog PARTITIONED BY (p)")
      shape.commits.foreach { rows =>
        val values = rows.map { case (id, p) =>
          s"(CAST($id AS BIGINT), ${p.map(_.toString).getOrElse("NULL")})"
        }.mkString(", ")
        spark.sql(s"INSERT INTO mcprop.ns.t$i VALUES $values")
      }
      val pred =
        if (shape.useIn) s"p IN (${shape.predVals.distinct.mkString(", ")})"
        else s"p = ${shape.predVals.head}"
      val q = spark.sql(
        s"SELECT count(*) AS n, min(id) AS mn, max(id) AS mx " +
          s"FROM mcprop.ns.t$i WHERE $pred")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("LocalTableScan"),
        s"iteration $i: partition-only predicate must collapse:\n$plan")
      val got = q.head
      // ground truth from the committed rows themselves (null partition
      // rows never match an equality/IN predicate)
      val matching = shape.commits.flatten.collect {
        case (id, Some(p)) if shape.predVals.distinct.contains(p) &&
          (shape.useIn || p == shape.predVals.head) => id
      }
      assert(got.getLong(0) == matching.size.toLong,
        s"iteration $i: count mismatch pred=$pred rows=${shape.commits}")
      if (matching.isEmpty) assert(got.isNullAt(1) && got.isNullAt(2),
        s"iteration $i: empty subset must answer NULL extrema")
      else assert(got.getLong(1) == matching.min &&
        got.getLong(2) == matching.max,
        s"iteration $i: extrema mismatch pred=$pred got=$got " +
          s"expect=(${matching.min}, ${matching.max})")
      spark.sql(s"DROP TABLE mcprop.ns.t$i")
    }
  }
}
