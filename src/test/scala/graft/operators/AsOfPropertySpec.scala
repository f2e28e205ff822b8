package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AsOfJoin and TopK against brute-force references over generated data —
  * covering shapes the oracle data doesn't hit: equal timestamps on both
  * sides, keys with no right rows at all, keys only on the right, duplicate
  * right timestamps, and score ties in top-k.
  */
class AsOfPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAllSeeded[A](g: Gen[A], n: Int = 6)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(g.pureApply(Gen.Parameters.default.withSize(15), Seed(7L + i)))
    }

  private val rowsGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOf(for {
      k <- Gen.choose(1L, 4L)       // few keys → collisions guaranteed
      ts <- Gen.choose(0L, 20L)     // small ts range → ties guaranteed
      v <- Gen.choose(0, 99).map(_ / 10.0)
    } yield (k, ts, v))

  test("asof join equals per-key brute force (ties, missing keys, dups)") {
    forAllSeeded(Gen.zip(rowsGen, rowsGen)) { case (lRows, rRows) =>
      val left = lRows.zipWithIndex
        .map { case ((k, ts, _), i) => (i.toLong, k, ts) }
      val right = rRows.map { case (k, ts, v) => (k, ts, v) }
      val leftDf = left.toDF("lid", "k", "ts")
      val rightDf = right.toDF("k", "ts", "v")
        .withColumn("rv", col("v")).drop("v")

      val got = AsOfJoin(leftDf, rightDf, "k", "ts", Seq("rv"))
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap

      left.foreach { case (lid, k, ts) =>
        // brute force: latest right ts <= left ts for the key; among equal
        // max-ts rows any value is admissible (the impl picks the window's
        // last) — compare against the SET of admissible values
        val candidates = right.filter(r => r._1 == k && r._2 <= ts)
        if (candidates.isEmpty) assert(got(lid).isEmpty, s"lid=$lid")
        else {
          val maxTs = candidates.map(_._2).max
          val admissible = candidates.filter(_._2 == maxTs).map(_._3).toSet
          assert(got(lid).isDefined && admissible.contains(got(lid).get),
            s"lid=$lid got=${got(lid)} admissible=$admissible")
        }
      }
    }
  }

  test("TopK aggregator equals full sort for any k and tie pattern") {
    forAllSeeded(rowsGen.map(_.zipWithIndex)) { rows =>
      if (rows.nonEmpty) {
        val df = rows.map { case ((k, _, v), i) => (k, v, i.toLong) }
          .toDF("k", "score", "id")
        val topk = udaf(graft.functions.TopK(3))
        val got = df.groupBy("k").agg(topk(col("score"), col("id")).as("t"))
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
        rows.groupBy(_._1._1).foreach { case (k, grp) =>
          val want = grp
            .map { case ((_, _, v), i) => (v, i.toLong) }
            .sortBy { case (v, id) => (-v, id) }.take(3).map(_._2)
          assert(got(k) == want, s"k=$k got=${got(k)} want=$want")
        }
      }
    }
  }
}
