package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fixed-point label propagation vs brute-force connected components.
  *
  * The chain fixture is the case the fixed 3-round variant cannot close
  * (diameter ≫ 3); random bipartite graphs pin the general contract against
  * a driver-side union-find.
  */
class LabelPropagationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(edges: Seq[(Long, String)]): Map[Long, Long] = {
    import spark.implicits._
    LabelPropagation
      .connectedComponents(edges.toDF("doc_id", "bucket"), "doc_id",
        Seq("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Driver-side union-find reference. */
  private def unionFind(edges: Seq[(Long, String)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.groupBy(_._2).values.foreach { members =>
      val ids = members.map(_._1)
      val root = ids.map(find).min
      ids.foreach(i => parent(find(i)) = root)
    }
    // path-compress to the component minimum
    val nodes = edges.map(_._1).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ns) => ns.map(_ -> ns.min) }
  }

  test("chain of 20 docs collapses to one cluster (diameter >> 3 rounds)") {
    // doc i and i+1 share bucket "b<i>" — a path graph, diameter 19
    val edges = (1L to 19L).flatMap(i =>
      Seq(i -> s"b$i", (i + 1) -> s"b$i"))
    val got = run(edges)
    assert(got == (1L to 20L).map(_ -> 1L).toMap)
  }

  test("two chains + isolated node keep separate labels") {
    val edges =
      (1L to 4L).flatMap(i => Seq(i -> s"x$i", (i + 1) -> s"x$i")) ++
        (10L to 13L).flatMap(i => Seq(i -> s"y$i", (i + 1) -> s"y$i")) ++
        Seq(99L -> "z")
    val got = run(edges)
    assert(got == unionFind(edges))
    assert(got(99L) == 99L && got(5L) == 1L && got(14L) == 10L)
  }

  test("random bipartite graphs match union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + rnd.nextInt(30)
      val nBuckets = 5 + rnd.nextInt(15)
      val edges = (1L to n.toLong).flatMap { d =>
        (0 until 1 + rnd.nextInt(2)).map(_ => d -> s"t$trial-b${rnd.nextInt(nBuckets)}")
      }
      assert(run(edges) == unionFind(edges), s"trial $trial")
    }
  }
}
