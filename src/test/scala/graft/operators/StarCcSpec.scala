package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Large-star/small-star connected components must label every graph
  * identically to the min-label-propagation twin (both: component min id),
  * and must converge in O(log n) rounds where propagation needs one round
  * per diameter — the property that makes it the 100 TB form. */
class StarCcSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  private def nodes(ids: Seq[Long]): DataFrame = ids.toDF("id")
  private def edges(es: Seq[(Long, Long)]): DataFrame =
    es.toDF("src", "dst")

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def check(ids: Seq[Long], es: Seq[(Long, Long)]): Int = {
    // propagation wants the symmetric edge list; star canonicalizes itself
    val sym = es ++ es.map(_.swap)
    val prop = labelsOf(
      Pipeline.connectedComponents(spark, nodes(ids), edges(sym)))
    val (starDf, rounds) =
      Pipeline.connectedComponentsStar(spark, nodes(ids), edges(es))
    val star = labelsOf(starDf)
    assert(star == prop,
      s"star $star\nprop $prop\nedges $es")
    rounds
  }

  test("star labels equal propagation labels on adversarial shapes") {
    // path (worst case for propagation), clique, star, two components,
    // singletons, self-loop noise, duplicate edges
    check(0L to 10L, (0L until 10L).map(i => (i, i + 1)))
    check(0L to 5L, for (a <- 0L to 5L; b <- 0L to 5L if a < b) yield (a, b))
    check(0L to 6L, (1L to 6L).map(i => (0L, i)))
    check(0L to 9L, Seq((0L, 1L), (1L, 2L), (5L, 6L), (6L, 7L), (7L, 5L)))
    check(0L to 4L, Seq((3L, 3L))) // all singletons after self-loop drop
    check(0L to 3L, Seq((0L, 1L), (1L, 0L), (0L, 1L), (2L, 3L)))
    // high-low zigzag: min sits at one end, ids alternate extremes
    check(Seq(0L, 100L, 1L, 99L, 2L, 98L),
      Seq((0L, 100L), (100L, 1L), (1L, 99L), (99L, 2L), (2L, 98L)))
  }

  test("driver union-find fast path equals distributed propagation") {
    // r11: connectedComponents folds ≤cap edge lists on the driver; force
    // the distributed path with driverCap = 0 and pin label equality on
    // the same adversarial shapes (path, two components, dup edges,
    // self-loops, zigzag extremes)
    val shapes = Seq(
      (0L to 10L, (0L until 10L).map(i => (i, i + 1))),
      (0L to 9L, Seq((0L, 1L), (1L, 2L), (5L, 6L), (6L, 7L), (7L, 5L))),
      (0L to 4L, Seq((3L, 3L))),
      (0L to 3L, Seq((0L, 1L), (1L, 0L), (0L, 1L), (2L, 3L))),
      (Seq(0L, 100L, 1L, 99L, 2L, 98L),
        Seq((0L, 100L), (100L, 1L), (1L, 99L), (99L, 2L), (2L, 98L))))
    shapes.foreach { case (ids, es) =>
      val sym = es ++ es.map(_.swap)
      val driver = labelsOf(
        Pipeline.connectedComponents(spark, nodes(ids), edges(sym)))
      val dist = labelsOf(Pipeline.connectedComponents(
        spark, nodes(ids), edges(sym), driverCap = 0))
      assert(driver == dist, s"driver $driver\ndistributed $dist\nedges $es")
    }
  }

  test("star converges in O(log n) rounds on a 64-path (propagation: 63)") {
    val ids = 0L to 64L
    val es = (0L until 64L).map(i => (i, i + 1))
    val rounds = check(ids, es)
    assert(rounds <= 10, s"star took $rounds rounds on a 64-path")
  }

  test("q_dedup_groups_star equals q_dedup_groups on the sf0.001 corpus") {
    val a = Pipeline.qDedupGroups.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Pipeline.qDedupGroupsStar.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
    assert(a.exists(p => p._1 != p._2), "corpus should contain real groups")
  }
}
