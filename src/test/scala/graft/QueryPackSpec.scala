package graft

/** Smoke + shape checks for every declared query (SURVEY.md §2 inventory):
  * each runs at sf0.001, has stable column names, and the oracle-less ones
  * (weaker driver check) must still produce rows. */
class QueryPackSpec extends SparkSpec {

  test("entry() flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query name is unique") {
    val names = SparkEntry.packs.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  SparkEntry.packs.foreach { q =>
    test(s"${q.name} runs at sf0.001 and returns rows") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
