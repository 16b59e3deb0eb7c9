package graft

/** Pins the driver contract: every oracle key names a declared query, the
  * flagship entry smokes, and every declared query executes at sf0.001. */
class ContractSpec extends SparkSpec {

  test("every oracle entry has a matching declared query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("every declared query has an oracle (no rows-only checks remain)") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(rowsOnly.isEmpty, s"queries without an oracle: $rowsOnly")
  }

  test("entry() smoke: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query executes and is non-empty at sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    // near-dup pair queries may legitimately return few rows, but none of
    // the declared queries should be empty on the planted test corpus
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
