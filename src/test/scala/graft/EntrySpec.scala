package graft

/** The driver's t1 smoke gate, pinned as a test: the flagship entry must
  * produce rows on sf0.001, and every catalog query must at least build a
  * DataFrame with the columns its oracle declares.
  */
class EntrySpec extends SparkSpec {

  test("entry() produces rows on sf0.001 (driver smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query, every query is buildable") {
    val qs = SparkEntry.queries
    val missing = SparkEntry.oracleSql.keySet -- qs.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
    qs.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.columns.nonEmpty, s"$name produced no columns")
    }
  }
}
