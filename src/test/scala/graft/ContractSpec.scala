package graft

/** Driver-contract invariants: the flagship entry returns rows, every
  * oracle key has a matching query, and query names are stable
  * identifiers.
  */
class ContractSpec extends SparkSpec {

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; names are well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"oracles without queries: ${os -- qs}")
    assert(qs.forall(_.matches("[a-z0-9_]+")))
    // surface size guard: would catch an accidental map-merge clobber
    assert(qs.size >= 80, s"query surface shrank: ${qs.size}")
    assert(os.size >= 75, s"oracle surface shrank: ${os.size}")
  }

  test("all queries execute at sf0.001 and their schemas have no duplicate columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf())
      val cols = df.columns
      assert(cols.distinct.length == cols.length, s"$name has duplicate columns")
    }
  }
}
