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

  test("query names are unique across modules (map merge cannot clobber)") {
    // the SparkEntry maps merge with ++, which silently overwrites on
    // key collision — a new query reusing an existing name would
    // DELETE the old one from the surface (round-17 nearly shipped
    // exactly that: a second q_source_overlap). Compare per-module
    // key multiset sizes against the merged map.
    val modules = Seq(
      "Relational" -> (_root_.graft.queries.Relational.queries.keySet,
        _root_.graft.queries.Relational.oracles.keySet),
      "TextOps" -> (_root_.graft.queries.TextOps.queries.keySet,
        _root_.graft.queries.TextOps.oracles.keySet),
      "VectorOps" -> (_root_.graft.queries.VectorOps.queries.keySet,
        _root_.graft.queries.VectorOps.oracles.keySet),
      "MediaOps" -> (_root_.graft.queries.MediaOps.queries.keySet,
        _root_.graft.queries.MediaOps.oracles.keySet),
      "Extra" -> (_root_.graft.queries.Extra.queries.keySet,
        _root_.graft.queries.Extra.oracles.keySet),
      "Temporal" -> (_root_.graft.queries.Temporal.queries.keySet,
        _root_.graft.queries.Temporal.oracles.keySet),
      "TextOps2" -> (_root_.graft.queries.TextOps2.queries.keySet,
        _root_.graft.queries.TextOps2.oracles.keySet),
      "TextOps3" -> (_root_.graft.queries.TextOps3.queries.keySet,
        _root_.graft.queries.TextOps3.oracles.keySet),
      "TextOps4" -> (_root_.graft.queries.TextOps4.queries.keySet,
        _root_.graft.queries.TextOps4.oracles.keySet),
      "TextOps5" -> (_root_.graft.queries.TextOps5.queries.keySet,
        _root_.graft.queries.TextOps5.oracles.keySet),
      "TextOps6" -> (_root_.graft.queries.TextOps6.queries.keySet,
        _root_.graft.queries.TextOps6.oracles.keySet),
      "TextOps7" -> (_root_.graft.queries.TextOps7.queries.keySet,
        _root_.graft.queries.TextOps7.oracles.keySet),
      "TextOps8" -> (_root_.graft.queries.TextOps8.queries.keySet,
        _root_.graft.queries.TextOps8.oracles.keySet),
      "GraphOps" -> (_root_.graft.queries.GraphOps.queries.keySet,
        _root_.graft.queries.GraphOps.oracles.keySet))
    val seen = scala.collection.mutable.Map[String, String]()
    for ((mod, (qs, _)) <- modules; name <- qs) {
      val prev = seen.get(name)
      assert(prev.isEmpty,
        s"query '$name' defined in both ${prev.getOrElse("?")} and $mod — " +
          "the map merge silently drops one")
      seen(name) = mod
    }
    assert(seen.size == SparkEntry.queries.size)
    assert(modules.map(_._2._2.size).sum == SparkEntry.oracleSql.size)
  }

  test("all queries execute at sf0.001 and their schemas have no duplicate columns") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf())
      val cols = df.columns
      assert(cols.distinct.length == cols.length, s"$name has duplicate columns")
    }
  }

  test("no oracle-gated query emits a decimal output without a green driver precedent") {
    // The driver's decimal canonicalization has hash-rejected
    // value-identical outputs THREE rounds running — q_source_drift
    // (DECIMAL(38,0), r14+r15) and q_class_separation (DECIMAL(18,6),
    // r16) — while the local typed gate stayed green each time, so
    // the r15 "precision <= 18" rule was demonstrably too loose. The
    // only decimal shape with a green driver record is DECIMAL(13,9)
    // (q_temp_mix). Any OTHER decimal-typed output column is a
    // driver-risk and fails here: re-pin it on BIGINT micro-units
    // (floor(x*1e6+0.5) — the q_class_separation fix) or on the
    // proven (13,9) shape, and extend this allowlist only after the
    // new shape has a green driver round behind it.
    import org.apache.spark.sql.types.DecimalType
    val greenPrecedents = Set((13, 9))
    SparkEntry.queries.filterKeys(SparkEntry.oracleSql.contains)
      .foreach { case (name, fn) =>
        fn(spark, sf()).schema.fields.foreach { f =>
          f.dataType match {
            case d: DecimalType =>
              assert(greenPrecedents.contains((d.precision, d.scale)),
                s"$name.${f.name} is DECIMAL(${d.precision},${d.scale}) — " +
                  "no green driver precedent for this decimal shape " +
                  "(three decimal-typed driver reds in rounds 14-16); " +
                  "re-pin on BIGINT micro-units or DECIMAL(13,9)")
            case _ =>
          }
        }
      }
  }
}
