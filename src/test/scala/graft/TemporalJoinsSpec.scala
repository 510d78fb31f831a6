package graft

import java.sql.Timestamp

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)

  test("asOf picks the latest right row at-or-before, null when none") {
    val right = Seq((1L, ts(10), "r10"), (1L, ts(20), "r20"), (2L, ts(5), "r5"))
      .toDF("k", "ts", "payload")
    val left = Seq((1L, ts(9), "a"), (1L, ts(10), "b"), (1L, ts(25), "c"), (3L, ts(50), "d"))
      .toDF("k", "ts", "name")
    val out = TemporalJoins.asOf(left, right, Seq("k"), "ts", "ts", Map("payload" -> "p"))
      .select($"k", $"name", $"p").as[(Long, String, Option[String])].collect()
      .map(r => r._2 -> r._3).toMap
    assert(out == Map(
      "a" -> None,            // before first right row
      "b" -> Some("r10"),     // equality matches (>= semantics)
      "c" -> Some("r20"),     // latest prior
      "d" -> None))           // key with no right rows
  }

  test("bucketed range join equals the naive inequality join") {
    val left = (1 to 50).map(i => (i.toLong % 5, ts(i * 7), i.toLong)).toDF("k", "ts", "lid")
    val right = (1 to 80).map(i => (i.toLong % 5, ts(i * 4), 1000L + i)).toDF("k", "ts", "rid")
    val bucketed = TemporalJoins.bucketedRangeJoin(left, right, Seq("k"), "ts", "ts",
        0L, 30L * 60L * 1000000L)
      .select($"lid", $"r_rid").as[(Long, Long)].collect().toSet
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" &&
          org.apache.spark.sql.functions.unix_micros($"r.ts") > org.apache.spark.sql.functions.unix_micros($"l.ts") &&
          org.apache.spark.sql.functions.unix_micros($"r.ts") <= org.apache.spark.sql.functions.unix_micros($"l.ts") + 30L * 60L * 1000000L)
      .select($"l.lid", $"r.rid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive && naive.nonEmpty)
  }
}
