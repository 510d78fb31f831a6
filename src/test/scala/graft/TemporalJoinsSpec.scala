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

  test("asOfForward picks the earliest right row at-or-after, null when none") {
    val right = Seq((1L, ts(10), "r10"), (1L, ts(20), "r20"), (2L, ts(5), "r5"))
      .toDF("k", "ts", "payload")
    val left = Seq((1L, ts(9), "a"), (1L, ts(10), "b"), (1L, ts(25), "c"), (3L, ts(50), "d"))
      .toDF("k", "ts", "name")
    val out = TemporalJoins.asOfForward(left, right, Seq("k"), "ts", "ts",
        Map("payload" -> "p"))
      .select($"name", $"p").as[(String, Option[String])].collect().toMap
    assert(out == Map(
      "a" -> Some("r10"),     // next at-or-after
      "b" -> Some("r10"),     // equality matches (<= semantics)
      "c" -> None,            // after last right row
      "d" -> None))
  }

  test("asOfNearest: smaller delta wins, ties backward, tolerance nulls out") {
    val right = Seq((1L, ts(100), "b100"), (1L, ts(120), "c120"))
      .toDF("k", "ts", "payload")
    val left = Seq(
      (1L, ts(100), "eq"),   // equal ts → backward
      (1L, ts(110), "tie"),  // 10 vs 10 → backward
      (1L, ts(113), "fwd"),  // 13 vs 7 → forward
      (1L, ts(150), "far"),  // 30 back, none fwd
      (2L, ts(10), "nok")    // no right rows at all
    ).toDF("k", "ts", "name")
    val out = TemporalJoins.asOfNearest(left, right, Seq("k"), "ts", "ts",
        Map("payload" -> "p"))
      .select($"name", $"asof_dir", $"p")
      .as[(String, Option[String], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      "eq" -> ((Some("backward"), Some("b100"))),
      "tie" -> ((Some("backward"), Some("b100"))),
      "fwd" -> ((Some("forward"), Some("c120"))),
      "far" -> ((Some("backward"), Some("c120"))),
      "nok" -> ((None, None))), out.toString)
    // a 20-minute tolerance kills the 30-minute-away match only
    val tol = TemporalJoins.asOfNearest(left, right, Seq("k"), "ts", "ts",
        Map("payload" -> "p"), toleranceUs = Some(20L * 60L * 1000000L))
      .select($"name", $"p").as[(String, Option[String])].collect().toMap
    assert(tol("far").isEmpty && tol("fwd") == Some("c120"), tol.toString)
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

  test("intervalOverlapJoin equals the naive inequality join; multi-bucket pairs count once; malformed refuses") {
    // interval fixture spanning several buckets (width 10): touching
    // endpoints, nesting, and long intervals that share MANY buckets
    // with their partner — the later-start dedup must emit each
    // overlapping pair exactly once, and recall must be exactly 1
    val left = Seq(
      (1L, 101L, 0L, 35L),   // long: crosses buckets 0..3
      (1L, 102L, 40L, 45L),
      (2L, 103L, 5L, 10L)).toDF("k", "lid", "st", "en")
    val right = Seq(
      (1L, 201L, 30L, 50L),  // overlaps 101 (shares buckets 3) AND 102
      (1L, 202L, 35L, 35L),  // touches 101's end exactly
      (1L, 203L, 60L, 70L),  // no overlap
      (2L, 204L, 10L, 12L),  // touches 103's end
      (3L, 205L, 0L, 100L)).toDF("k", "rid", "st", "en") // bystander key
    val got = TemporalJoins.intervalOverlapJoin(left, right, Seq("k"),
        "st", "en", bucketWidth = 10L)
      .select($"lid", $"r_rid").as[(Long, Long)].collect().toList
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"l.st" <= $"r.en" && $"r.st" <= $"l.en")
      .select($"l.lid", $"r.rid").as[(Long, Long)].collect().toSet
    assert(got.toSet == naive && naive ==
      Set((101L, 201L), (101L, 202L), (102L, 201L), (103L, 204L)), got.toString)
    // exactly once each — a pair sharing several buckets must not dup
    assert(got.size == got.toSet.size, s"duplicated pairs: $got")
    // randomized agreement with the naive join across widths
    val bigL = (1 to 60).map(i => (i.toLong % 3, 300L + i, (i * 7L) % 90, (i * 7L) % 90 + i % 13))
      .toDF("k", "lid", "st", "en")
    val bigR = (1 to 80).map(i => (i.toLong % 3, 400L + i, (i * 11L) % 95, (i * 11L) % 95 + i % 9))
      .toDF("k", "rid", "st", "en")
    val naive2 = bigL.as("l").join(bigR.as("r"),
        $"l.k" === $"r.k" && $"l.st" <= $"r.en" && $"r.st" <= $"l.en")
      .select($"l.lid", $"r.rid").as[(Long, Long)].collect().toSet
    for (w <- Seq(3L, 10L, 64L)) {
      val b = TemporalJoins.intervalOverlapJoin(bigL, bigR, Seq("k"),
          "st", "en", bucketWidth = w)
        .select($"lid", $"r_rid").as[(Long, Long)].collect().toList
      assert(b.toSet == naive2 && b.size == naive2.size, s"width $w diverged")
    }
    // end-before-start refuses loudly instead of silently dropping
    val bad = Seq((1L, 9L, 50L, 40L)).toDF("k", "lid", "st", "en")
    val e = intercept[Exception] {
      TemporalJoins.intervalOverlapJoin(bad, right, Seq("k"), "st", "en", 10L).collect()
    }
    assert(e.getMessage != null)
  }

  test("mergeIntervals: running-max chaining swallows nested intervals, touching merge, partition invariance") {
    // the lag-pitfall fixture: id 2 and 3 sit INSIDE id 1's span, and
    // their pairwise gap (20 → 30) looks like a break to any
    // lag-based check — only the running max of all earlier ends
    // (100) sees over it. id 4 TOUCHES the island end (start == 100)
    // and must merge; id 5 opens a new island. user 2 is a bystander
    // group that must not interact.
    val iv = Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 10L, 20L), (1L, 3L, 30L, 40L),
      (1L, 4L, 100L, 150L), (1L, 5L, 200L, 210L),
      (2L, 6L, 5L, 15L)).toDF("u", "id", "st", "en")
    def run(df: org.apache.spark.sql.DataFrame) =
      TemporalJoins.mergeIntervals(df, Seq("u"), "st", "en", "id")
        .select($"u", $"island", $"start_us", $"end_us", $"covered_us", $"n_events")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    val got = run(iv)
    assert(got == Set(
      (1L, 1L, 0L, 150L, 150L, 4L),
      (1L, 2L, 200L, 210L, 10L, 1L),
      (2L, 1L, 5L, 15L, 10L, 1L)), got.toString)
    // island numbering and contents survive any input partitioning
    assert(run(iv.repartition(7)) == got)
    // keyless refusal is loud, not a silent single-partition window
    intercept[IllegalArgumentException] {
      TemporalJoins.mergeIntervals(iv, Seq.empty, "st", "en", "id")
    }
    // a malformed interval (end < start) refuses loudly instead of
    // silently corrupting the running-max chain — including when it is
    // alone in its island (the raise rides the island aggregation)
    val bad = iv.unionByName(Seq((3L, 7L, 50L, 40L)).toDF("u", "id", "st", "en"))
    val ex = intercept[Exception] { run(bad) }
    assert(ex.getMessage != null &&
      ex.getMessage.contains("interval end before start"), ex.getMessage)
  }
}
