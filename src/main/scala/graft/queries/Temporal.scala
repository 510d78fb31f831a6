package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.operators.TemporalJoins

/** Temporal-join operator surface over the events table. DuckDB has a
  * native ASOF JOIN — a strong independent oracle for our composed
  * implementation.
  */
object Temporal {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // purchases ⟵ latest click at-or-before, per user
    "q_asof_join" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
      val clicks = ev.filter($"event_type" === "click")
        .groupBy($"user_id", $"ts")
        .agg(max_by($"value", $"event_id").as("click_value"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      TemporalJoins.asOf(purchases, clicks, Seq("user_id"), "ts", "ts",
        Map("click_value" -> "click_value"))
        .select($"event_id", $"user_id", $"ts", $"asof_ts", $"click_value")
        .orderBy($"event_id")
    }),
    // events within 1 hour after each signup, per user
    "q_range_join" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
      val signups = ev.filter($"event_type" === "signup")
        .select($"event_id", $"user_id", $"ts")
      val all = ev.select($"event_id", $"user_id", $"ts", $"event_type", $"value")
      TemporalJoins.bucketedRangeJoin(signups, all, Seq("user_id"), "ts", "ts",
        lowerUs = 0L, upperUs = 3600L * 1000000L)
        .select($"user_id", $"event_id", $"ts",
          $"r_event_id", $"r_ts", $"r_event_type", $"r_value")
        .orderBy($"event_id", $"r_event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "q_asof_join" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, max_by(value, event_id) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
        |purchases AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, p.ts, c.ts AS asof_ts, c.click_value
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "q_range_join" ->
      """SELECT s.user_id, s.event_id, s.ts, e.event_id AS r_event_id, e.ts AS r_ts,
        |e.event_type AS r_event_type, e.value AS r_value
        |FROM events s JOIN events e ON e.user_id = s.user_id
        |  AND epoch_us(e.ts) > epoch_us(s.ts)
        |  AND epoch_us(e.ts) <= epoch_us(s.ts) + 3600000000
        |WHERE s.event_type = 'signup'
        |ORDER BY s.event_id, r_event_id""".stripMargin
  )
}
