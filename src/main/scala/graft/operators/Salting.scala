package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (AQE's skew-join handles sort-merge spills, but a hot key that maps
  * to ONE reducer still serializes; salting spreads it).
  *
  * `saltedJoin(left, right, key, f)`: the skewed (left) side gets a
  * deterministic salt in [0, f) derived from a hash of the whole row;
  * the small-to-medium (right) side is replicated f times. The join key
  * becomes (key, salt) — hot keys fan out over f reducers. Right-side
  * replication costs f×|right|, so pick f ≈ hot-key-rows / desired
  * per-reducer rows and keep the replicated side the smaller one.
  */
object Salting {

  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val l = skewed.withColumn("_salt",
      pmod(xxhash64(skewed.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    val r = other.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    l.join(r, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Two-phase aggregate for skewed groupBy keys: partial aggregate on
    * (key, salt), then final aggregate on key. Spark's hash aggregate
    * already does map-side partials; this helps when a single group's
    * PARTIAL rows still overwhelm one reducer (extreme cardinality
    * skew) or the aggregate buffer is wide.
    */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
                     saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(saltFactor)).cast("int"))
    salted.groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
  }
}
