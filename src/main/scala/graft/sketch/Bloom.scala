package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter columns over Spark's native sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the same
  * machinery AQE's runtime row-level filters use), wrapped as plain
  * `Column`s: zero UDFs, fully codegen'd membership probes.
  *
  * The sketch is built by one aggregation job and carried as a BINARY
  * literal in the probing plan (Spark requires the filter side of
  * `might_contain` to be foldable). That makes it a driver-held value
  * — appropriate because a bloom sketch is small by construction
  * (`numBits/8` bytes regardless of item count; 100M items at ~1% FP
  * is ~120 MB worth of EXACT hashes but only ~15 MB of sketch), which
  * is the point: at scales where broadcasting the exact key set
  * strains the driver and executors, the sketch still ships cheaply.
  *
  * Membership is one-sided: `mightContain` returns false only for
  * true non-members. Exact operators built on it (e.g.
  * [[graft.curation.Curation.decontaminateBloom]]) must confirm
  * positives against the exact set — the sketch only shrinks the
  * candidate stream, never decides.
  */
object Bloom {

  /** Build the sketch over a LONG column: one row, BINARY. */
  def sketch(df: DataFrame, c: Column, expectedItems: Long,
             numBits: Long): Array[Byte] = {
    require(expectedItems > 0 && numBits > 0,
      s"bloom sketch needs positive sizes, got items=$expectedItems bits=$numBits")
    val agg = ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(c),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val row = df.agg(agg.as("bf")).head()
    // an empty input produces a NULL sketch; represent it as an empty
    // byte array, which mightContain maps to a constant-false probe
    if (row.isNullAt(0)) Array.emptyByteArray
    else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe of `c` (LONG) against a driver-held
    * sketch, embedded as a foldable BINARY literal. An empty sketch
    * (from an empty build side) matches nothing.
    */
  def mightContain(sketchBytes: Array[Byte], c: Column): Column =
    if (sketchBytes.isEmpty)
      org.apache.spark.sql.functions.lit(false)
    else
      ColumnBridge.column(BloomFilterMightContain(
        Literal(sketchBytes, BinaryType), ColumnBridge.expression(c)))
}
