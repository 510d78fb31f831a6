package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `ARRAY<FLOAT>` columns.
  *
  * All math is promoted to double before accumulation (float
  * accumulation order is not portable) and built from codegen-friendly
  * higher-order builtins — no UDF serialization on the hot path.
  */
object VectorFns {

  /** Dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm in double precision. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded to 6 decimals — the deterministic comparison form
    * (absorbs summation-order differences across engines/partitions).
    */
  def cosineR(a: Column, b: Column): Column = round(cosine(a, b), 6)
}
