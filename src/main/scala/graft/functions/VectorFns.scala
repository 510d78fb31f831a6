package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.{DotProductF32, NormSqF32}

/** Embedding-vector column functions over `ARRAY<FLOAT>` columns.
  *
  * All math is promoted to double before accumulation (float
  * accumulation order is not portable). Backed by the native codegen'd
  * expressions in [[graft.plans]] — a tight primitive loop inside
  * whole-stage codegen, no per-element lambda dispatch, no UDF
  * serialization.
  */
object VectorFns {

  /** Dot product in double precision (native codegen). */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductF32(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Squared L2 norm in double precision (native codegen). */
  def normSq(a: Column): Column =
    ColumnBridge.column(NormSqF32(ColumnBridge.expression(a)))

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine rounded to 6 decimals — the deterministic comparison form
    * (absorbs summation-order differences across engines/partitions).
    */
  def cosineR(a: Column, b: Column): Column = round(cosine(a, b), 6)
}
