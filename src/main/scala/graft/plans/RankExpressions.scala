package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, LeafExpression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Partition-local row counter seeded with a per-partition global
  * offset: row i of partition p evaluates to `offsets(p) + i + 1`.
  *
  * This is the projection half of the distributed exact global ranking
  * ([[graft.operators.Ranking]]): after a range partition + in-partition
  * sort, the global 1-based row_number of a row is its partition's
  * cumulative predecessor count plus its position in the partition.
  * Doing it as a native stateful expression (the
  * `monotonically_increasing_id` shape, with the partition mask replaced
  * by the exact seed array) keeps the rank inside whole-stage codegen —
  * the RDD `mapPartitionsWithIndex` formulation it replaces broke
  * codegen and column pruning for everything downstream of the rank.
  *
  * `offsets` is indexed by partition id and ships with the serialized
  * expression (≤ numPartitions longs — cheaper than a broadcast for any
  * realistic partition count). Stateful: each partition re-seeds via
  * `initializeInternal`, and Catalyst fresh-copies stateful expressions
  * rather than sharing counters across threads.
  */
case class PartitionOffsetRank(offsets: Array[Long])
    extends LeafExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def stateful: Boolean = true
  override def prettyName: String = "partition_offset_rank"

  @transient private[this] var count: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    count = if (partitionIndex < offsets.length) offsets(partitionIndex) else 0L

  override protected def evalInternal(input: InternalRow): Long = {
    count += 1
    count
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val countTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "graftRankCount")
    val arrTerm = ctx.addReferenceObj("graftRankOffsets", offsets, "long[]")
    ctx.addPartitionInitializationStatement(
      s"$countTerm = partitionIndex < $arrTerm.length ? $arrTerm[partitionIndex] : 0L;")
    ev.copy(code = code"""
      final ${CodeGenerator.javaType(dataType)} ${ev.value} = ++$countTerm;""",
      isNull = FalseLiteral)
  }
}

/** Partition-local running sum of a LONG child seeded with a
  * per-partition global offset: row i of partition p evaluates to
  * `offsets(p) + sum(child over rows 0..i of p)` — the INCLUSIVE
  * global prefix sum after a range partition + in-partition sort.
  *
  * The cumulative-sum half of distributed exact global windows
  * ([[graft.operators.Ranking.globalRunningSum]]): the per-partition
  * totals are aggregated once, their prefix sums seed this expression,
  * and the projection stays inside whole-stage codegen — the
  * `Window.orderBy` formulation it replaces moves every row into one
  * task. A null child contributes 0 (SQL SUM semantics).
  */
case class PartitionOffsetRunningSum(offsets: Array[Long], child: Expression)
    extends UnaryExpression with Nondeterministic {

  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def stateful: Boolean = true
  override def prettyName: String = "partition_offset_running_sum"

  @transient private[this] var acc: Long = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    acc = if (partitionIndex < offsets.length) offsets(partitionIndex) else 0L

  override protected def evalInternal(input: InternalRow): Long = {
    val v = child.eval(input)
    if (v != null) acc += v.asInstanceOf[Long]
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val accTerm = ctx.addMutableState(CodeGenerator.JAVA_LONG, "graftRunSum")
    val arrTerm = ctx.addReferenceObj("graftRunSumOffsets", offsets, "long[]")
    ctx.addPartitionInitializationStatement(
      s"$accTerm = partitionIndex < $arrTerm.length ? $arrTerm[partitionIndex] : 0L;")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      if (!${c.isNull}) { $accTerm += ${c.value}; }
      final ${CodeGenerator.javaType(dataType)} ${ev.value} = $accTerm;""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
