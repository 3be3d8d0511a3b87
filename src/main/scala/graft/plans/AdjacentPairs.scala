package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** (predecessor, word) pairs of one document's non-empty token
  * sequence in one generated pass — entry i is
  * (t_{i-1} | null when i = 0, t_i), so `explode` reproduces the rows
  * of the former posexplode + doc-keyed `lag` window
  * ([[graft.operators.Curation.knContinuationCounts]]) without
  * shuffling the token stream. (An interpreted zip_with formulation
  * was measured slower than the window it replaced in round 6 — the
  * kernel is one tight generated loop.) Null token array → null,
  * dropped by explode like the former posexplode-of-null.
  */
case class AdjacentPairs(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(AdjacentPairs.Entry,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_adjacent_pairs"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs array<string>, got ${other.sql}")
    }

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) null
    else AdjacentPairs.invoke(a.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.plans.AdjacentPairs.invoke(${c.isNull} ? null : ${c.value});
        boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): AdjacentPairs =
    copy(child = newChild)
}

object AdjacentPairs {
  val Entry: StructType = StructType(Seq(
    StructField("prev", StringType, nullable = true),
    StructField("w", StringType, nullable = false)))

  /** Static entry point shared by interpreted and generated code. */
  def invoke(arr: ArrayData): ArrayData = {
    if (arr == null) return null
    val n0 = arr.numElements()
    val toks = new java.util.ArrayList[UTF8String](n0)
    var i = 0
    while (i < n0) {
      val t = arr.getUTF8String(i)
      if (t != null && t.numBytes() > 0) toks.add(t)
      i += 1
    }
    val n = toks.size()
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      // UTF8String values from ArrayData may share buffers; clone so
      // the emitted rows own their bytes
      val w = toks.get(i).clone()
      val prev = if (i == 0) null else out(i - 1)
        .asInstanceOf[GenericInternalRow].get(1, StringType)
      out(i) = new GenericInternalRow(Array[Any](prev, w))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level API (register-on-use, like [[ClassifierScore]]). */
  def adjacent_pairs(tokens: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function(
      "graft_adjacent_pairs", tokens)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_adjacent_pairs", es => AdjacentPairs(es.head), "built-in")
}
