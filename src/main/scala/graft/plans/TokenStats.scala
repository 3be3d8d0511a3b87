package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression counting, in ONE pass over a string
  * array, the non-empty elements and how many of them belong to a
  * foldable membership list:
  *
  *   n_tokens = size(filter(arr, x -> length(x) > 0))
  *   n_hits   = size(filter(arr, x -> length(x) > 0 AND x IN (list)))
  *
  * — bit-identical to the two-HOF Catalyst statement (`filter` is
  * CodegenFallback, so the statement above evaluated the upstream
  * tokenizing `split` once per filter parent with interpreted lambda
  * dispatch per element; same rationale as [[ClassifierScore]]).
  * Membership is exact binary string equality, as in `isin`. Null
  * array → null struct (size(null) null-poisons the original); null
  * elements are dropped like empties (length(null) > 0 is not true).
  */
case class TokenStats(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = TokenStats.Schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_token_stats"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _))
          if right.foldable =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs (array<string>, foldable array<string>), got " +
            s"(${left.dataType.sql}, ${right.dataType.sql})")
    }

  @transient private lazy val memberSet: java.util.HashSet[UTF8String] = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String]()
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        val v = arr.getUTF8String(i)
        if (v != null) s.add(v)
        i += 1
      }
    }
    s
  }

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) null
    else TokenStats.invoke(a.asInstanceOf[ArrayData], memberSet)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = left.genCode(ctx)
    val setRef = ctx.addReferenceObj("memberSet", memberSet,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    ev.copy(
      code = code"""
        ${l.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          graft.plans.TokenStats.invoke(${l.isNull} ? null : ${l.value}, $setRef);
        boolean ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenStats =
    copy(left = newLeft, right = newRight)
}

object TokenStats {
  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_hits", IntegerType, nullable = false)))

  /** Static entry point shared by interpreted and generated code. */
  def invoke(arr: ArrayData,
             members: java.util.HashSet[UTF8String]): InternalRow = {
    if (arr == null) return null
    val len = arr.numElements()
    var n = 0
    var hits = 0
    var i = 0
    while (i < len) {
      val t = arr.getUTF8String(i)
      if (t != null && t.numBytes() > 0) {
        n += 1
        if (members.contains(t)) hits += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, hits))
  }

  /** Column-level API (register-on-use, like [[ClassifierScore]]). */
  def token_stats(arr: Column, members: Column): Column = {
    register(org.apache.spark.sql.SparkSession.active)
    org.apache.spark.sql.functions.call_function(
      "graft_token_stats", arr, members)
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_stats", es => TokenStats(es.head, es(1)), "built-in")
}
