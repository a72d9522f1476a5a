package graft.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.UrlFunctions

/** Codegen'd URL scalar expressions (SURVEY.md §4.3 optional item):
  * native Catalyst expressions instead of Scala UDFs, so host
  * extraction in the crawl's repartition key stays inside whole-stage
  * codegen (no udf ser/de, null handling for free).
  *
  * Spark 4 seals the Column↔Expression bridge, so the expressions are
  * surfaced the public way: registered into the session function
  * registry and invoked via `call_function`.
  */
object UrlExpressions {

  /** Static entry points invoked from generated code. */
  def evalHostOf(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlFunctions.hostOf(u.toString))
  def evalOriginOf(u: UTF8String): UTF8String =
    UTF8String.fromString(UrlFunctions.originOf(u.toString))

  /** Idempotent per-session registration of all graft expressions. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "host_of", exprs => HostOf(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "origin_of", exprs => OriginOf(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "float_dot", exprs => FloatDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "float_lsh_bucket", exprs => {
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression, what: String) =
          e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other => throw new IllegalArgumentException(
              s"float_lsh_bucket $what must be an int literal, got $other")
          }
        val nPlanes = intLit(exprs(1), "plane count")
        val table = if (exprs.length > 2) intLit(exprs(2), "table index") else 0
        FloatLshBucket(exprs(0), nPlanes, table)
      }, "built-in")
  }

  /** Column API: host of an absolute URL (requires register()). */
  def host_of(c: Column): Column = call_function("host_of", c)

  /** Column API: scheme+authority origin (requires register()). */
  def origin_of(c: Column): Column = call_function("origin_of", c)
}

/** `host_of(url)`: authority of an absolute URL (null-safe, codegen'd). */
case class HostOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("host_of expects a string column")
  override def nullSafeEval(input: Any): Any =
    UrlExpressions.evalHostOf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UrlExpressions.evalHostOf($c)")
  override protected def withNewChildInternal(newChild: Expression): HostOf =
    copy(child = newChild)
}

/** `origin_of(url)`: scheme+authority prefix (null-safe, codegen'd). */
case class OriginOf(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("origin_of expects a string column")
  override def nullSafeEval(input: Any): Any =
    UrlExpressions.evalOriginOf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.UrlExpressions.evalOriginOf($c)")
  override protected def withNewChildInternal(newChild: Expression): OriginOf =
    copy(child = newChild)
}
