package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Codegen'd random-hyperplane LSH bucketer.
  *
  * The declarative formulation derived each hyperplane sign with a
  * per-row `md5('plane<p>|<dim>')` expression inside a higher-order
  * `transform` lambda. Catalyst does not constant-fold inside lambda
  * bodies (PLANS.md rule), so the executed plan evaluated
  * nPlanes × 64 = 512 md5s PER EMBEDDING ROW — ~100× the cost of the
  * projection itself at scan time. The signs are pure constants: this
  * expression computes the sign matrix ONCE per JVM with the identical
  * md5 recipe (first hex digit of md5("plane<p>|<dim>") ≥ 8 → +1 else
  * −1) and runs a fused multiply-accumulate loop per plane, staying
  * inside whole-stage codegen. Numeric semantics are unchanged — each
  * float widens to double before the multiply, accumulation is
  * left-to-right from 0.0 — so buckets are bit-identical to the old
  * formulation and to the DuckDB oracle.
  */
case class FloatLshBucket(child: Expression, nPlanes: Int, table: Int = 0)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure("float_lsh_bucket expects an array<float> column")
  }

  override def nullSafeEval(input: Any): Any =
    LshExpressions.evalBucket(input.asInstanceOf[ArrayData], nPlanes, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.LshExpressions.evalBucket($c, $nPlanes, $table)")

  override protected def withNewChildInternal(newChild: Expression): FloatLshBucket =
    copy(child = newChild)
}

object LshExpressions {

  /** Sign matrices cached per (plane count, embedding dims), flat
    * row-major [plane * dims + dim]. Computed once per JVM per shape:
    * the old plan paid this md5 cost per ROW. Keyed on the ACTUAL
    * input dimensionality — a fixed Dims=64 silently truncated longer
    * embeddings / zero-filled shorter ones, diverging from both the
    * declarative form and the DuckDB oracle (which iterate
    * range(1, len(e)+1) over the real array length). */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  /** +1/−1 from the first hex digit of md5 over the plane seed — the
    * exact recipe the declarative `planeSign` used, so buckets (and
    * the DuckDB oracle) are unchanged. Table 0 keeps the original
    * seed string "plane<p>|<dim>"; table t > 0 (the multi-table LSH
    * OR-construction) prepends the table index — "t<t>|plane<p>|<dim>"
    * — giving each table an independent sign matrix while leaving
    * every existing single-table bucket bit-identical. */
  def signs(nPlanes: Int, dims: Int, table: Int = 0): Array[Double] =
    signCache.computeIfAbsent((nPlanes, dims, table), { case (np, nd, t) =>
      val out = new Array[Double](np * nd)
      val md = java.security.MessageDigest.getInstance("MD5")
      val prefix = if (t == 0) "" else s"t$t|"
      var p = 0
      while (p < np) {
        var i = 0
        while (i < nd) {
          md.reset()
          val digest = md.digest(s"${prefix}plane$p|$i".getBytes("UTF-8"))
          val firstHexDigit = (digest(0) >> 4) & 0xf
          out(p * nd + i) = if (firstHexDigit >= 8) 1.0 else -1.0
          i += 1
        }
        p += 1
      }
      out
    })

  /** Static entry point invoked from generated code. The loop bound is
    * the input's own length, so every component of every row
    * participates — a 128-dim embedding buckets on all 128 dims, never
    * on a silently-truncated prefix. */
  def evalBucket(arr: ArrayData, nPlanes: Int, table: Int = 0): Int = {
    val n = arr.numElements()
    val s = signs(nPlanes, n, table)
    var bucket = 0
    var p = 0
    while (p < nPlanes) {
      val base = p * n
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += arr.getFloat(i).toDouble * s(base + i)
        i += 1
      }
      if (acc > 0) bucket |= 1 << p
      p += 1
    }
    bucket
  }

  /** Column API: LSH bucket of an array<float> embedding (requires
    * UrlExpressions.register on the session). `table` selects the
    * independent sign matrix of a multi-table OR-construction;
    * table 0 is the original single-table recipe. */
  def float_lsh_bucket(embedding: Column, nPlanes: Int, table: Int = 0): Column =
    call_function("float_lsh_bucket", embedding,
      org.apache.spark.sql.functions.lit(nPlanes),
      org.apache.spark.sql.functions.lit(table))
}
