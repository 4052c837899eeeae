package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftshim.{columnOf, expressionOf}

/** Winnowing-style document fingerprint: the minimum 64-bit polynomial
  * rolling hash over all `width`-byte windows of the UTF-8 text. Equal
  * fingerprints flag likely shared content (the classic winnowing signal,
  * here the single-minimum variant).
  *
  * Implemented as a native Catalyst expression with real `doGenCode` (the
  * generated code calls the shared static kernel), so fingerprinting 100 TB
  * of documents stays inside whole-stage codegen — no UDF serialization, no
  * boxing per row.
  */
object RollingHashKernel {
  final val Base = 1000003L
  final val Seed = 0x9E3779B97F4A7C15L

  /** Static kernel shared by interpreted eval and generated code. */
  def minRollingHash(s: UTF8String, width: Int): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return Seed
    val w = math.min(width, n)
    // basePowW = Base^w for the remove-leading-byte step
    var basePowW = 1L
    var i = 0
    while (i < w) { basePowW *= Base; i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = h * Base + (bytes(i) & 0xffL); i += 1 }
    var min = h ^ Seed
    i = w
    while (i < n) {
      h = h * Base + (bytes(i) & 0xffL) - basePowW * (bytes(i - w) & 0xffL)
      val m = h ^ Seed
      if (m < min) min = m
      i += 1
    }
    min
  }
}

case class RollingHashMin(child: Expression, width: Int)
    extends UnaryExpression {

  // width is user-supplied on the registered SQL surface: 0 would make
  // every document fingerprint to the constant Seed (all docs flag as
  // shared content, no error anywhere), and a negative width reads
  // bytes(i - w) out of bounds mid-scan. Reject at construction.
  require(width > 0, s"rolling_hash_min width must be positive, got $width")

  override def foldable: Boolean = child.foldable
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    RollingHashKernel.minRollingHash(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashKernel.minRollingHash($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashMin =
    copy(child = newChild)
}

object RollingHash {
  /** Column API: min rolling hash fingerprint of a string column. */
  def rollingHashMin(c: Column, width: Int): Column =
    columnOf(RollingHashMin(expressionOf(c), width))
}
