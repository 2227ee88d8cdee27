package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash signature over a token array.
  *
  * The HOF formulation — `transform(tokens, portableHash)` to hash each
  * token, then per bit `aggregate(hl, 0, (acc, h) -> acc + ((h>>b)%2)*2-1)`
  * — evaluates every lambda interpreted (CodegenFallback): bits×tokens
  * virtual dispatches per document (6.2 s of the round-1 bench). This
  * expression fuses BOTH steps into one compiled loop per document:
  * hash token → tally all bit positions, then assemble the signature.
  *
  * Semantics are bit-identical to the HOF form (asserted in
  * SimHashSpec): the token hash is the same portable 60-bit md5 prefix
  * as TextOps.portableHash (first 15 hex digits = first 8 digest bytes
  * big-endian >>> 4), and bit b of the signature is set iff
  * Σ_tokens(((h>>b)%2)*2-1) > 0 — so the DuckDB oracle for the HOF
  * version holds unchanged. Null/absent token entries are not expected
  * (tokenization never yields null elements).
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 64, s"simhash bits must be in [1, 64], got $bits")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash expects array<string>, got ${t.sql}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any): Any =
    SimHash.compute(a.asInstanceOf[ArrayData], bits)

  /** One static call into compiled Scala from inside whole-stage
    * codegen — the loop body is JIT-compiled, no per-element dispatch. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, x =>
      s"graft.functions.expressions.SimHash.compute($x, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** TextOps.portableHash for one token, computed directly: first 15
    * hex digits of md5 = the 60 high bits of the first 8 digest bytes.
    * Matches `conv(substring(md5(s),1,15),16,10)::long` exactly. */
  def hash60(s: UTF8String): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  def compute(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val sums = new Array[Long](bits)
    var i = 0
    while (i < n) {
      // A null element poisons every bit sum in the HOF formulation
      // (NULL in the fold → NULL bitsum → no bit set), yielding
      // signature 0 — mirror that instead of NPE-ing, since `simhash`
      // is exposed as a session-wide SQL function.
      if (arr.isNullAt(i)) return 0L
      val h = hash60(arr.getUTF8String(i))
      var b = 0
      while (b < bits) {
        sums(b) += ((h >> b) % 2L) * 2L - 1L
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (sums(b) > 0L) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Column-API entry point: `simhash(tokens, bits)`. */
  def apply(toks: Column, bits: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHash(org.apache.spark.sql.graft.ColumnBridge.expression(toks), bits))
}
