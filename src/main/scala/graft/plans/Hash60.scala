package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit stable hash: the first 60 bits of MD5(value), as a
  * non-negative Long.
  *
  * Value-identical to `conv(substr(md5(c), 1, 15), 16, 10)` (the form the
  * DuckDB oracle reproduces as `('0x' || substr(md5(x),1,15))::BIGINT`),
  * but computed straight from the digest bytes with whole-stage codegen —
  * no hex string materialization, no base conversion, no per-call
  * MessageDigest allocation. This sits in the hot path of every
  * shingle/minhash/simhash/fingerprint operator, where the engine does
  * O(tokens) hashes per document at corpus scale.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hashUTF8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hash60.hashUTF8($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

object Hash60 {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of MD5 — i.e. the 8 leading digest bytes big-endian,
    * unsigned-shifted right by 4 (15 hex chars = 7.5 bytes).
    */
  def hashUTF8(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    top >>> 4
  }

  def apply(c: Column): Column =
    GraftBridge.column(Hash60(GraftBridge.expression(c)))
}
