package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 60-bit portable string hash — the fused form of
  * `conv(substring(md5(s), 1, 15), 16, 10) :: long` (see
  * [[graft.sources.Tables.portableHash]]).
  *
  * The composed form materializes a 32-char hex string, substrings it, and
  * parses base-16 text back to a long — three string allocations per value
  * on paths that hash every shingle of every document. This expression goes
  * digest → long directly: the first 15 hex digits are the high nibbles of
  * the first 8 digest bytes, i.e. `(first8BytesBigEndian >>> 4)`.
  * Bit-identical to the composed form and to the DuckDB oracle fragment
  * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)` (FunctionsSpec pins
  * equality on random inputs).
  */
case class PortableHash60(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_phash"

  override protected def nullSafeEval(input: Any): Any =
    PortableHash60.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortableHash60.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): PortableHash60 =
    copy(child = newChild)
}

object PortableHash60 {

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(utf8(s)) — always non-negative. */
  def hash60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    v >>> 4
  }

  /** Column form (codegen'd). */
  def apply(c: Column): Column =
    GraftColumnBridge.column(PortableHash60(GraftColumnBridge.expression(c)))
}
