package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused form of the engine-portable 56-bit hash
  * `conv(substring(md5(c), 1, 14), 16, 10) :: bigint`
  * ([[Hashing.hexLong]]) — bit-identical by construction: the first 14
  * hex digits of an md5 ARE its first 7 digest bytes, so the value is
  * the big-endian fold of those bytes, no hex round-trip required.
  *
  * Why native: the composable chain materializes a 32-char hex
  * UTF8String (Md5), slices it (Substring), renders the value as a
  * DECIMAL STRING (Conv — its output type is string), and re-parses
  * that string (Cast) — four expression nodes and three string
  * allocations per evaluation for what is one digest and a 7-byte fold.
  * This hash sits under EVERY deterministic-sampling gate, all
  * `numPerm` MinHash permutations per shingle, and the q86 replica
  * checksum, so the per-call constant multiplies by corpus × perms.
  * The digest object is thread-local (MessageDigest is stateful and
  * not shareable across codegen'd tasks in one executor JVM).
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_long56 expects a string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long56"

  override def nullSafeEval(s: Any): Any =
    Md5Long.hash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5Long {
  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Big-endian fold of the first 7 md5 digest bytes == parse of the
    * first 14 hex digits (non-negative, fits a signed long). */
  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    ((digest(0) & 0xffL) << 48) | ((digest(1) & 0xffL) << 40) |
      ((digest(2) & 0xffL) << 32) | ((digest(3) & 0xffL) << 24) |
      ((digest(4) & 0xffL) << 16) | ((digest(5) & 0xffL) << 8) |
      (digest(6) & 0xffL)
  }
}
