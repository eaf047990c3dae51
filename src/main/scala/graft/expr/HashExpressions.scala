package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls into. */
object HashUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 56 bits (7 bytes, big-endian) of md5(bytes) — numerically
    * identical to parsing the first 14 hex digits of the digest, i.e.
    * to DuckDB `('0x'||substr(md5(s),1,14))::BIGINT` and to Spark SQL
    * `conv(substring(md5(s),1,14),16,10)`.
    */
  def md5Prefix56(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 48) | ((h(1) & 0xffL) << 40) | ((h(2) & 0xffL) << 32) |
      ((h(3) & 0xffL) << 24) | ((h(4) & 0xffL) << 16) | ((h(5) & 0xffL) << 8) |
      (h(6) & 0xffL)
  }

  def md5Prefix56(s: UTF8String): Long = md5Prefix56(s.getBytes)
}

/** Native 56-bit md5-prefix hash of a string column — the portable-hash
  * spine of the dedup/fingerprint operators (graft.llm.TextHash),
  * evaluated millions of times per query. Skips the hex-string
  * materialization + `conv` base parse of the composed form: one digest,
  * seven byte shifts, still inside whole-stage codegen.
  */
case class Md5Prefix56(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix56 expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix56"

  override def nullSafeEval(v: Any): Any =
    HashUtil.md5Prefix56(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashUtil.md5Prefix56($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  def md5Prefix56(c: Column): Column =
    ColumnBridge.column(Md5Prefix56(ColumnBridge.expression(c)))
}
