package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Runtime-filter probe: `might_contain(bloom, key)` over a bloom
  * sketch built from a join's small side (`DataFrameStatFunctions
  * .bloomFilter`, Spark's public sketch API). Applied as a `Filter` on
  * the fact scan BEFORE the exchange, it drops ~all rows that cannot
  * find a join partner, so shuffle volume is proportional to the
  * match set, not the fact table — the semi-join-reduction /
  * sideways-information-passing pattern the 100 TB path needs when
  * the dim side is too big to broadcast but its key set still fits a
  * few-MB sketch. False positives pass the probe and are eliminated
  * by the exact join that follows, so results are bit-identical to
  * the unfiltered join.
  *
  * Stays inside whole-stage codegen: the generated code is one
  * `mightContainLong` call against a referenced sketch object (no
  * boxing, no UDF). The sketch rides to executors inside the
  * serialized expression via the task closure — the single-JVM analog
  * of the broadcast variable a cluster deployment would use.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint key, got ${child.dataType.catalogString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any = bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpressions {
  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  def mightContain(bloom: BloomFilter, key: Column): Column =
    ColumnBridge.column(
      BloomMightContain(ColumnBridge.expression(key), serialize(bloom)))
}
