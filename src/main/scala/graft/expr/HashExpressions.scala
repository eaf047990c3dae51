package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

  /** One-pass distinct shingle hashing: for each of the
    * `max(numChars - len + 1, 1)` shingle positions, hash
    * `prefix || shingle` (prefix carries the "seed:" bytes) and keep
    * first occurrences — byte-identical to
    * `array_distinct(transform(sequence(...), i => md5_prefix56(...)))`
    * but ONE Java loop per row instead of an interpreted higher-order
    * chain with three intermediate arrays.
    */
  def shingleHashes56(text: UTF8String, prefix: Array[Byte], shingleLen: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val d = md.get()
    val bytes = text.getBytes
    val numChars = text.numChars()
    val n = math.max(numChars - shingleLen + 1, 1)
    // char index -> byte offset, so each shingle hashes a byte SLICE of
    // the one text copy (no per-shingle UTF8String/byte[] allocation).
    // ASCII fast path: offsets are the identity.
    val ascii = bytes.length == numChars
    val offsets = if (ascii) null else {
      val o = new Array[Int](numChars + 1)
      var ci = 0; var bi = 0
      while (bi < bytes.length) {
        o(ci) = bi
        ci += 1
        bi += UTF8String.numBytesForFirstByte(bytes(bi))
      }
      o(numChars) = bytes.length
      o
    }
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n)
    var m = 0
    var i = 0
    while (i < n) {
      val endChar = math.min(i + shingleLen, numChars)
      val (start, end) =
        if (ascii) (i, endChar) else (offsets(i), offsets(endChar))
      d.reset()
      d.update(prefix)
      d.update(bytes, start, end - start)
      val h = d.digest()
      val v = ((h(0) & 0xffL) << 48) | ((h(1) & 0xffL) << 40) | ((h(2) & 0xffL) << 32) |
        ((h(3) & 0xffL) << 24) | ((h(4) & 0xffL) << 16) | ((h(5) & 0xffL) << 8) |
        (h(6) & 0xffL)
      if (seen.add(v)) { out(m) = v; m += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  private val tokenPattern = java.util.regex.Pattern.compile("[a-z0-9]+")

  /** 56-bit SimHash of a text in one pass: lowercase (UTF8String
    * semantics, same as Spark's `lower`), tokenize on `[a-z0-9]+`
    * (same as `regexp_extract_all`), hash each occurrence with the
    * prefixed md5-56 ([[md5Prefix56]]), vote ±1 per bit, sign-pack.
    * Frequency-weighted exactly like the composed
    * explode → groupBy(doc) → 56 conditional sums form; returns null
    * when the text has NO tokens — the composed group-by drops such
    * docs, so callers filter nulls to match.
    */
  def simHash56(text: UTF8String, prefix: Array[Byte]): java.lang.Long = {
    val d = md.get()
    val matcher = tokenPattern.matcher(text.toLowerCase.toString)
    val votes = new Array[Int](56)
    var any = false
    while (matcher.find()) {
      any = true
      d.reset()
      d.update(prefix)
      d.update(matcher.group().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = d.digest()
      val v = ((h(0) & 0xffL) << 48) | ((h(1) & 0xffL) << 40) | ((h(2) & 0xffL) << 32) |
        ((h(3) & 0xffL) << 24) | ((h(4) & 0xffL) << 16) | ((h(5) & 0xffL) << 8) |
        (h(6) & 0xffL)
      var b = 0
      while (b < 56) {
        if (((v >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    if (!any) null
    else {
      var sig = 0L
      var b = 0
      while (b < 56) {
        if (votes(b) > 0) sig |= (1L << b)
        b += 1
      }
      java.lang.Long.valueOf(sig)
    }
  }

  /** All k minhashes in ONE traversal of the shingle-hash array:
    * element s is `min over hs of mix(h, keys(s))` — the same value as
    * k separate `array_min(transform(hs, mix(_, s)))` columns, without
    * k interpreted array traversals + k intermediate arrays per row.
    * The mix body mirrors graft.llm.TextHash.mix exactly (inputs stay
    * < 2^56, so arithmetic >> equals logical >>).
    */
  def minHash56(arr: org.apache.spark.sql.catalyst.util.ArrayData, keys: Array[Long]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    val k = keys.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var s = 0
      while (s < k) {
        var v = h ^ keys(s)
        v ^= (v >> 29)
        v ^= ((v & ((1L << 42) - 1)) << 13)
        v ^= (v >> 17)
        if (v < mins(s)) mins(s) = v
        s += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
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

/** Native distinct-shingle-hash array of a string column (see
  * [[HashUtil.shingleHashes56]]) — value-identical to the composed
  * `array_distinct(transform(sequence ...))` form (asserted in
  * HashParitySpec), one codegen'd call per row.
  */
case class ShingleHashes56(child: Expression, seed: Int, shingleLen: Int)
    extends UnaryExpression {

  private lazy val prefixBytes = s"$seed:".getBytes("UTF-8")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes56 expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes56"

  override def nullSafeEval(v: Any): Any =
    HashUtil.shingleHashes56(v.asInstanceOf[UTF8String], prefixBytes, shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("shinglePrefix", prefixBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.HashUtil.shingleHashes56($c, $prefixRef, $shingleLen)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native k-seed MinHash of a long-array column (see
  * [[HashUtil.minHash56]]) — value-identical to k composed
  * `array_min(transform(hs, mix(_, s)))` columns.
  */
case class MinHash56(child: Expression, keys: Array[Long]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash56 expects array<bigint>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash56"

  override def nullSafeEval(v: Any): Any =
    HashUtil.minHash56(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], keys)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keysRef = ctx.addReferenceObj("minhashKeys", keys, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.expr.HashUtil.minHash56($c, $keysRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native one-pass 56-bit SimHash of a string column (see
  * [[HashUtil.simHash56]]) — value-identical to the composed
  * explode-words → 56-conditional-sums aggregate, but entirely
  * MAP-SIDE: signature generation needs no explode and no shuffle.
  * Nullable: texts with no `[a-z0-9]+` token yield null (the composed
  * group-by would drop them).
  */
case class SimHash56(child: Expression, seed: Int) extends UnaryExpression {

  private lazy val prefixBytes = s"$seed:".getBytes("UTF-8")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash56 expects string, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash56"

  override def nullSafeEval(v: Any): Any =
    HashUtil.simHash56(v.asInstanceOf[UTF8String], prefixBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("simhashPrefix", prefixBytes, "byte[]")
    val boxed = ctx.freshName("simhashBoxed")
    nullSafeCodeGen(ctx, ev, c =>
      s"""java.lang.Long $boxed = graft.expr.HashUtil.simHash56($c, $prefixRef);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  def md5Prefix56(c: Column): Column =
    ColumnBridge.column(Md5Prefix56(ColumnBridge.expression(c)))

  def simHash56(c: Column, seed: Int): Column =
    ColumnBridge.column(SimHash56(ColumnBridge.expression(c), seed))

  def shingleHashes56(c: Column, seed: Int, shingleLen: Int): Column =
    ColumnBridge.column(ShingleHashes56(ColumnBridge.expression(c), seed, shingleLen))

  def minHash56(c: Column, keys: Array[Long]): Column =
    ColumnBridge.column(MinHash56(ColumnBridge.expression(c), keys))
}
