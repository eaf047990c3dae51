package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` embedding columns — the one deliberate Expression
  * extension (SURVEY.md §7.4): the ANN/dedup hot path evaluates this
  * per candidate pair, so it must stay inside whole-stage codegen.
  * A `zip_with`+`aggregate` composition allocates an intermediate array
  * per row; this emits a single fused loop.
  *
  * Accumulation is double-precision in index order — bit-compatible
  * with DuckDB's `list_cosine_similarity(a::DOUBLE[], b::DOUBLE[])`
  * oracle. Returns NULL when either vector has zero norm; array nulls
  * are not expected (embeddings are dense).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  /** Each side is independently array<float> or array<double> (Lloyd
    * centroids are computed doubles while embeddings stay float);
    * float elements widen to double exactly, so mixing types loses
    * nothing and keeps both array layouts un-copied.
    */
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (Seq(left, right).forall(e => elemOk(e.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float|double> on each side, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xf, yf) = (isFloatArr(left), isFloatArr(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // every local via freshName: two instances of this expression can
      // land in ONE whole-stage-codegen scope (e.g. d08's assign+score),
      // and fixed names collide -> Janino error -> interpreter fallback
      val n   = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx  = ctx.freshName("nx")
      val ny  = ctx.freshName("ny")
      val i   = ctx.freshName("i")
      val xv  = ctx.freshName("xv")
      val yv  = ctx.freshName("yv")
      val getX = if (isFloatArr(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (isFloatArr(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $getX;
         |  double $yv = $getY;
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native argmin-by-squared-L2 over a (usually literal) codebook —
  * the PQ (product-quantization) encode/assign hot path. For each row
  * it returns the index of the codebook entry with the smallest
  * ordered-fold squared distance to the subvector (ties → lowest
  * index). One fused K×dim loop inside whole-stage codegen; the
  * `zip_with`+`aggregate`-per-code composition this replaces is
  * interpreted (HigherOrderFunction) and allocates K arrays per row —
  * measured 2× slower than even the shuffle-heavy window-argmin it
  * was meant to beat.
  *
  * Distance accumulation is double-precision in index order with a
  * 0.0 seed — bit-identical to the DuckDB oracle's unrolled
  * left-associated `(a[1]-b[1])*(a[1]-b[1]) + …` sum.
  */
case class PqNearestCode(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = left.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    val cbOk = right.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vecOk && cbOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_nearest_code expects (array<float|double>, array<array<double>>), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "pq_nearest_code"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cb = b.asInstanceOf[ArrayData]
    val vf = isFloatArr(left)
    var best = 0; var bestD = Double.PositiveInfinity
    var k = 0
    while (k < cb.numElements()) {
      val ce = cb.getArray(k)
      val n = math.min(v.numElements(), ce.numElements())
      var d = 0.0; var i = 0
      while (i < n) {
        val xv = if (vf) v.getFloat(i).toDouble else v.getDouble(i)
        val t = xv - ce.getDouble(i)
        d += t * t
        i += 1
      }
      if (d < bestD) { bestD = d; best = k }
      k += 1
    }
    java.lang.Integer.valueOf(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val best  = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val k     = ctx.freshName("k")
      val ce    = ctx.freshName("ce")
      val n     = ctx.freshName("n")
      val d     = ctx.freshName("d")
      val i     = ctx.freshName("i")
      val t     = ctx.freshName("t")
      val getX = if (isFloatArr(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $best = 0;
         |double $bestD = Double.POSITIVE_INFINITY;
         |for (int $k = 0; $k < $b.numElements(); $k++) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $ce = $b.getArray($k);
         |  int $n = java.lang.Math.min($a.numElements(), $ce.numElements());
         |  double $d = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $t = $getX - $ce.getDouble($i);
         |    $d += $t * $t;
         |  }
         |  if ($d < $bestD) { $bestD = $d; $best = $k; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native two-pointer intersection COUNT over two SORTED `array<long>`
  * columns — the exact set-similarity verify hot path (d37 runs it per
  * candidate pair). `array_intersect` is semantically right but builds
  * an OpenHashSet AND materializes the intersection array per row just
  * to take its size; this emits one fused merge loop inside
  * whole-stage codegen: no allocation, O(|a|+|b|), early-exit when
  * either side drains. CALLER CONTRACT: both arrays sorted ascending
  * and deduplicated (`sort_array` on the staged distinct-hash arrays)
  * — unsorted input silently undercounts, so the d37 spec pins
  * equality against `size(array_intersect(...))` on the same rows.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  // CALLER CONTRACT (alongside sortedness): element slots must be
  // NON-NULL — the two-pointer loop reads via getLong, which decodes a
  // null slot as 0 and would silently corrupt the count. The schema
  // check cannot enforce this (parquet read-back reports
  // containsNull=true even for arrays written from containsNull=false
  // producers), so it is a contract: every caller feeds shingle-hash
  // arrays whose producer ([[graft.expr.ShingleHashes56]]) cannot emit
  // null elements.
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (Seq(left, right).forall(e => elemOk(e.dataType))) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count expects array<bigint> on each side, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    java.lang.Integer.valueOf(c)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i  = ctx.freshName("i")
      val j  = ctx.freshName("j")
      val c  = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements(), $ny = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-level cosine similarity between two array<float> columns. */
  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Index of the nearest codebook entry (squared L2, ties → lowest). */
  def pqNearestCode(vec: Column, codebook: Column): Column =
    ColumnBridge.column(PqNearestCode(ColumnBridge.expression(vec), ColumnBridge.expression(codebook)))

  /** Intersection count of two SORTED dedup'd array<long> columns. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
