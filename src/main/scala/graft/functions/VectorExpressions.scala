package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst kernels for the vector hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`, see
  * [[VectorFunctions]]) are CodegenFallback: every pair evaluation walks an
  * interpreted lambda with boxed accumulators. Inside an O(N·Q) similarity
  * join that interpreter cost dominates the query. These expressions
  * generate a tight primitive loop via `doGenCode` instead — the
  * "custom Catalyst Expression beats UDF beats HOF" preference order for
  * exactly this situation (the reference's numpy/faiss kernels,
  * app/vector_search.py:143-205, are the analogous vectorized inner loop).
  *
  * Both inputs may be any numeric array type (the parquet embeddings are
  * ARRAY<FLOAT>, MLlib centroids are ARRAY<DOUBLE>); elements are widened
  * to double. Null elements count as 0. Output is DoubleType.
  */
abstract class VectorKernel extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(t, _) => t.isInstanceOf[NumericType]
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric array inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Interpreted accessor: element i of an ArrayData as double (null=0). */
  protected def get(e: Expression): (ArrayData, Int) => Double = {
    val t = elemType(e)
    t match {
      case FloatType   => (a, i) => if (a.isNullAt(i)) 0.0 else a.getFloat(i).toDouble
      case DoubleType  => (a, i) => if (a.isNullAt(i)) 0.0 else a.getDouble(i)
      case IntegerType => (a, i) => if (a.isNullAt(i)) 0.0 else a.getInt(i).toDouble
      case LongType    => (a, i) => if (a.isNullAt(i)) 0.0 else a.getLong(i).toDouble
      case ShortType   => (a, i) => if (a.isNullAt(i)) 0.0 else a.getShort(i).toDouble
      case ByteType    => (a, i) => if (a.isNullAt(i)) 0.0 else a.getByte(i).toDouble
      case _: DecimalType => (a, i) =>
        if (a.isNullAt(i)) 0.0 else a.getDecimal(i, 38, 18).toDouble
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }
  }

  /** Codegen accessor snippet for element `i` of array variable `arr`. */
  protected def getCode(e: Expression, arr: String, i: String): String = {
    val raw = elemType(e) match {
      case FloatType   => s"(double) $arr.getFloat($i)"
      case DoubleType  => s"$arr.getDouble($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case LongType    => s"(double) $arr.getLong($i)"
      case ShortType   => s"(double) $arr.getShort($i)"
      case ByteType    => s"(double) $arr.getByte($i)"
      case _: DecimalType => s"$arr.getDecimal($i, 38, 18).toDouble()"
      case other => throw new IllegalStateException(s"unsupported element type $other")
    }
    s"($arr.isNullAt($i) ? 0.0d : $raw)"
  }
}

/** Dot product over the common prefix of two numeric arrays. */
case class DotProduct(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (gx, gy) = (get(left), get(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += gx(x, i) * gy(y, i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
       |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
       |double $s = 0.0d;
       |for (int $i = 0; $i < $n; $i++) {
       |  $s += ${getCode(left, x, i)} * ${getCode(right, y, i)};
       |}
       |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity dot(a,b)/(||a||·||b||); 0.0 when either norm is 0
  * (matches the engine's normalize-zero-vectors-as-is convention). Norms
  * are over each full array; the dot is over the common prefix. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (gx, gy) = (get(left), get(right))
    val nx = x.numElements(); val ny = y.numElements()
    val n = math.min(nx, ny)
    var dot = 0.0; var sx = 0.0; var sy = 0.0; var i = 0
    while (i < n) {
      val xi = gx(x, i); val yi = gy(y, i)
      dot += xi * yi; sx += xi * xi; sy += yi * yi; i += 1
    }
    while (i < nx) { val xi = gx(x, i); sx += xi * xi; i += 1 }
    i = n
    while (i < ny) { val yi = gy(y, i); sy += yi * yi; i += 1 }
    if (sx == 0.0 || sy == 0.0) 0.0 else dot / math.sqrt(sx * sy)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val dot = ctx.freshName("dot"); val sx = ctx.freshName("sx"); val sy = ctx.freshName("sy")
      val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
      s"""
       |int $nx = $x.numElements(); int $ny = $y.numElements();
       |int $n = java.lang.Math.min($nx, $ny);
       |double $dot = 0.0d; double $sx = 0.0d; double $sy = 0.0d;
       |int $i = 0;
       |for (; $i < $n; $i++) {
       |  double $xi = ${getCode(left, x, i)};
       |  double $yi = ${getCode(right, y, i)};
       |  $dot += $xi * $yi; $sx += $xi * $xi; $sy += $yi * $yi;
       |}
       |for (; $i < $nx; $i++) { double $xi = ${getCode(left, x, i)}; $sx += $xi * $xi; }
       |for ($i = $n; $i < $ny; $i++) { double $yi = ${getCode(right, y, i)}; $sy += $yi * $yi; }
       |${ev.value} = ($sx == 0.0d || $sy == 0.0d) ? 0.0d : $dot / java.lang.Math.sqrt($sx * $sy);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Squared L2 distance over the common prefix of two numeric arrays. */
case class L2DistanceSq(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (gx, gy) = (get(left), get(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { val d = gx(x, i) - gy(y, i); s += d * d; i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val s = ctx.freshName("s"); val dd = ctx.freshName("dd")
      s"""
       |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
       |double $s = 0.0d;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $dd = ${getCode(left, x, i)} - ${getCode(right, y, i)};
       |  $s += $dd * $dd;
       |}
       |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** The `nprobe` nearest centroids of a vector, by squared L2 distance
  * with ties broken toward the smaller cell id — exactly the ordering of
  * `row_number() over (partition by id order by cdist, cell)`, but
  * evaluated per row against the DRIVER-SIDE centroid matrix instead of
  * cross-joining every row with the centroid table and ranking behind a
  * window Exchange. The window form shuffles N·ncells rows carrying the
  * full vector payload (at ncells=100 that is 100× the corpus bytes —
  * the scale-killer flagged in round 6); this expression keeps cell
  * assignment inside the scan's codegen stage: zero shuffle, ≤ nprobe
  * output cells per row via a bounded insertion-sorted top-k (the same
  * trick faiss's coarse quantizer applies per query,
  * /root/reference/app/vector_search.py:143-165, re-expressed as a
  * Catalyst kernel).
  *
  * Output: ARRAY<INT> of cell ids, ascending by (distance, id). The
  * centroid matrix rides into generated code as a reference object — a
  * few KB for any sane ncells·dim, broadcast with the task closure.
  */
case class NearestCells(child: Expression, centroids: Array[Array[Double]],
    nprobe: Int) extends UnaryExpression {
  require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")

  override def prettyName: String = "graft_nearest_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t.isInstanceOf[NumericType] => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array input, got ${other.catalogString}")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val getD: Int => Double = elemType match {
      case FloatType  => i => if (x.isNullAt(i)) 0.0 else x.getFloat(i).toDouble
      case DoubleType => i => if (x.isNullAt(i)) 0.0 else x.getDouble(i)
      case IntegerType => i => if (x.isNullAt(i)) 0.0 else x.getInt(i).toDouble
      case LongType   => i => if (x.isNullAt(i)) 0.0 else x.getLong(i).toDouble
      case _ => i => if (x.isNullAt(i)) 0.0
        else x.get(i, elemType).asInstanceOf[Number].doubleValue()
    }
    val np = math.min(nprobe, centroids.length)
    val bd = new Array[Double](np); val bi = new Array[Int](np)
    var filled = 0
    var c = 0
    while (c < centroids.length) {
      val cv = centroids(c)
      val n = math.min(x.numElements(), cv.length)
      var dist = 0.0; var j = 0
      while (j < n) { val dd = getD(j) - cv(j); dist += dd * dd; j += 1 }
      // insertion keep-np-smallest; ids ascend, so strict `<` on distance
      // leaves the smaller id ahead on ties — the window's tie-break
      if (filled < np) {
        var k = filled
        while (k > 0 && dist < bd(k - 1)) { bd(k) = bd(k - 1); bi(k) = bi(k - 1); k -= 1 }
        bd(k) = dist; bi(k) = c; filled += 1
      } else if (np > 0 && dist < bd(np - 1)) {
        var k = np - 1
        while (k > 0 && dist < bd(k - 1)) { bd(k) = bd(k - 1); bi(k) = bi(k - 1); k -= 1 }
        bd(k) = dist; bi(k) = c
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(bi, filled))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val elemCode: (String, String) => String = (arr, i) => {
      val raw = elemType match {
        case FloatType   => s"(double) $arr.getFloat($i)"
        case DoubleType  => s"$arr.getDouble($i)"
        case IntegerType => s"(double) $arr.getInt($i)"
        case LongType    => s"(double) $arr.getLong($i)"
        case ShortType   => s"(double) $arr.getShort($i)"
        case ByteType    => s"(double) $arr.getByte($i)"
        case other => throw new IllegalStateException(s"unsupported element type $other")
      }
      s"($arr.isNullAt($i) ? 0.0d : $raw)"
    }
    nullSafeCodeGen(ctx, ev, x => {
      val np = ctx.freshName("np"); val bd = ctx.freshName("bd")
      val bi = ctx.freshName("bi"); val filled = ctx.freshName("filled")
      val c = ctx.freshName("c"); val cv = ctx.freshName("cv")
      val n = ctx.freshName("n"); val dist = ctx.freshName("dist")
      val dd = ctx.freshName("dd"); val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
       |int $np = java.lang.Math.min($nprobe, $cents.length);
       |double[] $bd = new double[$np]; int[] $bi = new int[$np];
       |int $filled = 0;
       |for (int $c = 0; $c < $cents.length; $c++) {
       |  double[] $cv = $cents[$c];
       |  int $n = java.lang.Math.min($x.numElements(), $cv.length);
       |  double $dist = 0.0d;
       |  for (int $j = 0; $j < $n; $j++) {
       |    double $dd = ${elemCode(x, j)} - $cv[$j];
       |    $dist += $dd * $dd;
       |  }
       |  if ($filled < $np) {
       |    int $k = $filled;
       |    while ($k > 0 && $dist < $bd[$k - 1]) { $bd[$k] = $bd[$k - 1]; $bi[$k] = $bi[$k - 1]; $k--; }
       |    $bd[$k] = $dist; $bi[$k] = $c; $filled++;
       |  } else if ($np > 0 && $dist < $bd[$np - 1]) {
       |    int $k = $np - 1;
       |    while ($k > 0 && $dist < $bd[$k - 1]) { $bd[$k] = $bd[$k - 1]; $bi[$k] = $bi[$k - 1]; $k--; }
       |    $bd[$k] = $dist; $bi[$k] = $c;
       |  }
       |}
       |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
       |  java.util.Arrays.copyOf($bi, $filled));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API wrappers for the native kernels. */
object VectorKernels {
  private def e(c: Column): Expression = GraftColumnBridge.expression(c)

  /** Codegen'd dot product (see [[DotProduct]]). */
  def dotFast(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(e(a), e(b)))

  /** Codegen'd cosine similarity (see [[CosineSimilarity]]). */
  def cosineFast(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(e(a), e(b)))

  /** Codegen'd squared L2 distance (see [[L2DistanceSq]]). */
  def l2DistSqFast(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2DistanceSq(e(a), e(b)))

  /** Codegen'd L2 distance. */
  def l2DistFast(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.sqrt(l2DistSqFast(a, b))

  /** Codegen'd nearest-nprobe-cells assignment (see [[NearestCells]]):
    * shuffle-free replacement for the broadcast-cross-join + window
    * centroid ranking. */
  def nearestCellsFast(vec: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column =
    GraftColumnBridge.column(NearestCells(e(vec), centroids, nprobe))
}
