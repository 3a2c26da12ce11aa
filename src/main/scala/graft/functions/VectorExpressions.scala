package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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
}
