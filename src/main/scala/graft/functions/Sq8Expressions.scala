package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native kernels for the SQ8-under-IVF tier (faiss
  * `IVF…,SQ8` parity — reference ships `IVF100,Flat`, .env:7; SQ8 is
  * the standard next notch when corpus bytes dominate).
  *
  * The scalar-quantized corpus representation here is a BINARY column —
  * one unsigned byte per dimension — so the candidate join of an IVF
  * probe ships dim bytes per row instead of dim floats/doubles: the
  * true 4×/8× payload compression, not an ARRAY<INT> that would round
  * the win away in Tungsten headers. Quantization math is EXACTLY
  * operators.Ann.sq8Codes / sq8Reconstructed (same expression order, so
  * doubles match bit-for-bit — AnnSpec gates code equality against the
  * oracle-checked q176 relation); the per-dim (lo, hi) ranges ride into
  * generated code as reference objects like NearestCells' centroid
  * matrix (a few KB).
  */
private[functions] object Sq8Kernel {
  /** Shared codegen helper: numeric-array element `i` as double. */
  def elemAsDouble(t: DataType, arr: String, i: String): String = {
    val raw = t match {
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
}

/** SQ8 encode: numeric array → BINARY codes.
  * code_i = hi==lo ? 0 : clamp(⌊(x−lo)·256/(hi−lo)⌋, 0, 255), stored as
  * one (unsigned) byte per dimension — byte-for-byte the q176 contract. */
case class Sq8Encode(child: Expression, lo: Array[Double], hi: Array[Double])
    extends UnaryExpression with Serializable {
  require(lo.length == hi.length, "lo/hi range tables must align")

  override def prettyName: String = "graft_sq8_encode"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t.isInstanceOf[NumericType] => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a numeric array input, got ${other.catalogString}")
  }

  private def elemType: DataType = child.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), lo.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else elemType match {
        case FloatType  => x.getFloat(i).toDouble
        case DoubleType => x.getDouble(i)
        case _ => x.get(i, elemType).asInstanceOf[Number].doubleValue()
      }
      val c =
        if (hi(i) == lo(i)) 0L
        else math.min(255L, math.max(0L,
          math.floor((xi - lo(i)) * 256 / (hi(i) - lo(i))).toLong))
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sq8lo", lo, "double[]")
    val hiRef = ctx.addReferenceObj("sq8hi", hi, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val xi = ctx.freshName("xi")
      val c = ctx.freshName("c")
      s"""
       |int $n = java.lang.Math.min($x.numElements(), $loRef.length);
       |byte[] $out = new byte[$n];
       |for (int $i = 0; $i < $n; $i++) {
       |  double $xi = ${Sq8Kernel.elemAsDouble(elemType, x, i)};
       |  long $c = ($hiRef[$i] == $loRef[$i]) ? 0L :
       |    java.lang.Math.min(255L, java.lang.Math.max(0L,
       |      (long) java.lang.Math.floor(($xi - $loRef[$i]) * 256 / ($hiRef[$i] - $loRef[$i]))));
       |  $out[$i] = (byte) $c;
       |}
       |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric SQ8 cosine: raw numeric-array query vs BINARY corpus
  * codes, reconstructed mid-cell on the fly —
  * x̂_i = hi==lo ? lo : lo + (code+0.5)·(hi−lo)/256 — inside one fused
  * loop (never materializing the reconstructed doubles). Identical
  * arithmetic order to sq8Reconstructed + CosineSimilarity, so the
  * score matches the oracle-checked q177 compose bit-for-bit. */
case class Sq8CosineRecon(left: Expression, right: Expression,
    lo: Array[Double], hi: Array[Double]) extends BinaryExpression {
  require(lo.length == hi.length, "lo/hi range tables must align")

  override def prettyName: String = "graft_sq8_cosine"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(t, _), BinaryType) if t.isInstanceOf[NumericType] =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (numeric array, binary), got ${l.catalogString} / ${r.catalogString}")
  }

  private def elemType: DataType = left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[Array[Byte]]
    val nx = x.numElements(); val ny = math.min(codes.length, lo.length)
    val n = math.min(nx, ny)
    var dot = 0.0; var sx = 0.0; var sy = 0.0; var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0 else elemType match {
        case FloatType  => x.getFloat(i).toDouble
        case DoubleType => x.getDouble(i)
        case _ => x.get(i, elemType).asInstanceOf[Number].doubleValue()
      }
      val code = codes(i) & 0xff
      val yi = if (hi(i) == lo(i)) lo(i) else lo(i) + (code + 0.5) * (hi(i) - lo(i)) / 256
      dot += xi * yi; sx += xi * xi; sy += yi * yi; i += 1
    }
    while (i < nx) {
      val xi = if (x.isNullAt(i)) 0.0 else elemType match {
        case FloatType  => x.getFloat(i).toDouble
        case DoubleType => x.getDouble(i)
        case _ => x.get(i, elemType).asInstanceOf[Number].doubleValue()
      }
      sx += xi * xi; i += 1
    }
    i = n
    while (i < ny) {
      val code = codes(i) & 0xff
      val yi = if (hi(i) == lo(i)) lo(i) else lo(i) + (code + 0.5) * (hi(i) - lo(i)) / 256
      sy += yi * yi; i += 1
    }
    if (sx == 0.0 || sy == 0.0) 0.0 else dot / math.sqrt(sx * sy)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val loRef = ctx.addReferenceObj("sq8lo", lo, "double[]")
    val hiRef = ctx.addReferenceObj("sq8hi", hi, "double[]")
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy"); val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi"); val code = ctx.freshName("code")
      s"""
       |int $nx = $x.numElements();
       |int $ny = java.lang.Math.min($y.length, $loRef.length);
       |int $n = java.lang.Math.min($nx, $ny);
       |double $dot = 0.0d; double $sx = 0.0d; double $sy = 0.0d;
       |int $i = 0;
       |for (; $i < $n; $i++) {
       |  double $xi = ${Sq8Kernel.elemAsDouble(elemType, x, i)};
       |  int $code = $y[$i] & 0xff;
       |  double $yi = ($hiRef[$i] == $loRef[$i]) ? $loRef[$i] :
       |    $loRef[$i] + ($code + 0.5d) * ($hiRef[$i] - $loRef[$i]) / 256;
       |  $dot += $xi * $yi; $sx += $xi * $xi; $sy += $yi * $yi;
       |}
       |for (; $i < $nx; $i++) {
       |  double $xi = ${Sq8Kernel.elemAsDouble(elemType, x, i)};
       |  $sx += $xi * $xi;
       |}
       |for ($i = $n; $i < $ny; $i++) {
       |  int $code = $y[$i] & 0xff;
       |  double $yi = ($hiRef[$i] == $loRef[$i]) ? $loRef[$i] :
       |    $loRef[$i] + ($code + 0.5d) * ($hiRef[$i] - $loRef[$i]) / 256;
       |  $sy += $yi * $yi;
       |}
       |${ev.value} = ($sx == 0.0d || $sy == 0.0d) ? 0.0d : $dot / java.lang.Math.sqrt($sx * $sy);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API wrappers. */
object Sq8Kernels {
  private def e(c: Column): Expression = GraftColumnBridge.expression(c)

  /** Codegen'd SQ8 encode to BINARY (see [[Sq8Encode]]). */
  def sq8EncodeFast(vec: Column, lo: Array[Double], hi: Array[Double]): Column =
    GraftColumnBridge.column(Sq8Encode(e(vec), lo, hi))

  /** Codegen'd asymmetric SQ8 cosine (see [[Sq8CosineRecon]]). */
  def sq8CosineFast(q: Column, codes: Column, lo: Array[Double],
      hi: Array[Double]): Column =
    GraftColumnBridge.column(Sq8CosineRecon(e(q), e(codes), lo, hi))
}
