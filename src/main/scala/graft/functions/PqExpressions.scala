package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Product-quantization kernels — the vector-compression tier that makes
  * ANN feasible at 100 TB: a d-float vector becomes m small codes
  * (one per subspace), so the corpus side of a search shuffles m bytes
  * per row instead of d floats, and each candidate distance is m table
  * lookups instead of d multiplies (asymmetric distance computation).
  * This is the standard "IVFx,PQy" scale path of the reference's own
  * index-factory vocabulary (app/vector_search.py:40-47 builds factory
  * strings; the shipped default is IVF100,Flat — PQ is what that factory
  * produces when the corpus no longer fits flat).
  *
  * The codebook rides along as a flat ARRAY<DOUBLE> literal of length
  * m*k*sub laid out [subspace][code][dim] (tiny: 8 subspaces x 16 codes
  * x 8 dims = 1k doubles), so all three kernels stay inside whole-stage
  * codegen with no driver state.
  */

/** codes[j] = argmin_c L2(vec_subj, codebook[j][c]) — one code per
  * subspace. Output ARRAY<INT> of length m. */
case class PqEncode(left: Expression, right: Expression, m: Int, k: Int)
    extends VectorKernel {
  override def prettyName: String = "graft_pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (v, cb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (gv, gc) = (get(left), get(right))
    val sub = v.numElements() / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.MaxValue; var bi = 0; var c = 0
      while (c < k) {
        var s = 0.0; var i = 0; val base = (j * k + c) * sub
        while (i < sub) {
          val diff = gv(v, j * sub + i) - gc(cb, base + i)
          s += diff * diff; i += 1
        }
        if (s < best) { best = s; bi = c }
        c += 1
      }
      codes(j) = bi; j += 1
    }
    new GenericArrayData(codes)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val sub = ctx.freshName("sub"); val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val bi = ctx.freshName("bi")
      val s = ctx.freshName("s"); val diff = ctx.freshName("diff"); val base = ctx.freshName("base")
      s"""
       |int $sub = $v.numElements() / $m;
       |int[] $codes = new int[$m];
       |for (int $j = 0; $j < $m; $j++) {
       |  double $best = Double.MAX_VALUE; int $bi = 0;
       |  for (int $c = 0; $c < $k; $c++) {
       |    double $s = 0.0d; int $base = ($j * $k + $c) * $sub;
       |    for (int $i = 0; $i < $sub; $i++) {
       |      double $diff = ${getCode(left, v, s"($j * $sub + $i)")} -
       |        ${getCode(right, cb, s"($base + $i)")};
       |      $s += $diff * $diff;
       |    }
       |    if ($s < $best) { $best = $s; $bi = $c; }
       |  }
       |  $codes[$j] = $bi;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Per-query ADC distance table: table[j*k + c] = L2^2(query_subj,
  * codebook[j][c]). Output ARRAY<DOUBLE> of length m*k, computed once
  * per query row and reused for every candidate. */
case class PqDistTable(left: Expression, right: Expression, m: Int, k: Int)
    extends VectorKernel {
  override def prettyName: String = "graft_pq_dist_table"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (v, cb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (gv, gc) = (get(left), get(right))
    val sub = v.numElements() / m
    val tbl = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var s = 0.0; var i = 0; val base = (j * k + c) * sub
        while (i < sub) {
          val diff = gv(v, j * sub + i) - gc(cb, base + i)
          s += diff * diff; i += 1
        }
        tbl(j * k + c) = s; c += 1
      }
      j += 1
    }
    new GenericArrayData(tbl)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb) => {
      val sub = ctx.freshName("sub"); val tbl = ctx.freshName("tbl")
      val j = ctx.freshName("j"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val diff = ctx.freshName("diff"); val base = ctx.freshName("base")
      s"""
       |int $sub = $v.numElements() / $m;
       |double[] $tbl = new double[$m * $k];
       |for (int $j = 0; $j < $m; $j++) {
       |  for (int $c = 0; $c < $k; $c++) {
       |    double $s = 0.0d; int $base = ($j * $k + $c) * $sub;
       |    for (int $i = 0; $i < $sub; $i++) {
       |      double $diff = ${getCode(left, v, s"($j * $sub + $i)")} -
       |        ${getCode(right, cb, s"($base + $i)")};
       |      $s += $diff * $diff;
       |    }
       |    $tbl[$j * $k + $c] = $s;
       |  }
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($tbl);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Approximate squared L2 distance of a query (via its dist table) to a
  * PQ-coded vector: sum_j table[j*k + codes[j]] — the ADC hot loop, m
  * adds per candidate pair. k is inferred from the array lengths. */
case class AdcDistance(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "graft_adc_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (tbl, codes) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (gt, gc) = (get(left), get(right))
    val m = codes.numElements()
    if (m == 0) 0.0
    else {
      val k = tbl.numElements() / m
      var s = 0.0; var j = 0
      while (j < m) { s += gt(tbl, j * k + gc(codes, j).toInt); j += 1 }
      s
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (tbl, codes) => {
      val m = ctx.freshName("m"); val k = ctx.freshName("k")
      val s = ctx.freshName("s"); val j = ctx.freshName("j")
      s"""
       |int $m = $codes.numElements();
       |double $s = 0.0d;
       |if ($m > 0) {
       |  int $k = $tbl.numElements() / $m;
       |  for (int $j = 0; $j < $m; $j++) {
       |    $s += ${getCode(left, tbl, s"($j * $k + (int) ${getCode(right, codes, j)})")};
       |  }
       |}
       |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** L2-normalize a numeric array in one codegen pass (unit output;
  * zero vectors pass through). The HOF form ([[VectorFunctions.l2Normalize]])
  * re-evaluates the norm sub-expression per element when an optimizer
  * rule inlines it — this kernel computes the norm once per row. Both
  * children are the SAME array (a unary op expressed over the binary
  * kernel base so the accessor helpers are reused); use the wrapper. */
case class L2NormalizeArray(left: Expression, right: Expression) extends VectorKernel {
  override def prettyName: String = "graft_l2_normalize"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val gv = get(left)
    val n = v.numElements()
    var s = 0.0; var i = 0
    while (i < n) { val x = gv(v, i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = if (norm == 0.0) gv(v, i) else gv(v, i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val x = ctx.freshName("x")
      val nrm = ctx.freshName("nrm"); val out = ctx.freshName("out")
      s"""
       |int $n = $v.numElements();
       |double $s = 0.0d;
       |for (int $i = 0; $i < $n; $i++) {
       |  double $x = ${getCode(left, v, i)}; $s += $x * $x;
       |}
       |double $nrm = java.lang.Math.sqrt($s);
       |double[] $out = new double[$n];
       |for (int $i = 0; $i < $n; $i++) {
       |  $out[$i] = ($nrm == 0.0d) ? ${getCode(left, v, i)} : ${getCode(left, v, i)} / $nrm;
       |}
       |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column-API wrappers for the PQ kernels. */
object PqKernels {
  private def e(c: Column): Expression = GraftColumnBridge.expression(c)

  def pqEncodeFast(vec: Column, codebook: Column, m: Int, k: Int): Column =
    GraftColumnBridge.column(PqEncode(e(vec), e(codebook), m, k))

  def pqDistTableFast(query: Column, codebook: Column, m: Int, k: Int): Column =
    GraftColumnBridge.column(PqDistTable(e(query), e(codebook), m, k))

  def adcDistFast(table: Column, codes: Column): Column =
    GraftColumnBridge.column(AdcDistance(e(table), e(codes)))

  /** Codegen'd L2 normalization (one norm computation per row). */
  def l2NormalizeFast(a: Column): Column = {
    val ae = e(a)
    GraftColumnBridge.column(L2NormalizeArray(ae, ae))
  }
}
