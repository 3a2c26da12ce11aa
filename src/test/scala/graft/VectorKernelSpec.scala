package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions
import graft.functions.VectorKernels._

/** The native kernels (graft.functions.VectorExpressions) against the
  * higher-order-function reference implementations and math identities.
  * Each check runs through a real DataFrame (codegen path) and again with
  * codegen disabled (interpreted eval path). */
class VectorKernelSpec extends SparkSpec {

  // seeded generator standing in for scalacheck (bridge artifact not in the
  // offline cache): n random (a, b) float-vector cases per property
  private def cases(n: Int): Seq[(Seq[Float], Seq[Float])] = {
    val rnd = new scala.util.Random(42)
    (0 until n).map { _ =>
      val d = 1 + rnd.nextInt(16)
      (Seq.fill(d)(rnd.nextFloat() * 20 - 10), Seq.fill(d)(rnd.nextFloat() * 20 - 10))
    }
  }

  private def kernelRow(a: Seq[Float], b: Seq[Float], codegen: Boolean): (Double, Double, Double) = {
    val prev = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode",
        if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN")
      val schema = StructType(Seq(
        StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
      val df = spark.createDataFrame(
        java.util.List.of(Row(a, b)), schema)
      val r = df.select(
        dotFast(col("a"), col("b")).as("dot"),
        cosineFast(col("a"), col("b")).as("cos"),
        l2DistSqFast(col("a"), col("b")).as("l2sq")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    } finally spark.conf.set("spark.sql.codegen.factoryMode", prev)
  }

  test("kernels match HOF reference implementations (codegen + interpreted)") {
    cases(30).foreach { case (a, b) =>
      val schema = StructType(Seq(
        StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
      val df = spark.createDataFrame(java.util.List.of(Row(a, b)), schema)
      val ref = df.select(
        VectorFunctions.dot(col("a"), col("b")).as("dot"),
        VectorFunctions.cosine(col("a"), col("b")).as("cos"),
        VectorFunctions.l2DistSq(col("a"), col("b")).as("l2sq")).head()
      for (codegen <- Seq(true, false)) {
        val (d, c, l) = kernelRow(a, b, codegen)
        assert(math.abs(d - ref.getDouble(0)) < 1e-9, s"dot codegen=$codegen")
        val refCos = ref.getDouble(1)
        if (!refCos.isNaN) assert(math.abs(c - refCos) < 1e-9, s"cos codegen=$codegen")
        assert(math.abs(l - ref.getDouble(2)) < 1e-9, s"l2sq codegen=$codegen")
      }
    }
  }

  test("math identities: l2sq = |a|^2 + |b|^2 - 2 dot; cosine in [-1,1]") {
    cases(30).foreach { case (a, b) =>
      val (d, c, l) = kernelRow(a, b, codegen = true)
      val na = a.map(x => x.toDouble * x).sum
      val nb = b.map(x => x.toDouble * x).sum
      assert(math.abs(l - (na + nb - 2 * d)) < 1e-6)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("zero vector: cosine is 0.0 (not NaN), dot 0, l2sq = |b|^2") {
    val b = Seq(3.0f, 4.0f)
    val (d, c, l) = kernelRow(Seq(0.0f, 0.0f), b, codegen = true)
    assert(d == 0.0 && c == 0.0 && math.abs(l - 25.0) < 1e-9)
  }

  test("length mismatch: dot over common prefix, norms over full arrays") {
    val (d, c, _) = kernelRow(Seq(1.0f, 1.0f, 5.0f), Seq(1.0f, 1.0f), codegen = true)
    assert(d == 2.0)
    // cos = 2 / (sqrt(27) * sqrt(2))
    assert(math.abs(c - 2.0 / (math.sqrt(27.0) * math.sqrt(2.0))) < 1e-9)
  }

  test("l2ToCosine bijection on unit vectors") {
    cases(30).foreach { case (a0, b0) =>
      val na = math.sqrt(a0.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b0.map(x => x.toDouble * x).sum)
      if (na > 1e-3 && nb > 1e-3 && a0.length == b0.length) {
        val a = a0.map(x => (x / na).toFloat)
        val b = b0.map(x => (x / nb).toFloat)
        val schema = StructType(Seq(
          StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
        val df = spark.createDataFrame(java.util.List.of(Row(a, b)), schema)
        val r = df.select(
          VectorFunctions.l2ToCosine(l2DistFast(col("a"), col("b"))).as("viaL2"),
          cosineFast(col("a"), col("b")).as("direct")).head()
        // float32 normalization error accumulates; 1e-5 is the right tolerance
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-5)
      }
    }
  }
}
