package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Similarity}

/** SQ8 scalar-quantization gates (q176/q177) beyond the DuckDB oracle:
  * the per-dim half-cell reconstruction bound (the property that makes
  * 8-bit codes usable for search at all) and recall of the
  * compressed-domain kNN against the uncompressed exact join — the
  * same recall discipline every other ANN tier carries, here on top of
  * a fully-oracled path. */
class Sq8Spec extends SparkSpec {

  test("codes in [0,255]; reconstruction error <= half a quantization cell per dim") {
    val rows = Ann.sq8Codes(spark, sfTiny)
      .withColumn("xh",
        when(col("hi") === col("lo"), col("lo"))
          .otherwise(col("lo") +
            (col("code") + lit(0.5)) * (col("hi") - col("lo")) / 256))
      .collect()
    assert(rows.nonEmpty)
    // re-derive x for the bound check: join back to the exploded corpus
    val xs = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("dim"), col("col").cast("double").as("x"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val code = r.getAs[Int]("code")
      assert(code >= 0 && code <= 255)
      val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
      val x = xs((r.getAs[Long]("vec_id"), r.getAs[Int]("dim")))
      val halfCell = (hi - lo) / 512 + 1e-12
      assert(math.abs(r.getAs[Double]("xh") - x) <= halfCell,
        s"dim ${r.getAs[Int]("dim")}: |xh - x| exceeds half a cell")
    }
  }

  test("sq8 knn recall@2 >= 0.9 vs the uncompressed exact join") {
    val sq = Registry.byName("q177_sq8_knn").run(spark, sfTiny)
    val exact = Similarity.knnExact(spark, sfTiny, k = 2, queryMod = 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (s8, ex) = (pairs(sq), pairs(exact))
    val recall = (s8 & ex).size.toDouble / ex.size
    assert(recall >= 0.9, f"SQ8 recall@2 $recall%.3f < 0.9")
  }

  test("q191 kernel codes == oracle-checked q176 codes, byte for byte") {
    import graft.functions.Sq8Kernels._
    val st = Ann.sq8DimStats(spark, sfTiny).orderBy(col("dim")).collect()
    val lo = st.map(_.getDouble(1)); val hi = st.map(_.getDouble(2))
    val kernel = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), sq8EncodeFast(
        expr("transform(embedding, x -> cast(x as double))"), lo, hi).as("codes"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("codes")).toMap
    val reference = Ann.sq8Codes(spark, sfTiny)
      .collect().groupBy(_.getAs[Long]("vec_id"))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Int]("code")) }
    assert(kernel.keySet == reference.keySet)
    reference.foreach { case (id, codes) =>
      val k = kernel(id).map(_ & 0xff)
      assert(k.toSeq == codes.toSeq, s"vec $id: kernel codes diverge from q176")
    }
  }

  test("q191 fused score == q177 reconstruct-then-cosine compose") {
    import graft.functions.Sq8Kernels._
    import graft.functions.VectorKernels._
    val st = Ann.sq8DimStats(spark, sfTiny).orderBy(col("dim")).collect()
    val lo = st.map(_.getDouble(1)); val hi = st.map(_.getDouble(2))
    val q = Tables.embeddings(spark, sfTiny).filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val c = Tables.embeddings(spark, sfTiny).limit(50)
      .select(col("vec_id").as("nid"),
        sq8EncodeFast(expr("transform(embedding, x -> cast(x as double))"), lo, hi)
          .as("codes"))
    val fused = q.join(c, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        sq8CosineFast(col("qvec"), col("codes"), lo, hi).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val recon = Ann.sq8Reconstructed(spark, sfTiny)
      .select(col("vec_id").as("nid"), col("rvec"))
    val composed = q.join(recon, col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosineFast(col("qvec"), col("rvec")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(fused.nonEmpty)
    fused.foreach { case (k, v) =>
      assert(v == composed(k), s"pair $k: fused $v != composed ${composed(k)}")
    }
  }

  test("q191 SQ8-under-IVF recall@2 >= 0.9 vs the uncompressed exact join") {
    val got = Registry.byName("q191_sq8_ivf_knn").run(spark, sfTiny)
    val exact = Similarity.knnExact(spark, sfTiny, k = 2, queryMod = 10)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("qid"), col("nid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (s8, ex) = (pairs(got), pairs(exact))
    val recall = (s8 & ex).size.toDouble / ex.size
    assert(recall >= 0.9, f"SQ8-under-IVF recall@2 $recall%.3f < 0.9")
  }

  test("flat-dimension safety: a constant dimension codes to 0 and reconstructs to itself") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Array(0.5f, 1.0f)), (2L, Array(0.5f, 2.0f)))
      .toDF("vec_id", "embedding")
    val stats = df.select(posexplode(col("embedding")))
      .select(col("pos").as("dim"), col("col").cast("double").as("x"))
      .groupBy(col("dim")).agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(stats(0) == ((0.5, 0.5)), "dim 0 should be flat")
    assert(stats(1)._1 < stats(1)._2)
  }
}
