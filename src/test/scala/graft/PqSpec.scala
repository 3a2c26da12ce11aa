package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Similarity}
import graft.functions.PqKernels._

/** Product-quantization tier contract (no SQL oracle possible — KMeans
  * codebooks — so the guarantees live here, like the other ANN tiers). */
class PqSpec extends SparkSpec {

  test("pq codes: length m, every code in [0, k), deterministic") {
    Ann.clearCaches()
    val pq = Ann.pqIndex(spark, sfTiny)
    val enc = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"),
        pqEncodeFast(l2NormalizeFast(col("embedding")),
          typedLit(pq.codebook.toSeq), pq.m, pq.k).as("codes"))
    val rows = enc.collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getSeq[Int](1)
      assert(c.length == pq.m)
      assert(c.forall(x => x >= 0 && x < pq.k))
    }
    val again = enc.collect().sortBy(_.getLong(0))
    rows.zip(again).foreach { case (a, b) =>
      assert(a.getSeq[Int](1) == b.getSeq[Int](1), "non-deterministic encoding")
    }
  }

  test("quantization error: self-ADC is the reconstruction error, bounded on unit vectors") {
    Ann.clearCaches()
    val qe = Ann.pqQuantError(spark, sfTiny)
    val stats = qe.agg(avg(col("qerr")).as("mean"), max(col("qerr")).as("max")).head()
    // unit vectors: squared reconstruction error is in [0, 2]; the fitted
    // codebook must do materially better than the all-zero quantizer (1.0)
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(0) < 0.5,
      s"mean qerr ${stats.getDouble(0)} too high for a fitted codebook")
    assert(stats.getDouble(1) <= 2.0001)
  }

  test("finer codebooks quantize better: k=16 error > k=256 error") {
    def meanErr(k: Int): Double = {
      spark.conf.set("spark.graft.pq.codes", k.toString)
      Ann.clearCaches()
      try Ann.pqQuantError(spark, sfTiny).agg(avg(col("qerr"))).head().getDouble(0)
      finally { spark.conf.unset("spark.graft.pq.codes"); Ann.clearCaches() }
    }
    val coarse = meanErr(16)
    val fine = meanErr(256)
    assert(fine < coarse, s"k=256 ($fine) should beat k=16 ($coarse)")
  }

  test("pq knn recall@2 >= 0.85 vs exact (tiny)") {
    Ann.clearCaches()
    val exact = Similarity.knnExact(spark, sfTiny, k = 2, queryMod = 10)
      .select(col("qid"), col("nid"))
    val ann = Ann.pqKnn(spark, sfTiny, k = 2,
        nprobe = GraftConf.ivfNprobe(spark), queryMod = 10)
      .select(col("qid"), col("nid"))
    val total = exact.count()
    val found = exact.join(ann, Seq("qid", "nid")).count()
    val recall = found.toDouble / total
    // measured 0.92-0.94 at the m=16/k=256/refine=8 defaults on both
    // sf0.001 and sf0.01 (the IVF probe's own ceiling); 0.85 is the gate
    assert(recall >= 0.85, s"PQ recall $recall ($found/$total)")
  }

  test("adc distance on own codes equals dist-table lookup composition (kernel consistency)") {
    Ann.clearCaches()
    val pq = Ann.pqIndex(spark, sfTiny)
    val cb = typedLit(pq.codebook.toSeq)
    // ADC(table(v), encode(v)) must equal the summed per-subspace min
    // distance: encoding picks the argmin code, the table holds the
    // distances, so self-ADC == sum of per-subspace minimums
    val row = Tables.embeddings(spark, sfTiny).limit(1)
      .select(l2NormalizeFast(col("embedding")).as("nv"))
      .select(
        adcDistFast(pqDistTableFast(col("nv"), cb, pq.m, pq.k),
          pqEncodeFast(col("nv"), cb, pq.m, pq.k)).as("self_adc"),
        aggregate(
          transform(sequence(lit(0), lit(pq.m - 1)), j =>
            array_min(slice(pqDistTableFast(col("nv"), cb, pq.m, pq.k),
              j * pq.k + 1, lit(pq.k)))),
          lit(0.0), (acc, x) => acc + x).as("min_sum"))
      .head()
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-9,
      s"self-ADC ${row.getDouble(0)} != per-subspace min sum ${row.getDouble(1)}")
  }
}
