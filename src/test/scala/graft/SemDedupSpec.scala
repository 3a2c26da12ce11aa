package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorKernels.cosineFast
import graft.operators.{Ann, Dedup}

/** Gates for q129 SemDeDup (embedding-cluster semantic dedup). The
  * clustering is procedural (no SQL oracle), so correctness is pinned by
  * exact self-consistency properties instead:
  *  - dominance soundness: every removed doc has a same-cluster beater
  *    above the threshold (lower centroid-cosine, tie smaller id);
  *  - survivor closure: no same-cluster survivor pair sits above the
  *    threshold (if one did, one endpoint would dominate the other);
  *  - determinism across runs.
  * Closure IS the fixed-point property: given the same clustering,
  * re-running on the survivors removes nothing.
  */
class SemDedupSpec extends SparkSpec {

  private val thr = 0.35

  private def parts(): (Set[Long], Set[Long]) = {
    val survivors = Dedup.semDedupSurvivors(spark, sfTiny, thr)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val all = Ann.ivfIndex(spark, sfTiny)._1
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    (survivors, all -- survivors)
  }

  test("dedup removes something and keeps most of the corpus") {
    val (survivors, removed) = parts()
    assert(removed.nonEmpty, "threshold 0.35 on this corpus must remove docs")
    assert(survivors.size > removed.size, "removed a majority — keep rule broken")
  }

  test("dominance soundness: every removed doc has a same-cluster beater") {
    val (_, removed) = parts()
    val assigned = Ann.ivfIndex(spark, sfTiny)._1
    val centroids = Ann.ivfIndex(spark, sfTiny)._2
    val scored = assigned.join(broadcast(centroids), Seq("centroid_id"))
      .select(col("vec_id"), col("centroid_id"),
        cosineFast(col("vec"), col("cvec")).as("c_sim"), col("vec"))
    val a = scored.select(col("vec_id").as("x"), col("centroid_id").as("cx"),
      col("c_sim").as("xs"), col("vec").as("vx"))
    val b = scored.select(col("vec_id").as("y"), col("centroid_id").as("cy"),
      col("c_sim").as("ys"), col("vec").as("vy"))
    // exact witness check (within-cluster cross join is fine at spec size)
    val witnessed = a.join(b, col("cx") === col("cy") && col("x") =!= col("y"))
      .filter(round(cosineFast(col("vx"), col("vy")), 4) >= thr)
      .filter(col("ys") < col("xs") ||
        (col("ys") === col("xs") && col("y") < col("x")))
      .select(col("x")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(removed == witnessed,
      s"removed set != exact dominance set: ${(removed -- witnessed).size} unwitnessed, ${(witnessed -- removed).size} missed")
  }

  test("survivor closure: no same-cluster survivor pair above threshold") {
    val survivors = Dedup.semDedupSurvivors(spark, sfTiny, thr)
    val assigned = Ann.ivfIndex(spark, sfTiny)._1
    val sv = survivors.select(col("vec_id")).join(assigned, Seq("vec_id"))
      .select(col("vec_id"), col("centroid_id"), col("vec"))
    val l = sv.select(col("vec_id").as("x"), col("centroid_id").as("cx"), col("vec").as("vx"))
    val r = sv.select(col("vec_id").as("y"), col("centroid_id").as("cy"), col("vec").as("vy"))
    val open = l.join(r, col("cx") === col("cy") && col("x") < col("y"))
      .filter(round(cosineFast(col("vx"), col("vy")), 4) >= thr).count()
    assert(open == 0, s"$open same-cluster survivor pairs still above $thr")
  }

  test("deterministic across runs") {
    def run() = Dedup.semDedupSurvivors(spark, sfTiny, thr)
      .collect().map(_.toSeq).toList
    assert(run() == run(), "two identical semDedup runs differ")
  }
}
