package graft.tools
import org.apache.spark.sql.functions._
object DiagPrefix {
  def main(args: Array[String]): Unit = {
    val s = graft.GraftSession.local()
    val d = args.headOption.getOrElse("/tmp/graft_scale_rehearsal")
    val toksC = split(lower(trim(col("text"))), "\\s+")
    val docs0 = s.read.parquet(d + "/documents.parquet")
    val ex = docs0.select(col("doc_id"), toksC.as("t")).filter(size(col("t")) >= 3)
      .select(col("doc_id"), graft.functions.SketchFunctions.shingleArray(col("t"), 3).as("sh"))
      .select(col("doc_id"), size(col("sh")).as("n_sh"), explode(col("sh")).as("sgl"))
      .select(col("doc_id"), col("n_sh"), conv(substring(md5(col("sgl").cast("binary")), 1, 15), 16, 10).cast("long").as("k"))
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[diag] $tag: $r in ${(System.nanoTime-t0)/1e9}%.1f s"); r }
    timed("ex rows")(ex.count())
    val dfk = ex.groupBy(col("k")).agg(count(lit(1)).as("df"))
    timed("vocab")(dfk.count())
    val docs = ex.join(dfk, Seq("k")).groupBy(col("doc_id"))
      .agg(first(col("n_sh")).as("n_sh"), sort_array(collect_list(struct(col("df"), col("k")))).as("ord"))
      .select(col("doc_id"), col("n_sh"), expr("transform(ord, x -> x.k)").as("keys"),
        expr("n_sh - (n_sh * 1 + 1) DIV 2 + 1").as("plen"))
    timed("docs agg")(docs.count())
    val pref = docs.select(col("doc_id"), explode(slice(col("keys"), lit(1), col("plen"))).as("k"))
    timed("pref rows")(pref.count())
    val cand = pref.select(col("doc_id").as("id1"), col("k"))
      .join(pref.select(col("doc_id").as("id2"), col("k")), Seq("k"))
      .filter(col("id1") < col("id2")).select(col("id1"), col("id2"))
    timed("cand with dup")(cand.count())
    timed("cand distinct")(cand.distinct.count())
    s.stop()
  }
}
