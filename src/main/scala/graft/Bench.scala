package graft
object Bench {
  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  def main(args: Array[String]): Unit = BenchLock.exclusively("bench") {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // shared builder: UTC pin + persistent model store, so a fresh bench
    // JVM loads fitted models instead of paying cold fits inside the
    // first measured repeats (the round-6 q36/q56/q131 artifact spikes)
    val spark = GraftSession.local()
    // warm-up: pay session/JIT/codegen startup outside the measured loop,
    // and run queries in name order so per-query numbers are comparable
    // across rounds (a Map's iteration order would hand the warmup cost to
    // a random query each run).
    Tables.lineitem(spark, sfDir).count()
    // Noise robustness: the graded artifact has been distorted by host
    // contention in three consecutive rounds (one random query absorbing a
    // 10x CPU-steal spike), so EVERY query is measured `repeats` times and
    // the MEDIAN is reported — one contended run can no longer move a
    // query's number. Slow queries are no longer exempt (they were
    // min-of-2 through round 10, which is exactly where the r10 q189
    // 1.55x "is it noise?" ambiguity lived); only a first run past the
    // hard cap keeps its single measurement, so rehearsal-scale inputs
    // don't triple an already-long run. The full artifact additionally
    // records each query's [min, median, max] across the repeats — the
    // measured per-query noise floor, so a cross-round swing is
    // classifiable from the artifact alone (BASELINE.md "noise floor").
    val maxRepeats = spark.conf.get("spark.graft.bench.repeats",
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3")).toInt
    val hardCapSec = 30.0
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        // a failing query must surface as an error, not bench as "fast":
        // its elapsed time still counts, and its message lands in `errors`
        val err = try { fn(spark, sfDir).count(); None } catch {
          case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
        }
        ((System.nanoTime() - t0) / 1e9, err)
      }
      val (t1, e1) = once()
      val runs =
        if (e1.isDefined || maxRepeats <= 1 || t1 > hardCapSec) Seq((t1, e1))
        else (t1, e1) +: Seq.fill(maxRepeats - 1)(once())
      val times = runs.map(_._1).sorted
      (name, times(times.size / 2), runs.flatMap(_._2).headOption, times)
    }
    def s3(v: Double): String = java.math.BigDecimal.valueOf(v)
      .setScale(3, java.math.RoundingMode.HALF_UP).toPlainString
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spread = results.map { case (k, _, _, ts) =>
      s"\"" + k + "\":[" + ts.map(s3).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(m), _) =>
      "\"" + k + "\":\"" + esc(m) + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"errors":$errs,"sf":"$sfDir"}"""
    // Compact final line for the driver: its tail capture is ~2,000 chars
    // and the full per-query map is ~6 KB, so a full-line final print
    // starts mid-line in BENCH_r* ("parsed": null). The compact line
    // carries total/counts/sf only (≤ 200 chars); the full per-query map
    // lives in the artifact file below.
    // Locale-pinned rounding (ADVICE r9): the f-interpolator's %.3f uses
    // the default JVM locale, which under a comma-decimal locale would
    // print `"value":210,957` and break the driver's JSON parse.
    val totalStr = java.math.BigDecimal.valueOf(total)
      .setScale(3, java.math.RoundingMode.HALF_UP).toPlainString
    val compact = s"""{"metric":"total","value":$totalStr,"unit":"sec","n_queries":${results.size},"n_errors":${results.count(_._3.isDefined)},"sf":"$sfDir"}"""
    // Also persist the full artifact: the driver's BENCH_r* capture
    // truncates stdout at 2,000 chars, which loses the per-query map for
    // most of the suite — the file keeps cross-round per-query
    // comparison possible. Path override: SPARK_GRAFT_BENCH_OUT.
    val sfName = new java.io.File(sfDir).getName
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", s"bench_$sfName.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    catch { case e: Exception =>
      System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
    if (results.exists(_._3.isDefined)) System.err.println(
      s"[bench] ${results.count(_._3.isDefined)} queries FAILED — totals are not comparable")
    // Stop the session BEFORE printing, so the JSON is the FINAL stdout
    // line of the run — the driver tail-parses stdout and anything Spark
    // emits during shutdown after an early print could bury it. The full
    // line prints first (greppable locally), the compact line LAST (the
    // driver's 2,000-char tail always contains it whole).
    spark.stop()
    println(line)
    println(compact)
  }
}
