package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Gates for the round-6 extension batch beyond their DuckDB oracles:
  * q138 delta-algebra generality (a DIFFERENT split must reproduce the
  * full view — the oracle only proves one split) and maintenance-leg
  * broadcast shape, q139 brute-force outlier equality, q140
  * non-vacuousness and support bounds. */
class ExtOpsSpec extends SparkSpec {

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq.toList).toList

  test("q138: IVM algebra holds for an arbitrary other split") {
    val o = Tables.orders(spark, sfTiny).select(col("o_orderkey"), col("o_orderpriority"))
    val l = Tables.lineitem(spark, sfTiny).select(col("l_orderkey"), col("l_quantity"))
    val keyEq = col("o_orderkey") === col("l_orderkey")
    def view(j: org.apache.spark.sql.DataFrame) = j.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
    // split along different, co-prime residues than the registered query
    val (oldO, dO) = (o.filter(col("o_orderkey") % 3 =!= 0), o.filter(col("o_orderkey") % 3 === 0))
    val (oldL, dL) = (l.filter(col("l_orderkey") % 5 =!= 0), l.filter(col("l_orderkey") % 5 === 0))
    val maintained = view(oldO.join(oldL, keyEq))
      .unionByName(view(broadcast(dO).join(l, keyEq)
        .unionByName(oldO.join(broadcast(dL), keyEq))))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("n")).as("n"), round(sum(col("qty")), 2).as("qty"))
      .orderBy(col("o_orderpriority"))
    val full = view(o.join(l, keyEq))
      .select(col("o_orderpriority"), col("n"), round(col("qty"), 2).as("qty"))
      .orderBy(col("o_orderpriority"))
    assert(canon(maintained) == canon(full),
      "delta-maintained view diverges from full recompute")
  }

  test("q138: both maintenance legs broadcast their delta side") {
    val df = Registry.byName("q138_ivm_join").run(spark, sfTiny)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastExchange".r.findAllIn(plan).length
    assert(broadcasts >= 2,
      s"expected >= 2 BroadcastExchange (one per delta leg), got $broadcasts:\n$plan")
  }

  test("q139: outlier counts equal a driver-side brute force") {
    val got = TextAnalysis.groupOutliers(spark, sfTiny).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_outliers")).toMap
    val rows = Tables.documents(spark, sfTiny)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val expect = rows.groupBy(_._1).map { case (lang, xs) =>
      val v = xs.map(_._2.toDouble)
      val n = v.length
      val mean = v.sum / n
      val sd = math.sqrt(v.map(x => (x - mean) * (x - mean)).sum / (n - 1))
      lang -> v.count(x => math.abs(x - mean) > 2 * sd).toLong
    }
    assert(got == expect, s"outlier counts diverge: got $got expect $expect")
    assert(got.values.sum > 0, "vacuous: no outlier anywhere in the corpus")
  }

  test("q141: rational idf preserves single-term BM25 ranking (monotone transform)") {
    // for a one-term query, score = idfR(df) * norm(tf, len) with idfR a
    // strictly monotone transform of log-idf in df — so the ranking must
    // equal the classic log-BM25 ranking recomputed driver-side
    val got = TextAnalysis.bm25Retrieve(spark, sfTiny, Seq("spark"),
      k1 = 1.2, b = 0.75, k = 20).collect().map(_.getLong(0)).toList
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), lower(trim(col("text"))).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1).split("\\s+").toSeq))
    val withTf = docs.map { case (id, toks) =>
      (id, toks.count(_ == "spark").toLong, toks.length.toLong) }
      .filter(_._2 > 0)
    val nDocs = docs.size.toDouble
    val avgLen = docs.map(_._2.length.toLong).sum / nDocs
    val df = withTf.size.toDouble
    // Lucene-style positive idf log(1 + r): raw log(r) goes NEGATIVE for
    // terms in >50% of docs (this corpus's norm) and inverts the ranking
    // — the BM25 degeneracy every production engine clamps away. Both
    // log(1+r) and the rational r are positive constants for a single
    // term, so they must induce the identical ranking.
    val logBm25 = withTf.map { case (id, tf, len) =>
      val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
      (id, idf * tf / (tf + 1.2 * (0.25 + 0.75 * len / avgLen)))
    }.sortBy { case (id, sc) => (-sc, id) }.map(_._1).take(20).toList
    assert(got == logBm25,
      s"single-term rational ranking diverges from log-BM25:\n got $got\n exp $logBm25")
    assert(got.nonEmpty, "vacuous: no document matched the query term")
  }

  test("q142: triangle census equals driver-side brute force") {
    val row = TextAnalysis.triangleCensus(spark, sfTiny, minSupport = 5).head()
    val edges = TextAnalysis
      .cooccurrencePairs(spark, sfTiny, minDfFrac = 0.005, maxDfFrac = 0.85)
      .filter(col("n_ab") >= 5).select(col("t1"), col("t2"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = (for {
      a <- verts; b <- verts if a < b && edges((a, b))
      c <- verts if b < c && edges((b, c)) && edges((a, c))
    } yield (a, b, c)).size.toLong
    assert(row.getAs[Long]("n_triangles") == tris,
      s"census ${row.getAs[Long]("n_triangles")} != brute force $tris")
    assert(tris > 0, "vacuous: no triangle at minSupport=5")
  }

  test("q143: join-size identity holds on data") {
    val row = Registry.byName("q143_join_size").run(spark, sfTiny).head()
    assert(row.getAs[Int]("identity_holds") == 1,
      s"predicted ${row.getAs[Long]("predicted_rows")} != actual ${row.getAs[Long]("actual_rows")}")
  }

  test("q140/q141 top-k plans as TakeOrderedAndProject (no global sort)") {
    Seq("q140_cooccurrence", "q141_bm25_retrieval").foreach { name =>
      val df = Registry.byName(name).run(spark, sfTiny)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TakeOrderedAndProject"),
        s"$name: expected TakeOrderedAndProject in\n$plan")
    }
  }

  test("q144: bucketed skyline equals O(n^2) NOT-EXISTS brute force") {
    val got = Registry.byName("q144_skyline").run(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    val rows = Tables.lineitem(spark, sfTiny)
      .select(round(col("l_extendedprice") * 100).cast("long").as("p"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val skyline = rows.filter { case (p, q) =>
      !rows.exists { case (p2, q2) =>
        (p2 < p && q2 >= q) || (p2 <= p && q2 > q) }
    }
    val expect = skyline.groupBy(identity).map { case ((p, q), xs) =>
      (p, q, xs.size.toLong) }.toList.sortBy(_._1)
    assert(got == expect, s"skyline diverges:\n got    $got\n expect $expect")
    assert(got.nonEmpty, "vacuous: empty skyline")
  }

  test("q145: two-pass selection equals a full driver-side sort at every rank") {
    val got = Registry.byName("q145_order_statistics").run(spark, sfTiny)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toList
    val vs = Tables.lineitem(spark, sfTiny)
      .select(round(col("l_extendedprice") * 100).cast("long").as("v"))
      .collect().map(_.getLong(0)).sorted
    val n = vs.length
    val expect = List(0.25, 0.5, 0.75, 0.99).map { p =>
      val k = math.ceil(p * n).toLong
      (p, k, vs((k - 1).toInt))
    }
    assert(got == expect, s"order stats diverge:\n got    $got\n expect $expect")
  }

  test("q146: spine is dense, gaps exist and inherit exactly the last observed value") {
    val rows = Registry.byName("q146_resample_ffill").run(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getTimestamp(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getInt(3))).toSeq
    assert(rows.exists(_._4 == 1), "vacuous: no gap hour in the spine")
    assert(rows.exists(_._4 == 0), "vacuous: no observed hour")
    rows.groupBy(_._1).foreach { case (tpe, xs) =>
      val ordered = xs.sortBy(_._2.getTime)
      // dense hourly spine
      ordered.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._2.getTime - a._2.getTime == 3600 * 1000L,
            s"$tpe: spine not dense at ${a._2} -> ${b._2}")
        case _ => ()
      }
      // forward-fill semantics replayed imperatively
      var lastSeen: Option[Double] = None
      ordered.foreach { case (_, h, filled, wasGap) =>
        if (wasGap == 0) lastSeen = filled
        assert(filled == lastSeen,
          s"$tpe @ $h: filled=$filled but last observed=$lastSeen")
      }
    }
  }

  test("q144/q145 results are invariant to spark.graft.selection.bins") {
    def run(name: String) = Registry.byName(name).run(spark, sfTiny)
      .collect().map(_.toSeq.toList).toList
    val defaults = Seq("q144_skyline", "q145_order_statistics",
      "q158_group_order_statistics").map(n => n -> run(n))
    try {
      spark.conf.set("spark.graft.selection.bins", "7")
      defaults.foreach { case (n, expect) =>
        assert(run(n) == expect, s"$n changed under bins=7 — decomposition broken")
      }
    } finally spark.conf.unset("spark.graft.selection.bins")
  }

  test("q172 c-TF-IDF: every class gets exactly k ranked terms, weights monotone, tf <= ctf") {
    val k = 5
    val rows = TextAnalysis.classTfidf(spark, sfTiny, "source", k).collect()
    assert(rows.nonEmpty)
    val byClass = rows.groupBy(_.getAs[String]("class"))
    val nClasses = Tables.documents(spark, sfTiny)
      .select(col("source")).distinct().count()
    assert(byClass.size == nClasses, "a source domain produced no profile")
    byClass.foreach { case (c, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to k),
        s"class $c: rank sequence broken")
      val ws = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("weight"))
      assert(ws.zip(ws.tail).forall { case (a, b) => a >= b },
        s"class $c: weights not monotone along ranks")
      rs.foreach { r =>
        assert(r.getAs[Long]("tf") <= r.getAs[Long]("ctf"),
          "class term count exceeded its corpus-wide count")
        assert(r.getAs[Double]("weight") > 0.0)
      }
    }
  }

  test("q178 equi-depth histogram: counts sum to N, every bucket near the fair share") {
    val hist = Registry.byName("q178_equidepth_hist").run(spark, sfTiny).collect()
    val n = Tables.lineitem(spark, sfTiny).count()
    assert(hist.map(_.getAs[Long]("n_rows")).sum == n, "bucket counts must partition the table")
    assert(hist.map(_.getAs[Int]("bucket")).toSeq == (1 to 8),
      "all 8 buckets populated at this tie-sparse column")
    val fair = n / 8.0
    hist.foreach { r =>
      val c = r.getAs[Long]("n_rows")
      assert(math.abs(c - fair) <= fair * 0.05 + 1,
        s"bucket ${r.getAs[Int]("bucket")}: $c far from fair share $fair")
    }
    // edges monotone
    val edges = hist.map(_.getAs[Long]("hi_edge"))
    assert(edges.zip(edges.tail).forall { case (a, b) => a <= b })
  }

  test("q140: non-vacuous, canonical pair order, support bounded by min df") {
    val rows = TextAnalysis
      .cooccurrence(spark, sfTiny, minDfFrac = 0.005, maxDfFrac = 0.85, topK = 100)
      .collect()
    assert(rows.nonEmpty,
      "vacuous: df-cut selected no vocabulary — corpus assumption broke")
    val nDocs = Tables.documents(spark, sfTiny).count()
    rows.foreach { r =>
      assert(r.getAs[String]("t1") < r.getAs[String]("t2"), "pair not canonical")
      val nAb = r.getAs[Long]("n_ab")
      assert(nAb >= 1 && nAb <= nDocs, s"support $nAb out of range")
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }
}
