package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Independent re-derivations of the evaluation-statistics family
  * (q278–q287 batch): each test recomputes the statistic by a DIFFERENT
  * algorithm (rank-based AUC vs the rank-free identity, collected
  * brute force vs the distributed closed form) so an algebra slip in
  * the SQL can't hide behind oracle agreement (both engines would run
  * the same wrong formula). Collects here are test-side only, over
  * collapsed tiny relations. */
class QualityEvalSpec extends EngineSuite {

  private def one(q: QuerySpec): org.apache.spark.sql.Row =
    q.run(spark, sfDir).collect().head

  test("q278 AUC matches the average-rank Mann-Whitney derivation") {
    QuerySpec.prepared(spark, sfDir)
    val r = one(llmops.QualityEval.q278QualityRocAuc)
    val np = r.getAs[Long]("n_pos"); val nn = r.getAs[Long]("n_neg")
    val d = spark.table("documents")
      .select(col("n_chars").as("score"),
        when(col("lang") === "en", 1).otherwise(0).as("y"))
    // average rank over ties: min-rank + (tie-block − 1)/2
    val ranked = d.withColumn("ar",
      rank().over(Window.orderBy("score")) +
        (count(lit(1)).over(Window.partitionBy("score")) - 1) / 2.0)
    val rp = ranked.filter(col("y") === 1).agg(sum("ar")).head().getDouble(0)
    val auc = (rp - np.toDouble * (np + 1) / 2) / (np.toDouble * nn)
    assert(math.abs(auc * 1e6 - r.getAs[Long]("auc_e6")) <= 1,
      s"rank AUC $auc vs ${r.getAs[Long]("auc_e6")}")
    assert(math.abs((2 * auc - 1) * 1e6 - r.getAs[Long]("gini_e6")) <= 1)
  }

  test("q279 kappa is consistent with its own emitted contingency cells") {
    val r = one(llmops.QualityEval.q279ClassifierKappa)
    val (n11, n10, n01, n00) = (r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    val n = (n11 + n10 + n01 + n00).toDouble
    val po = (n11 + n00) / n
    val pe = ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)) / (n * n)
    val kappa = (po - pe) / (1 - pe)
    assert(math.abs(kappa * 1e6 - r.getAs[Long]("kappa_e6")) <= 1)
    assert(math.abs(po * 1e6 - r.getAs[Long]("agreement_e6")) <= 1)
    // all four cells populated at fixture scale — thresholds actually split
    assert(Seq(n11, n10, n01, n00).forall(_ > 0))
  }

  test("q281 Gini matches brute-force Lorenz integration") {
    QuerySpec.prepared(spark, sfDir)
    val r = one(llmops.QualityEval.q281TokenGini)
    val counts = spark.table("documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect().map(_.getLong(1)).sorted
    val v = counts.length.toLong; val t = counts.sum
    val s = counts.zipWithIndex.map { case (c, i) => (i + 1L) * c }.sum
    val gini = 2.0 * s / (v.toDouble * t) - (v + 1.0) / v
    assert(r.getAs[Long]("vocab") == v && r.getAs[Long]("tokens") == t)
    assert(math.abs(gini * 1e6 - r.getAs[Long]("gini_e6")) <= 1)
    assert(r.getAs[Long]("gini_e6") >= 0 && r.getAs[Long]("gini_e6") <= 1000000)
  }

  test("q282 Spearman matches Pearson-of-ranks via stat.corr") {
    QuerySpec.prepared(spark, sfDir)
    val r = one(llmops.QualityEval.q282SpearmanCorr)
    val d = spark.table("documents").select(col("n_chars").as("x"),
      size(array_distinct(split(col("text"), " "))).as("y"))
    val ranked = d
      .withColumn("rx", rank().over(Window.orderBy("x")) +
        (count(lit(1)).over(Window.partitionBy("x")) - 1) / 2.0)
      .withColumn("ry", rank().over(Window.orderBy("y")) +
        (count(lit(1)).over(Window.partitionBy("y")) - 1) / 2.0)
    val rho = ranked.stat.corr("rx", "ry")
    assert(math.abs(rho * 1e6 - r.getAs[Long]("spearman_e6")) <= 2,
      s"stat.corr $rho vs ${r.getAs[Long]("spearman_e6")}")
  }

  test("q283 ACF: 7 lags, bounded, and lag-1 matches brute force") {
    QuerySpec.prepared(spark, sfDir)
    val rows = operators.Events.q283EventsAcf.run(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("lag")).toSeq == (1 to 7))
    rows.foreach(r => assert(math.abs(r.getAs[Long]("acf_e6")) <= 1000001))
    val days = spark.table("events")
      .groupBy(col("ts").cast("date").as("day")).count()
      .orderBy("day").collect().map(_.getLong(1).toDouble)
    val mu = days.sum / days.length
    val den = days.map(c => (c - mu) * (c - mu)).sum
    val num1 = days.dropRight(1).zip(days.drop(1))
      .map { case (a, b) => (a - mu) * (b - mu) }.sum
    val acf1 = rows.find(_.getAs[Int]("lag") == 1).get.getAs[Long]("acf_e6")
    assert(math.abs(num1 / den * 1e6 - acf1) <= 1)
  }

  test("q284 Theil-Sen matches brute-force median of pairwise slopes") {
    QuerySpec.prepared(spark, sfDir)
    val r = one(operators.Events.q284TheilSenTrend)
    val days = spark.table("events")
      .groupBy(col("ts").cast("date").as("day")).count()
      .orderBy("day").collect()
      .map(x => (x.getDate(0).toLocalDate.toEpochDay, x.getLong(1).toDouble))
    val slopes = (for {
      i <- days.indices; j <- days.indices if j > i
    } yield (days(j)._2 - days(i)._2) / (days(j)._1 - days(i)._1)).sorted
    assert(r.getAs[Long]("n_pairs") == slopes.length)
    // (n−1)·p interpolated median, the engines' shared definition
    val p = (slopes.length - 1) * 0.5
    val lo = slopes(p.toInt); val hi = slopes(math.ceil(p).toInt)
    val med = lo + (hi - lo) * (p - p.toInt)
    assert(math.abs(med * 1e6 - r.getAs[Long]("theilsen_slope_e6")) <= 1)
  }

  test("q285 burstiness: one type matches collected brute force; B bounded") {
    QuerySpec.prepared(spark, sfDir)
    val rows = operators.Events.q285EventsBurstiness.run(spark, sfDir).collect()
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("burstiness_e6")) <= 1000000)
      assert(r.getAs[Long]("fano_e6") > 0)
    }
    val gaps = spark.sql(
      """SELECT unix_timestamp(ts) - unix_timestamp(LAG(ts) OVER
        |  (PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS gp
        |FROM events WHERE event_type = 'click'""".stripMargin)
      .filter(col("gp").isNotNull).collect().map(_.getLong(0))
    val n = gaps.length.toDouble
    val mean = gaps.sum / n
    val sd = math.sqrt(gaps.map(g => (g - mean) * (g - mean)).sum / n)
    val b = (sd - mean) / (sd + mean)
    val click = rows.find(_.getAs[String]("event_type") == "click").get
    assert(click.getAs[Long]("n_gaps") == gaps.length)
    assert(math.abs(b * 1e6 - click.getAs[Long]("burstiness_e6")) <= 1)
  }

  test("q280 chi-square matches collected contingency brute force") {
    QuerySpec.prepared(spark, sfDir)
    val r = one(operators.Events.q280Chi2Independence)
    val cells = spark.sql(
      """SELECT event_type,
        |  CAST(datediff(CAST(ts AS DATE), DATE '2024-01-01') % 7 AS INT) AS dow,
        |  COUNT(*) AS o
        |FROM events GROUP BY 1, 2""".stripMargin).collect()
      .map(x => (x.getString(0), x.getInt(1)) -> x.getLong(2)).toMap
    val types = cells.keys.map(_._1).toSeq.distinct.sorted
    val n = cells.values.sum.toDouble
    val chi2 = (for { t <- types; d <- 0 to 6 } yield {
      val o = cells.getOrElse((t, d), 0L).toDouble
      val e = types.map(tt => (0 to 6).map(dd => cells.getOrElse((tt, dd), 0L)).sum)
        .apply(types.indexOf(t)) *
        types.map(tt => cells.getOrElse((tt, d), 0L)).sum / n
      (o - e) * (o - e) / e
    }).sum
    assert(r.getAs[Long]("dof") == (types.size - 1) * 6)
    assert(math.abs(chi2 * 1e6 - r.getAs[Long]("chi2_e6")) <= 2,
      s"brute chi2 $chi2 vs ${r.getAs[Long]("chi2_e6")}")
  }

  test("q286 winnowing: zero exchanges and the w-window density guarantee") {
    QuerySpec.prepared(spark, sfDir)
    val df = llmops.TextAnalysis.q286Winnowing.run(spark, sfDir)
    val rows = df.collect()
    rows.foreach { r =>
      val ng = r.getAs[Long]("n_grams"); val fp = r.getAs[Long]("n_fingerprints")
      // winnowing guarantee: consecutive selections ≤ w apart → at least
      // one fingerprint per w grams (w = 4), and never more than windows
      assert(fp >= ng / 4, s"doc ${r.get(0)}: $fp fingerprints for $ng grams")
      assert(fp <= ng - 3)
      assert(r.getAs[Long]("density_e6") >= 250000)
    }
    // pure map work: the only exchange in the plan is the final ORDER BY
    // range partitioning — no hash shuffle at any corpus size
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
  }

  test("q288 PR-AUC matches brute-force trapezoid over collected pairs") {
    QuerySpec.prepared(spark, sfDir)
    val r = one(llmops.QualityEval.q288PrAuc)
    val pairs = spark.table("documents")
      .select(col("n_chars"), (col("lang") === "en").cast("int"))
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    val np = pairs.map(_._2).sum.toDouble
    val cuts = pairs.map(_._1).distinct.sorted.reverse
    var cumP = 0L; var cum = 0L; var prevR = 0.0
    var prevP = Option.empty[Double]; var auc = 0.0
    for (c <- cuts) {
      val at = pairs.filter(_._1 == c)
      cumP += at.map(_._2).sum; cum += at.length
      val rr = cumP / np; val pp = cumP.toDouble / cum
      auc += (rr - prevR) * (pp + prevP.getOrElse(pp)) / 2
      prevR = rr; prevP = Some(pp)
    }
    assert(math.abs(auc * 1e6 - r.getAs[Long]("pr_auc_e6")) <= 1,
      s"brute PR-AUC $auc vs ${r.getAs[Long]("pr_auc_e6")}")
  }

  test("q289 ECE/MCE/Brier match collected brute force") {
    QuerySpec.prepared(spark, sfDir)
    val r = one(llmops.QualityEval.q289CalibrationEce)
    val pairs = spark.table("documents")
      .select(col("n_chars"), (col("lang") === "en").cast("int"))
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    val lo = pairs.map(_._1).min; val hi = pairs.map(_._1).max
    val withP = pairs.map { case (s, y) =>
      val p = (s - lo).toDouble / (hi - lo)
      (math.min(math.floor(10 * p).toInt, 9), p, y)
    }
    val n = pairs.length.toDouble
    val byBin = withP.groupBy(_._1)
    val ece = byBin.values.map(b =>
      math.abs(b.map(_._2).sum - b.map(_._3).sum)).sum / n
    val mce = byBin.values.map(b =>
      math.abs(b.map(_._2).sum / b.length - b.map(_._3).sum.toDouble / b.length)).max
    val brier = withP.map { case (_, p, y) => (p - y) * (p - y) }.sum / n
    assert(r.getAs[Long]("n_bins") == byBin.size)
    assert(math.abs(ece * 1e6 - r.getAs[Long]("ece_e6")) <= 1)
    assert(math.abs(mce * 1e6 - r.getAs[Long]("mce_e6")) <= 1)
    assert(math.abs(brier * 1e6 - r.getAs[Long]("brier_e6")) <= 2)
  }

  test("q290 RBO matches brute-force prefix-overlap computation") {
    QuerySpec.prepared(spark, sfDir)
    val r = one(llmops.QualityEval.q290RankRbo)
    val d = spark.table("documents")
      .select(col("doc_id"), col("n_chars"),
        size(array_distinct(split(col("text"), " "))).as("y"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
    val topA = d.sortBy(x => (-x._2, x._1)).take(50).map(_._1)
    val topB = d.sortBy(x => (-x._3.toLong, x._1)).take(50).map(_._1)
    var wsum = 0.0
    var ov10 = 0L; var ov50 = 0L
    for (k <- 1 to 50) {
      val ov = topA.take(k).toSet.intersect(topB.take(k).toSet).size
      wsum += math.pow(0.9, k - 1) * ov / k
      if (k == 10) ov10 = ov; if (k == 50) ov50 = ov
    }
    val rbo = wsum * 0.1 / (1 - math.pow(0.9, 50))
    assert(r.getAs[Long]("overlap_at_10") == ov10)
    assert(r.getAs[Long]("overlap_at_50") == ov50)
    assert(math.abs(rbo * 1e6 - r.getAs[Long]("rbo50_e6")) <= 1,
      s"brute RBO $rbo vs ${r.getAs[Long]("rbo50_e6")}")
  }

  test("q291 conditional entropy: matches brute force and info gain >= 0") {
    QuerySpec.prepared(spark, sfDir)
    val r = one(llmops.TextAnalysis.q291BigramCondEntropy)
    val docs = spark.table("documents").select("text")
      .collect().map(_.getString(0).split(" ").toSeq)
    val bigrams = docs.flatMap(w => w.zip(w.drop(1)))
    val n = bigrams.length.toDouble
    val byPrev = bigrams.groupBy(_._1)
    val hCond = -byPrev.values.map { g =>
      val cp = g.length.toDouble
      g.groupBy(_._2).values.map(b => b.length * math.log(b.length / cp)).sum
    }.sum / n
    assert(r.getAs[Long]("n_bigrams") == bigrams.length)
    assert(math.abs(hCond * 1e6 - r.getAs[Long]("cond_entropy_e6")) <= 1)
    assert(r.getAs[Long]("info_gain_e6") >= 0,
      "conditioning cannot increase entropy")
    assert(math.abs(math.exp(hCond) * 1e6 - r.getAs[Long]("bigram_ppl_e6")) <= 2)
  }

  test("q292 winnowing clones: invariants and agreement with q81's planted pairs") {
    QuerySpec.prepared(spark, sfDir)
    val rows = llmops.Dedup.q292WinnowingClones.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id_a") < r.getAs[Long]("doc_id_b"))
      assert(r.getAs[Long]("shared_fp") >= 5)
      assert(r.getAs[Long]("overlap_e6") >= 500000)
    }
    // the planted near-dups (q81, Jaccard >= 0.8) should be clone pairs
    // under the local fingerprint detector too — winnowing must not miss
    // the pairs the set-based detector finds at this overlap level
    val clones = rows.map(r =>
      (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"))).toSet
    val lsh = llmops.Dedup.q81MinHashLsh.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b"))).toSet
    assert(lsh.subsetOf(clones),
      s"winnowing missed planted near-dup pairs: ${lsh.diff(clones)}")
  }

  test("q293 piecewise trend matches brute-force split OLS at the CUSUM day") {
    QuerySpec.prepared(spark, sfDir)
    val r = one(operators.Events.q293PiecewiseTrend)
    val days = spark.table("events")
      .groupBy(col("ts").cast("date").as("day")).count()
      .orderBy("day").collect()
      .map(x => (x.getDate(0).toLocalDate, x.getLong(1).toDouble))
    val mu = days.map(_._2).sum / days.length
    val cusum = days.indices.map(i => days.take(i + 1).map(_._2).sum - (i + 1) * mu)
    val kIdx = cusum.indices.maxBy(i => (math.abs(cusum(i)), -days(i)._1.toEpochDay))
    assert(r.getAs[java.sql.Date]("change_day").toLocalDate == days(kIdx)._1)
    def ols(seg: Seq[(java.time.LocalDate, Double)]): (Double, Double) = {
      val epoch = java.time.LocalDate.parse("2024-01-01")
      val pts = seg.map(p => (java.time.temporal.ChronoUnit.DAYS.between(epoch, p._1).toDouble, p._2))
      val n = pts.length; val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum; val sx2 = pts.map(p => p._1 * p._1).sum
      ((n * sxy - sx * sy) / (n * sx2 - sx * sx), sy / n)
    }
    val (b0, m0) = ols(days.take(kIdx + 1).toSeq)
    val (b1, m1) = ols(days.drop(kIdx + 1).toSeq)
    assert(r.getAs[Long]("n_before") == kIdx + 1)
    assert(math.abs(b0 * 1e6 - r.getAs[Long]("slope_before_e6")) <= 1)
    assert(math.abs(b1 * 1e6 - r.getAs[Long]("slope_after_e6")) <= 1)
    assert(math.abs((m1 - m0) * 1e6 - r.getAs[Long]("level_shift_e6")) <= 1)
  }

  test("q294 BH adjustment: monotone, >= raw p, and the Kolmogorov series checks out") {
    QuerySpec.prepared(spark, sfDir)
    val rows = llmops.CorpusStats.q294KsDriftFdr.run(spark, sfDir).collect()
    rows.foreach(r => assert(r.getAs[Long]("p_adj_e6") + 1 >= r.getAs[Long]("p_e6"),
      s"${r.getAs[String]("source")}: adjusted p below raw p"))
    // BH adjusted p is nondecreasing when sorted by raw p
    val byP = rows.sortBy(r => (r.getAs[Long]("p_e6"), r.getAs[String]("source")))
      .map(_.getAs[Long]("p_adj_e6"))
    assert(byP.zip(byP.drop(1)).forall { case (a, b) => a <= b })
    // independent Kolmogorov-series recomputation for one source
    val nt = spark.table("documents").count()
    val r0 = rows.head
    val n = r0.getAs[Long]("n_docs").toDouble
    val ks = r0.getAs[Long]("ks_e6") / 1e6
    val ne = n * nt / (n + nt)
    val lam = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * ks
    val p = 2 * (1 to 50).map(j =>
      math.pow(-1, j - 1) * math.exp(-2.0 * j * j * lam * lam)).sum
    val pc = math.min(1.0, math.max(0.0, p))
    // ks passed through e6 rounding → tolerance reflects d(p)/d(ks)·1e-6·λ'
    assert(math.abs(pc * 1e6 - r0.getAs[Long]("p_e6")) <= 100,
      s"series p $pc vs ${r0.getAs[Long]("p_e6")}")
  }

  test("q295 EB shrinkage: between raw and grand mean, weights in [0,1]") {
    QuerySpec.prepared(spark, sfDir)
    val rows = llmops.CorpusStats.q295EbShrinkage.run(spark, sfDir).collect()
    val toks = spark.table("documents")
      .select(size(split(col("text"), " ")).as("t")).agg(sum("t"), count(lit(1)))
      .head()
    val gm = toks.getLong(0).toDouble / toks.getLong(1) * 1e6
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_mean_e6"); val sh = r.getAs[Long]("shrunk_mean_e6")
      val w = r.getAs[Long]("weight_e6")
      assert(w >= 0 && w <= 1000000)
      // shrunk mean lies between the raw mean and the grand mean
      assert((sh - raw) * (sh - gm) <= 0,
        s"${r.getAs[String]("source")}: shrunk $sh outside [raw $raw, grand $gm]")
      // bigger sources shrink less: weight grows with n among equal-σ² groups
    }
    val byN = rows.sortBy(_.getAs[Long]("n_docs"))
      .map(r => (r.getAs[Long]("n_docs"), r.getAs[Long]("weight_e6")))
    byN.zip(byN.drop(1)).foreach { case ((n1, w1), (n2, w2)) =>
      if (n1 < n2) assert(w1 <= w2, s"weight not monotone in n: ($n1,$w1) vs ($n2,$w2)")
    }
  }

  test("q287 log-odds: sides oppose and z ranks are internally consistent") {
    val rows = llmops.QualityEval.q287LogOddsTokens.run(spark, sfDir).collect()
    assert(rows.length == 10)
    val src0 = rows.filter(_.getAs[String]("side") == "src0")
    val src1 = rows.filter(_.getAs[String]("side") == "src1")
    assert(src0.length == 5 && src1.length == 5)
    // every src0-side z ≥ every src1-side z (top vs bottom of one ranking)
    assert(src0.map(_.getAs[Long]("z_e6")).min >=
      src1.map(_.getAs[Long]("z_e6")).max)
  }
}
