package graft

/** Properties of the corpus-sharding operators: assignments are pure
  * functions of doc_id (partitioning-independent), split fractions land
  * near their targets, and shards stay balanced. */
class ShardingSpec extends EngineSuite {

  test("split/shard/mix outputs are identical under different parallelism") {
    val names = Seq("q130_split_train_val_test", "q131_shuffle_shards",
      "q135_text_source_mix", "q150_sample_weighted")
    val run1 = names.map(n => SparkEntry.queries(n)(spark, sfDir)
      .collect().map(_.toSeq).toSeq)
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val run2 = names.map(n => SparkEntry.queries(n)(spark, sfDir)
        .collect().map(_.toSeq).toSeq)
      assert(run1 == run2, "shard assignment must be partitioning-independent")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
  }

  test("train/val/test fractions approximate 80/10/10") {
    val rows = SparkEntry.queries("q130_split_train_val_test")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2))
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val total = bySplit.values.sum.toDouble
    assert(total > 0)
    // multiplicative hashing is not perfectly uniform at tiny SF — wide bands
    assert(bySplit.getOrElse("train", 0L) / total > 0.6, bySplit.toString)
    assert(bySplit.getOrElse("val", 0L) / total < 0.25, bySplit.toString)
    assert(bySplit.getOrElse("test", 0L) / total < 0.25, bySplit.toString)
  }

  test("weighted sample over-represents heavy documents") {
    val sample = SparkEntry.queries("q150_sample_weighted")(spark, sfDir)
      .collect().map(_.getLong(3))
    assert(sample.length == 100)
    val corpus = QuerySpec.prepared(spark, sfDir).table("documents")
      .collect().map(_.getAs[Long]("n_chars"))
    val sampleAvg = sample.sum.toDouble / sample.length
    val corpusAvg = corpus.sum.toDouble / corpus.length
    assert(sampleAvg > corpusAvg,
      s"weight-proportional sample should skew heavy: $sampleAvg vs $corpusAvg")
  }

  test("q170 temperature mix: smallest language kept whole, rates flatten toward uniform") {
    val rows = SparkEntry.queries("q170_text_temperature_mix")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // the smallest language anchors at rate 1.0 (downsample-only mixing)
    val minTotal = rows.map(_._2).min
    rows.filter(_._2 == minTotal).foreach { case (s, _, k, rate) =>
      assert(rate == 1.0 && k == minTotal, s"anchor language $s: rate=$rate kept=$k")
    }
    rows.foreach { case (s, total, kept, rate) =>
      // rate_s = sqrt(min_n / n_s), monotone-decreasing in source size
      assert(math.abs(rate - math.sqrt(minTotal.toDouble / total)) < 1e-6, s"$s rate $rate")
      assert(kept <= total)
      // the hash selection tracks the rate (binomial tolerance)
      val expect = rate * total
      assert(math.abs(kept - expect) <= 4 * math.sqrt(expect) + 2,
        s"$s kept $kept, expected ≈ $expect")
    }
    // flattening: kept shares must be strictly more uniform than raw shares
    def spread(xs: Seq[Double]) = xs.max / xs.min
    val raw = spread(rows.toIndexedSeq.map(_._2.toDouble))
    val mixed = spread(rows.toIndexedSeq.map(_._3.toDouble max 1.0))
    assert(mixed < raw, s"mix did not flatten: $mixed vs $raw")
  }

  test("shards partition the corpus with bounded skew") {
    val rows = SparkEntry.queries("q131_shuffle_shards")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val total = rows.map(_._2).sum
    val docs = QuerySpec.prepared(spark, sfDir).table("documents").count()
    assert(total == docs, s"shards must cover every doc exactly once ($total vs $docs)")
    val max = rows.map(_._2).max.toDouble
    assert(max / (total.toDouble / rows.length) < 3.0,
      s"shard skew too high: $rows")
  }
}
