package graft

/** Determinism and shape of the k-means balanced-sampling operator. */
class ClusteringSpec extends EngineSuite {

  test("kmeans output is identical under different parallelism") {
    val run1 = llmops.Clustering.q97KmeansBalanced.run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val run2 = llmops.Clustering.q97KmeansBalanced.run(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(run1 == run2, "clustering must be partitioning-independent")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert(run1.nonEmpty)
    // every cluster gets members and at most 3 sampled ids
    run1.foreach { r =>
      assert(r(1).asInstanceOf[Long] > 0)
      val ids = r(2).asInstanceOf[String].split(",").filter(_.nonEmpty)
      assert(ids.length <= 3 && ids.nonEmpty)
    }
  }

  test("q211 silhouette report is consistent with the q97 clustering") {
    val kmeans = llmops.Clustering.q97KmeansBalanced.run(spark, sfDir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sil = llmops.Clustering.q211ClusterSilhouette.run(spark, sfDir).collect()
    // same clusters, same membership counts as the clustering itself
    assert(sil.map(_.getInt(0)).toSet == kmeans.keySet)
    sil.foreach { r =>
      assert(r.getLong(1) == kmeans(r.getInt(0)), s"member count mismatch: $r")
      val (mean, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
      // silhouette is bounded and the rollup is ordered
      assert(lo >= -1000000L && hi <= 1000000L, s"silhouette out of range: $r")
      assert(lo <= mean && mean <= hi, s"mean outside [min, max]: $r")
    }
  }

  test("power-iteration axis is identical under different parallelism and unit-norm") {
    val run1 = llmops.Clustering.q228PcaAxis.run(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val run2 = llmops.Clustering.q228PcaAxis.run(spark, sfDir)
        .collect().map(_.toSeq).toSeq
      assert(run1 == run2, "power iteration must be partitioning-independent")
    } finally spark.conf.set("spark.sql.shuffle.partitions", prior)
    assert(run1.length == 8)
    // loadings are components of a unit vector, sign-canonicalized
    val l = run1.map(_(1).asInstanceOf[Long])
    assert(l.head > 0, "dominant loading must be canonicalized positive")
    assert(l.forall(v => math.abs(v) <= 1000000L), s"loading beyond unit bound: $l")
  }
}
