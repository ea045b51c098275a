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
}
