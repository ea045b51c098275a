package graft

import scala.collection.mutable

/** Per-job profiling main — the measurement loop of the optimization
  * guide (§1): run a named query cold then warm with a SparkListener
  * attached, and print one line per Spark JOB (duration, #tasks, the
  * first stage's callsite) so the fixed-overhead structure of iterative
  * queries (checkpoint materializations, isEmpty probes, collect
  * barriers) is visible without the UI.
  *
  *   runMain graft.Profile /root/testdata/sf0.1 q381
  */
object Profile {
  final case class Job(id: Int, name: String, start: Long, tasks: Int,
                       var end: Long = 0L) {
    def totalMs: Long = if (end > 0) end - start else -1
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val prefixes = (if (args.length > 1) args(1) else "q381")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.engine.GraftSession.local(cores = cpus, shufflePartitions = cpus)
    graft.sources.TestTables.register(spark, sfDir)
    discard(spark.range(16).count())

    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.synchronized {
          val name = js.stageInfos.lastOption.map(_.name).getOrElse("?")
            .linesIterator.next()
          discard(jobs.put(js.jobId,
            Job(js.jobId, name, js.time, js.stageInfos.map(_.numTasks).sum)))
        }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(je.jobId).foreach(_.end = je.time) }
    }

    val queries = SparkEntry.queries
    val names = queries.keys.toSeq.sorted.filter(n => prefixes.exists(n.startsWith))
    names.foreach { name =>
      // cold run (plans + codegen) untracked; warm run profiled
      val t0 = System.nanoTime()
      discard(queries(name)(spark, sfDir).count())
      val cold = (System.nanoTime() - t0) / 1e9
      jobs.synchronized(jobs.clear())
      spark.sparkContext.addSparkListener(listener)
      import scala.jdk.CollectionConverters._
      def gcMs: Long = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
      System.gc()
      val gc0 = gcMs
      // Poor man's driver profiler (guide §7.3): sample every thread's
      // stack during the warm run and histogram the driver-side cost
      // centers (optimizer, analyzer, codegen+janino, AQE, scheduler).
      val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var sampling = true
      val sampler = new Thread(() => {
        val cats = Seq(
          "janino" -> Seq("org.codehaus.janino", "org.codehaus.commons"),
          "codegen" -> Seq("expressions.codegen", "doGenCode", "WholeStageCodegen"),
          "optimizer" -> Seq("catalyst.optimizer", "RuleExecutor"),
          "analyzer" -> Seq("catalyst.analysis"),
          "aqe" -> Seq("adaptive.AdaptiveSparkPlanExec", "adaptive."),
          "planner" -> Seq("execution.SparkStrategies", "QueryPlanner", "EnsureRequirements"),
          "scheduler" -> Seq("scheduler.DAGScheduler", "scheduler.TaskSchedulerImpl"),
          "parquetread" -> Seq("parquet"),
          "exec-task" -> Seq("executor.Executor"))
        while (sampling) {
          val all = Thread.getAllStackTraces
          all.forEach { (t, st) =>
            if (st.nonEmpty && t.getName != Thread.currentThread().getName) {
              val text = st.map(_.toString).mkString("\n")
              val cat = cats.collectFirst {
                case (c, pats) if pats.exists(text.contains) => c
              }
              cat.foreach(c => samples.merge(
                (if (t.getName.startsWith("Executor task launch")) "task:" else "drv:") + c,
                1, (a, b) => a + b))
            }
          }
          Thread.sleep(20)
        }
      })
      sampler.setDaemon(true)
      sampler.start()
      val t1 = System.nanoTime()
      discard(queries(name)(spark, sfDir).count())
      val warm = (System.nanoTime() - t1) / 1e9
      sampling = false
      val gcDelta = gcMs - gc0
      // the listener bus is async: give trailing onJobEnd events a beat
      // to drain before snapshotting, or the last jobs report totalMs=-1
      // (ADVICE r20)
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(listener)
      println("[profile] driver-sample histogram (20ms ticks): " +
        samples.asScala.toSeq.sortBy(-_._2.intValue)
          .map { case (k, v) => s"$k=$v" }.mkString(" "))
      println(f"[profile] ===== $name cold=$cold%.2fs warm=$warm%.2fs gc=${gcDelta}ms =====")
      val snap = jobs.synchronized(jobs.values.toVector)
      // jobs still missing their end event report -1 — exclude them from
      // the sum instead of subtracting (ADVICE r20)
      println(f"[profile] jobs=${snap.size} jobTimeSum=${snap.map(_.totalMs).filter(_ >= 0).sum / 1e3}%.2fs")
      snap.sortBy(-_.totalMs).take(40).foreach { j =>
        println(f"[profile]  ${j.totalMs}%6dms tasks=${j.tasks}%3d job#${j.id}%-4d ${j.name.take(110)}")
      }
    }
    spark.stop()
  }
}
