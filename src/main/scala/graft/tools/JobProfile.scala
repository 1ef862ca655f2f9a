package graft.tools

import graft.{Shared, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query action/stage profile — the diagnostic behind the round-20
  * optimization work. At sf0.1 the corpus is tiny (2k vectors, 5k
  * docs), so a query's seconds are NOT per-row compute: they are the
  * count of Spark jobs (each localCheckpoint, collect and accumulator
  * read is a driver round-trip of ~20-80 ms) times their stage depth.
  * This main runs each named query exactly like Bench's sequential
  * timedPass (cold cores, noop sink, full sweep after) and prints
  * `name wall_s jobs stages tasks` so chain-level fixes (shared cores,
  * fused actions) can be targeted and then re-measured.
  *
  * Run: `tools/run_main.sh graft.tools.JobProfile q88_ann_recall ...`
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as Bench).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobProfile <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val verbose = sys.env.get("GRAFT_PROFILE_VERBOSE").contains("1")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        jobStart.put(j.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (verbose) Option(jobStart.get(j.jobId)).foreach { case (t0, site) =>
          println(f"  job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $site")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        if (verbose) {
          val si = s.stageInfo
          val wall = (for (t0 <- si.submissionTime; t1 <- si.completionTime)
            yield t1 - t0).getOrElse(-1L)
          val run = si.taskMetrics.executorRunTime
          println(f"  stage ${si.stageId}%4d wall=$wall%5d ms run=$run%5d ms " +
            f"tasks=${si.numTasks}%3d  ${si.name.take(60)}")
        }
      }
    })
    def pass(name: String): (Double, Int, Int, Int) = {
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown: $name"))
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async: give the bus a beat so the counters
      // are this pass's (diagnostic-grade accuracy is fine here)
      Thread.sleep(300)
      val out = (wall, jobs.get, stages.get, tasks.get)
      Shared.clear()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      out
    }
    // warm pass per query (codegen/JIT), then the measured pass
    println(f"${"query"}%-32s ${"wall_s"}%8s ${"jobs"}%6s ${"stages"}%7s ${"tasks"}%7s")
    args.foreach { name =>
      pass(name)
      val (w, j, s, t) = pass(name)
      println(f"$name%-32s $w%8.2f $j%6d $s%7d $t%7d")
    }
    spark.stop()
  }
}
