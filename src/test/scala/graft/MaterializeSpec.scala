package graft

import org.apache.spark.sql.functions._

/** [[Materialize]] — the policy switch between executor-local
  * checkpoints (local[32]) and reliable checkpoints (a cluster where a
  * lost executor must not abort the batch). The contract: results are
  * byte-identical across the switch, cores still build exactly once,
  * and reliable mode actually writes to the fault-tolerant dir. */
class MaterializeSpec extends SparkSpec {

  private def withMode[A](mode: String, dir: Option[String] = None)(f: => A): A = {
    val conf = spark.conf
    val prev = conf.getOption(Materialize.ModeKey)
    val prevDir = conf.getOption(Materialize.DirKey)
    try {
      conf.set(Materialize.ModeKey, mode)
      dir.foreach(conf.set(Materialize.DirKey, _))
      f
    } finally {
      prev.fold(conf.unset(Materialize.ModeKey))(conf.set(Materialize.ModeKey, _))
      prevDir.fold(conf.unset(Materialize.DirKey))(conf.set(Materialize.DirKey, _))
    }
  }

  test("reliable mode writes the core to the checkpoint dir and the " +
    "rows survive unchanged") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val out = withMode("reliable", Some(dir)) { Materialize.core(df) }
    assert(out.collect().map(r => (r.getLong(0), r.getString(1))).toSet ===
      (1 to 100).map(i => (i.toLong, s"v$i")).toSet)
    // the barrier is real: files landed under the reliable dir
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).count()
    assert(files > 0, s"expected checkpoint files under $dir")
  }

  test("Shared.memo builds a core exactly once under either policy, and " +
    "consumers read the same rows across the switch") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2").toString
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build() = {
      builds.incrementAndGet()
      (1 to 50).map(i => (i.toLong, i * 3L)).toDF("k", "x")
    }
    val local = Shared.memo(spark, "mat-spec-local")(build())
    Shared.memo(spark, "mat-spec-local")(build()) // memo hit: no rebuild
    val reliable = withMode("reliable", Some(dir)) {
      val r = Shared.memo(spark, "mat-spec-reliable")(build())
      Shared.memo(spark, "mat-spec-reliable")(build())
      r
    }
    assert(builds.get() === 2, "each core must build exactly once")
    val a = local.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = reliable.orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq, "policy must not change the rows")
    // per-query sweeps must not break a reliable core either: its data
    // lives in files, not block-manager storage
    Shared.sweepTransient(spark)
    assert(reliable.count() === 50)
  }

  test("boundedSelfPairs output is identical across the policy switch") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt3").toString
    val rnd = new scala.util.Random(5)
    val rows = (1 to 400).map { i =>
      (s"k${rnd.nextInt(4)}", i.toLong) // keys hot at hotDf=16
    }.toDF("k", "doc_id")
    def pairs() = graft.scale.Skew
      .boundedSelfPairs(rows, Seq("k"), "doc_id", hotDf = 16L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val local = pairs()
    val reliable = withMode("reliable", Some(dir)) { pairs() }
    assert(local === reliable)
    assert(local.nonEmpty)
  }

  test("a full production chain (simhash near-dup pairs) is " +
    "byte-identical under reliable materialization") {
    val spark2 = spark
    import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt4").toString
    val tmpl = (1 to 40).map(i => s"t${i % 13}").mkString(" ")
    val docs = ((1 to 80).map(i => (i.toLong, tmpl + s" m${i % 3}")) ++
      (81 to 120).map(i => (i.toLong, (1 to 30).map(j => s"u${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    def run() = graft.scale.Dedup.simhashPairs(docs, maxDist = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val local = run()
    val reliable = withMode("reliable", Some(dir)) { run() }
    assert(local === reliable)
    assert(local.nonEmpty)
  }

  test("an unknown mode fails loudly and names the conf key") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, 2L)).toDF("a", "b")
    withMode("wat") {
      val e = intercept[RuntimeException] { Materialize.core(df) }
      assert(e.getMessage.contains(Materialize.ModeKey))
    }
  }
}
