package graft.pipeline

import graft.SparkSpec

class TypedSpec extends SparkSpec {

  val stagingCsv = "/root/reference/agents/dp_builder_workspace/staging/datapoints.csv"
  val reviewCsv = "/root/reference/agents/dp_builder_workspace/review/datapoints_for_review.csv"

  test("typed staging view: decoded maps, golden weight/file stats") {
    val ds = Typed.datapoints(TableIO.readCsv(spark, stagingCsv))
    val rows = ds.collect()
    assert(rows.length === 46)
    // golden: tests-per-row (by weight keys) {2:42, 3:4}; files histogram head {0:1, 1:7}
    val weightHist = rows.groupBy(_.test_weights.size).view.mapValues(_.length).toMap
    assert(weightHist === Map(2 -> 42, 3 -> 4))
    val fileHist = rows.groupBy(_.additional_files.size).view.mapValues(_.length).toMap
    assert(fileHist(0) === 1 && fileHist(1) === 7)
    // every weight map sums to ~1.0 after typed decode
    rows.foreach { r =>
      val s = r.test_weights.values.sum
      assert(s > 0.999 && s < 1.001, s"${r.task_id}: $s")
    }
    // staging has no reviewed_at column → all None
    assert(rows.forall(_.reviewed_at.isEmpty))
  }

  test("typed review view: 234 rows, all reviewed, parsed timestamps ordered") {
    val rows = Typed.datapoints(TableIO.readCsv(spark, reviewCsv)).collect()
    assert(rows.length === 234)
    assert(rows.forall(_.reviewed_at.nonEmpty))
    // created_at <= reviewed_at wherever both parse
    rows.filter(r => r.created_at.nonEmpty).foreach { r =>
      assert(!r.created_at.get.after(r.reviewed_at.get),
        s"${r.task_id}: created ${r.created_at} after reviewed ${r.reviewed_at}")
    }
  }
}
