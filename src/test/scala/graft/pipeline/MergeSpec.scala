package graft.pipeline

import graft.SparkSpec

class MergeSpec extends SparkSpec {

  test("upsert: update matched, keep unmatched target, insert new source rows") {
    val spark2 = spark
    import spark2.implicits._
    val target = Seq(("a", "old", 1), ("b", "keep", 2)).toDF("id", "v", "n")
    val source = Seq(("a", "new"), ("c", "ins")).toDF("id", "v")
    val out = Merge.upsert(target, source, "id").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.get(2)))).toSet
    assert(out === Set(
      ("a", "new", Some(1)),   // updated v, kept n
      ("b", "keep", Some(2)),  // untouched
      ("c", "ins", None)))     // inserted; n has no source value
  }

  test("upsert is idempotent") {
    val spark2 = spark
    import spark2.implicits._
    val target = Seq(("a", "x")).toDF("id", "v")
    val source = Seq(("a", "y")).toDF("id", "v")
    val once = Merge.upsert(target, source, "id")
    val twice = Merge.upsert(once, source, "id")
    assert(once.collect().toSet === twice.collect().toSet)
  }

  test("deleteKeys removes exactly the keyed rows") {
    val spark2 = spark
    import spark2.implicits._
    val target = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("id", "n")
    val del = Seq("a", "c").toDF("id")
    assert(Merge.deleteKeys(target, del, "id").collect()
      .map(_.getString(0)).toSeq === Seq("b"))
  }
}
