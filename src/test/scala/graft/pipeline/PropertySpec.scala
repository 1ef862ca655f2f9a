package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY §5.2): weight-validation totals,
  * normalize idempotence, tag-parse round-trips, claim-exactly-once
  * under arbitrary schedules. Uses raw ScalaCheck generators (the
  * scalatest bridge isn't on the classpath) with fixed sample counts.
  */
class PropertySpec extends SparkSpec {

  def samples[T](g: Gen[T], n: Int): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq


  val weightGen: Gen[Map[String, Double]] = for {
    n <- Gen.choose(1, 4)
    names <- Gen.listOfN(n, Gen.identifier.map(s => s"test_${s.take(8)}"))
    if names.distinct.size == n
  } yield {
    val w = 1.0 / n
    names.distinct.map(_ -> w).toMap
  }

  test("property: equal-split weight maps over their own test names always validate") {
    samples(weightGen, 20).foreach { w =>
      val spark2 = spark
      import spark2.implicits._
      val tests = w.keys.map(n => s"def $n():\n  pass").mkString("\n")
      val json = w.map { case (k, v) => s""""$k": $v""" }.mkString("{", ",", "}")
      val df = Seq(("t", tests, json)).toDF("task_id", "test_functions", "test_weights")
      val valid = DatapointOps.validateWeights(df)
        .select("weights_valid").head().getBoolean(0)
      assert(valid, s"weights=$json tests=$tests")
    }
  }

  test("property: normalize is idempotent and always yields the standard schema") {
    val colsGen = Gen.someOf(Schemas.ReviewColumns).suchThat(_.nonEmpty)
    samples(colsGen, 15).foreach { cols =>
      val spark2 = spark
      import spark2.implicits._
      val df = Seq(Seq.fill(cols.size)("v")).map(vs => vs.mkString("|"))
        .toDF("packed")
        .select(cols.toSeq.zipWithIndex.map { case (c, i) =>
          split(col("packed"), "\\|").getItem(i).as(c)
        }.toSeq: _*)
      val once = DatapointOps.normalize(df, Schemas.ReviewColumns)
      val twice = DatapointOps.normalize(once, Schemas.ReviewColumns)
      assert(once.columns === Schemas.ReviewColumns.toArray)
      assert(once.collect() === twice.collect())
    }
  }

  test("property: tag strings of 1-3 vocabulary tags validate; any bad tag fails") {
    val goodGen = for {
      n <- Gen.choose(1, 3)
      tags <- Gen.pick(n, Schemas.Tags)
    } yield tags.mkString("|")
    samples(goodGen, 20).foreach { tags =>
      val spark2 = spark
      import spark2.implicits._
      assert(Seq(tags).toDF("tags")
        .select(DatapointOps.validateTags(col("tags"))).head().getBoolean(0))
    }
    val badGen = for {
      good <- Gen.pick(1, Schemas.Tags)
      bad <- Gen.identifier.suchThat(s => !Schemas.Tags.contains(s))
    } yield s"${good.head}|$bad"
    samples(badGen, 10).foreach { tags =>
      val spark2 = spark
      import spark2.implicits._
      assert(!Seq(tags).toDF("tags")
        .select(DatapointOps.validateTags(col("tags"))).head().getBoolean(0))
    }
  }

  test("property: N tasks, M concurrent claimers — every task claimed exactly once") {
    samples(Gen.zip(Gen.choose(1, 15), Gen.choose(1, 8)), 10).foreach { case (n, m) =>
      val store = new TaskStore()
      (1 to n).foreach(i => store.createTask("t", id = Some(s"task$i")))
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.global
      val claims = Await.result(
        Future.sequence((1 to (n + m)).map(i =>
          Future(store.getNextTask(s"agent$i")))), 30.seconds).flatten
      assert(claims.size === n)
      assert(claims.map(_.id).distinct.size === n)
    }
  }
}
