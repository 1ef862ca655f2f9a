package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.time.format.DateTimeFormatter
import java.time.{ZoneOffset, ZonedDateTime}

/** CLI façade mirroring the reference entry points (SURVEY §7.1 step 7;
  * `data_pipeline.py`, `create_dp.py`, `add_dp_to_review.py`,
  * `approve_datapoint.py`, `cancel_datapoint.py`, `read_datapoint.py`,
  * `init_seed_tasks.py`, `validate_all_prod_dps.py` +
  * `create_verified_csv.py`).
  *
  * State layout under --base <dir>:
  *   staging/   review/   production/     (CSV tables, quote-all)
  *   tasks/                               (TaskStore parquet snapshot)
  *   archive/                             (timestamped backups)
  *
  * Usage examples:
  *   pipeline --base d init-seeds <tasksDir>
  *   pipeline --base d next --agent a [--types seed_dp,draft_dp]
  *   pipeline --base d complete <taskId> --agent a [--status failed]
  *   pipeline --base d status | list
  *   pipeline --base d create-dp <taskId> <prompt> <dockerfile> <tests> <weightsJson> <difficulty>
  *   pipeline --base d add-to-review <taskId>
  *   pipeline --base d approve <taskId> --category c --tags "a|b"
  *   pipeline --base d read <taskId> [--table review]
  *   pipeline --base d verify-all [--docker]
  *   pipeline --base d dedup-batch --agent a    (claim → incremental
  *     span dedup vs $base/span_index → fold index → complete)
  */
object PipelineCli {

  private def nowIso(): String =
    ZonedDateTime.now(ZoneOffset.UTC)
      .format(DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSSxxx"))

  def main(args: Array[String]): Unit = {
    val base = argValue(args, "--base").getOrElse(sys.error("--base required"))
    val cmd = args.filterNot(_.startsWith("--"))
      .filterNot(a => argValue(args, "--base").contains(a)).headOption
      .getOrElse(sys.error("command required"))
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // each CLI call is its own JVM (the reference's process-per-command
    // model): serialize mutations through the flock-equivalent
    try TableIO.withLock(s"$base/.lock") { run(spark, base, cmd, args) }
    finally spark.stop()
  }

  def run(spark: SparkSession, base: String, cmd: String, args: Array[String]): Unit = {
    val positional = args.dropWhile(_ != cmd).drop(1).filterNot(_.startsWith("--"))
      .filterNot(a => args.sliding(2).exists(p => p.length == 2 && p(0).startsWith("--") && p(1) == a))
    def table(name: String): DataFrame = {
      // repair a crashed atomicOverwrite swap before reading (we hold
      // the CLI lock here, same as mutations)
      TableIO.recoverOld(s"$base/$name")
      TableIO.readCsv(spark, s"$base/$name", Some(
        if (name == "production") Schemas.productionSchema
        else if (name == "review") Schemas.reviewSchema else Schemas.stagingSchema))
    }
    def tableOrEmpty(name: String, cols: Seq[String]): DataFrame = {
      TableIO.recoverOld(s"$base/$name")
      if (Files.exists(Paths.get(s"$base/$name"))) table(name)
      else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(cols.map(c =>
          org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType))))
    }
    def commit(df: DataFrame, name: String): Unit =
      TableIO.atomicOverwrite(df, s"$base/$name", format = "csv", quoteAll = true)
    def store(): TaskStore = {
      // same crash-swap repair as the CSV tables: a writer that died
      // between the two renames left the task queue at tasks.old — a
      // fresh empty store here would silently wipe it on next save
      TableIO.recoverOld(s"$base/tasks")
      if (Files.exists(Paths.get(s"$base/tasks"))) TaskStore.load(spark, s"$base/tasks")
      else new TaskStore()
    }
    def saveStore(s: TaskStore): Unit = s.save(spark, s"$base/tasks")

    cmd match {
      case "init-seeds" =>
        val s = store()
        val seeds = SeedIngest.ingest(spark, positional(0))
        val existing = s.all.map(_.id).toSet
        val created = seeds.select("task_name").collect().map(_.getString(0))
          .filterNot(n => existing.contains(s"seed_dp_$n")) // J2 re-init dedup
        created.foreach(n => s.createTask("seed_dp",
          data = Map("task_name" -> n), id = Some(s"seed_dp_$n")))
        saveStore(s)
        println(s"created ${created.length} seed_dp task(s)")

      case "next" =>
        val s = store()
        val agent = argValue(args, "--agent").getOrElse("agent")
        val types = argValue(args, "--types").map(_.split(",").toSeq).getOrElse(Nil)
        s.getNextTask(agent, types) match {
          case Some(t) => saveStore(s); println(s"""{"id":"${t.id}","type":"${t.taskType}"}""")
          case None => println("no pending task")
        }

      case "complete" =>
        val s = store()
        val agent = argValue(args, "--agent").getOrElse("agent")
        val status = argValue(args, "--status").getOrElse("completed")
        val ok = s.completeTask(positional(0), agent, status)
        if (ok) saveStore(s)
        println(if (ok) "completed" else "not owner or not in progress")

      case "info" =>
        // task detail incl. parent-child relations (`data_pipeline.py info`)
        val s = store()
        s.getTask(positional(0)) match {
          case Some(t) =>
            println(s"id=${t.id} type=${t.taskType} status=${t.status}" +
              s" parent=${t.parentId.getOrElse("-")} locked_by=${t.lockedBy.getOrElse("-")}")
            t.data.toSeq.sortBy(_._1).foreach { case (k, v) => println(s"  data.$k=$v") }
            s.getTaskChildren(t.id).foreach(c => println(s"  child=${c.id} (${c.status})"))
          case None => println(s"no such task: ${positional(0)}")
        }

      case "create-task" =>
        val s = store()
        val t = s.createTask(
          argValue(args, "--type").getOrElse(sys.error("--type required")),
          parentId = argValue(args, "--parent"),
          data = args.sliding(2).collect {
            case Array("--data", kv) if kv.contains("=") =>
              val Array(k, v) = kv.split("=", 2); k -> v
          }.toMap)
        saveStore(s)
        println(t.id)

      case "save-artifact" =>
        // keyed JSON artifact store (`data_pipeline.py:202-253`)
        Files.createDirectories(Paths.get(s"$base/artifacts"))
        Files.writeString(Paths.get(s"$base/artifacts/${positional(0)}.json"),
          positional(1))
        println(s"saved artifact ${positional(0)}")

      case "get-artifact" =>
        val p = Paths.get(s"$base/artifacts/${positional(0)}.json")
        if (Files.exists(p)) println(Files.readString(p))
        else println(s"no artifact: ${positional(0)}")

      case "status" =>
        val s = store()
        println(s.getStatusSummary.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(" "))
        println(s.typeCounts.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(" "))

      case "list" =>
        store().all.foreach(t =>
          println(s"${t.id}\t${t.taskType}\t${t.status}\t${t.parentId.getOrElse("-")}"))

      case "create-dp" =>
        val Seq(taskId, prompt, dockerfile, tests, weights, difficulty) =
          positional.take(6).toSeq
        require(Schemas.Difficulties.contains(difficulty),
          s"invalid difficulty: $difficulty")
        val staging = tableOrEmpty("staging", Schemas.StagingColumns)
        require(!DatapointOps.exists(staging, taskId), s"duplicate: $taskId")
        import spark.implicits._
        val now = nowIso()
        val row = Seq((taskId, prompt, dockerfile, tests, weights, "", difficulty, now, now))
          .toDF(Schemas.StagingColumns: _*)
        commit(DatapointOps.insert(staging, row), "staging")
        println(s"created $taskId in staging")

      case "add-to-review" =>
        val taskId = positional(0)
        val staging = table("staging")
        val review = tableOrEmpty("review", Schemas.ReviewColumns)
        val (newReview, newStaging) =
          DatapointOps.moveToReview(staging, review, taskId, nowIso())
        // commit ordering = txn safety: review first, then staging (M4)
        commit(newReview, "review")
        commit(newStaging, "staging")
        println(s"moved $taskId to review")

      case "approve" =>
        val taskId = positional(0)
        val category = argValue(args, "--category").getOrElse(sys.error("--category"))
        val tags = argValue(args, "--tags").getOrElse(sys.error("--tags"))
        val review = table("review")
        val production = tableOrEmpty("production", Schemas.ProductionColumns)
        val now = nowIso()
        val newProd = ReviewOps.approve(review, production, taskId, category, tags, now)
        TableIO.archiveSnapshotIfExists(s"$base/production", s"$base/archive")
        commit(newProd, "production")
        commit(DatapointOps.markReviewed(review, taskId, now), "review")
        println(s"approved $taskId into production")

      case "cancel" =>
        val taskId = positional(0)
        val category = argValue(args, "--category").getOrElse("other")
        val reason = argValue(args, "--reason").getOrElse("")
        val artifact = ReviewOps.cancellationArtifact(
          taskId, category, reason, "review_agent", 1, "", nowIso())
        import spark.implicits._
        val json = Seq(1).toDF("i").select(artifact.as("j")).head().getString(0)
        Files.createDirectories(Paths.get(s"$base/cancelled"))
        Files.writeString(Paths.get(s"$base/cancelled/$taskId.json"), json)
        commit(DatapointOps.markReviewed(table("review"), taskId, nowIso()), "review")
        println(s"cancelled $taskId")

      case "patch" =>
        // column patch by key (M1): --set col=value pairs
        val taskId = positional(0)
        val table_ = argValue(args, "--table").getOrElse("staging")
        val updates = args.sliding(2).collect {
          case Array("--set", kv) if kv.contains("=") =>
            val Array(k, v) = kv.split("=", 2); k -> v
        }.toMap
        require(updates.nonEmpty, "at least one --set col=value required")
        commit(DatapointOps.patch(table(table_), taskId, updates, nowIso()), table_)
        appendAudit(spark, base, taskId, "patch", updates.keys.mkString(","))
        println(s"patched ${updates.size} column(s) of $taskId in $table_")

      case "patch-files" =>
        // nested file-map mutation (M7): --mode update|remove|replace|append
        val taskId = positional(0)
        val table_ = argValue(args, "--table").getOrElse("staging")
        val mode = argValue(args, "--mode").getOrElse("update")
        val files = args.sliding(2).collect {
          case Array("--file", kv) if kv.contains("=") =>
            val Array(k, v) = kv.split("=", 2); k -> v
        }.toMap
        commit(DatapointOps.patchFiles(table(table_), taskId, mode, files, nowIso()),
          table_)
        appendAudit(spark, base, taskId, s"patch-files:$mode", files.keys.mkString(","))
        println(s"$mode ${files.size} file(s) of $taskId in $table_")

      case "read" =>
        val taskId = positional(0)
        val t = argValue(args, "--table").getOrElse("review")
        val row = DatapointOps.pointLookup(table(t), taskId)
        ReviewOps.markdown(row).select("markdown").collect()
          .foreach(r => println(r.getString(0)))

      case "categories" =>
        // enum listing (`show_categories_tags.py:1-57`): the valid
        // category and tag vocabularies reviewers classify against
        println(s"categories (${Schemas.Categories.size}):")
        Schemas.Categories.foreach(c => println(s"  $c"))
        println(s"tags (${Schemas.Tags.size}):")
        Schemas.Tags.foreach(t => println(s"  $t"))
        println(s"difficulties: ${Schemas.Difficulties.mkString(", ")}")
        println(s"cancellation categories: ${Schemas.CancellationCategories.mkString(", ")}")

      case "reconcile" =>
        // M4 crash recovery (SURVEY §7.4.4): the move commits review
        // FIRST, staging second — a crash between the two leaves the
        // row in both tables. Review is the source of truth, so drop
        // staging rows whose id already reached review (anti-join).
        val staging = table("staging")
        val review = table("review")
        val dupes = staging.join(review.select("task_id"), Seq("task_id"), "left_semi")
        val n = dupes.count()
        if (n > 0) {
          commit(staging.join(review.select("task_id"), Seq("task_id"), "left_anti"),
            "staging")
        }
        println(s"reconciled: removed $n staging row(s) already in review")

      case "verify-all" =>
        val production = table("production")
        val verified = Validators.verifiedDataset(spark, production,
          new SubprocessRunner, runDocker = args.contains("--docker"))
        commit(verified, "latest_verified")
        println(s"verified ${verified.count()} of ${production.count()} production row(s)")

      case "dedup-batch" =>
        // Coordination + data plane in one lifecycle (the shape of the
        // reference's validate-all driver,
        // `scripts/validate_all_prod_dps.py:136-216`: claim → work →
        // record → complete), with the work being the span-index data
        // plane: flag the claimed batch's duplicated spans against the
        // persisted index (only the batch tokenizes), then fold the
        // batch in additively. Task data.batch names a (doc_id, text)
        // parquet; batches must carry fresh doc_ids (the
        // incrementalDedup disjointness contract).
        val s = store()
        val agent = argValue(args, "--agent").getOrElse("agent")
        s.getNextTask(agent, Seq("dedup_batch")) match {
          case None => println("no pending task")
          case Some(t) =>
            saveStore(s) // persist the claim BEFORE working (P2): a
                         // crash mid-work leaves an in-progress task
                         // the timeout sweep can recover
            val batch = spark.read.parquet(t.data.getOrElse("batch",
              sys.error(s"task ${t.id} has no data.batch")))
              .select("doc_id", "text")
            val stats = batch.agg(min(col("doc_id")), max(col("doc_id"))).head()
            require(!stats.isNullAt(0), s"batch for ${t.id} is empty")
            val (batchMin, batchMax) = (stats.getLong(0), stats.getLong(1))
            val idxPath = s"$base/span_index"
            val prev = if (new java.io.File(idxPath).exists)
              Some(spark.read.parquet(idxPath)) else None
            val index = prev.map(_.select("h", "df"))
              .getOrElse(graft.scale.Dedup.spanIndex(batch.limit(0)))
            // max_doc high-watermark, riding INSIDE the same atomic
            // write as the index rows (the EventStreams.toSpanIndexSink
            // discipline; a seeded plain (h, df) index is tolerated —
            // the first fold starts stamping it). Under the monotone
            // doc-id contract it answers BOTH lifecycle questions an
            // additive fold must get right:
            //  - batchMax <= max_doc → every batch doc is already
            //    folded. If this task's span output exists, this is a
            //    crashed task re-claimed after its fold committed (any
            //    number of OTHER folds may have intervened — a
            //    single-slot "last folded task" marker would miss
            //    that): complete without recomputing, because
            //    re-deriving spans against an index the batch is
            //    already inside would count every batch window against
            //    itself. If the output does NOT exist, someone
            //    resubmitted already-indexed documents under a new
            //    task id: refuse, folding again would double-count.
            //  - otherwise require batchMin > max_doc: a partial
            //    overlap violates the disjointness df-additivity
            //    rests on, so fail loudly (the streaming twin's
            //    require, same message shape).
            val maxDoc = prev.filter(_.columns.contains("max_doc"))
              .flatMap(_.agg(max(col("max_doc"))).head() match {
                case r if r.isNullAt(0) => None
                case r => Some(r.getLong(0))
              })
            val outDir = s"$base/batch_spans/${t.id}"
            val alreadyFolded = maxDoc.exists(batchMax <= _)
            if (alreadyFolded) {
              require(new java.io.File(outDir).exists,
                s"disjoint-batch contract violated: batch doc_ids " +
                  s"[$batchMin..$batchMax] are already folded (index " +
                  s"covers up to ${maxDoc.get}) and no span output " +
                  s"exists for ${t.id} — re-submitted batch? folding " +
                  "again would double-count dfs")
            } else {
              maxDoc.foreach { m =>
                require(batchMin > m,
                  s"disjoint-batch contract violated: batch doc_ids " +
                    s"start at $batchMin but the index already covers " +
                    s"up to $m — df counts only add when no document " +
                    "is folded twice")
              }
              TableIO.atomicOverwrite(
                graft.scale.Dedup.incrementalDupSpans(batch, index), outDir)
              TableIO.atomicOverwrite(
                graft.scale.Dedup.spanIndexMerge(index, batch)
                  .withColumn("max_doc", lit(batchMax))
                  .withColumn("folded_task", lit(t.id)), idxPath)
            }
            val nSpans = spark.read.parquet(outDir).count()
            s.updateTaskData(t.id, Map("n_spans" -> nSpans.toString))
            s.completeTask(t.id, agent)
            saveStore(s)
            appendAudit(spark, base, t.id, "dedup-batch", s"n_spans=$nSpans")
            println(s"""{"task":"${t.id}","n_spans":$nSpans,"folded":${!alreadyFolded}}""")
        }

      case other => sys.error(s"unknown command: $other")
    }
  }

  private def argValue(args: Array[String], flag: String): Option[String] =
    args.sliding(2).collectFirst { case Array(`flag`, v) => v }

  /** Audit-history sink (S11; reference `.history/` JSON log entries,
    * `patch_additional_files.py:87-102`): one JSON line per mutation,
    * append-only. */
  private def appendAudit(spark: SparkSession, base: String, taskId: String,
                          op: String, detail: String): Unit = {
    import spark.implicits._
    Seq((taskId, op, detail, nowIso()))
      .toDF("task_id", "op", "detail", "at")
      .write.mode("append").json(s"$base/history")
  }
}
