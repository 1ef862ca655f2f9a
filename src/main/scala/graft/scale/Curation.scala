package graft.scale

import graft.{QueryModule, Tables => T}
import graft.Materialize.CoreOps
import graft.functions.PortableFuncs._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: sampling,
  * per-group caps, representative selection, and k-means clustering —
  * the "shape the dataset" layer that runs after dedup/quality at
  * 100 TB.
  *
  * Determinism: every sampler here is hash- or id-ordered, never
  * `rand()` — reruns and retries pick the same rows, which a lazy
  * engine requires (a task retry re-executes the sample).
  */
object Curation extends QueryModule {

  /** Deterministic per-stratum downsample: keep ~fraction of each
    * group, selected by a uniform md5 hash of the id (stable across
    * runs/retries, unlike sampleBy's seeded-but-order-dependent
    * Bernoulli on recomputed partitions). */
  def stratifiedSample(df: DataFrame, idCol: String,
                       fractions: Map[String, Double],
                       strataCol: String): DataFrame = {
    val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    // portableHash60 / 2^60 is uniform in [0,1)
    df.filter(portableHash60(col(idCol).cast("string")).cast("double")
      / lit((1L << 60).toDouble) < frac)
  }

  /** Target-mixture sampling — the data-mixing op: given a TARGET
    * share per stratum (e.g. the language distribution the training
    * run wants), derive each stratum's sampling rate from its actual
    * availability — `rate_s = min(1, target_s · N / n_s)` — and apply
    * the same deterministic hash filter as [[stratifiedSample]].
    * Where [[stratifiedSample]] takes rates as given, this SOLVES for
    * them; over-represented strata are downsampled toward the target,
    * under-represented ones keep everything (rate capped at 1).
    *
    * Scale design: the rate table is one tiny aggregate (stratum
    * cardinality) cross-joined with a 1-row total and broadcast back —
    * no driver collect, so a million-stratum corpus works unchanged;
    * the filter itself is scan-side. The rate arithmetic is one IEEE
    * multiply + divide of exact integers per stratum — bit-identical
    * in any engine, so the oracle reproduces the sampled set exactly. */
  def mixtureSample(df: DataFrame, target: Map[String, Double],
                    strataCol: String, idCol: String): DataFrame = {
    val targetExpr = target.foldLeft(lit(0.0)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_s"))
    val totals = df.agg(count(lit(1)).as("n_total"))
    val rates = counts.crossJoin(totals)
      .select(col(strataCol),
        least(lit(1.0), targetExpr * col("n_total") / col("n_s")).as("rate"))
    df.join(broadcast(rates), strataCol)
      .filter(portableHash60(col(idCol).cast("string")).cast("double")
        / lit((1L << 60).toDouble) < col("rate"))
  }

  /** Cap every group at `k` rows, keeping the hash-smallest ids — a
    * deterministic distributed reservoir (per-source caps, dedup-
    * cluster representatives). One shuffle by group. */
  def perGroupCap(df: DataFrame, groupCol: String, idCol: String,
                  k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(portableHash60(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Diversity sampling: one representative per LSH bucket (the
    * hash-partitioned analogue of farthest-point sampling — buckets
    * partition the embedding space by random hyperplanes, so one pick
    * per bucket spreads the sample). */
  def diversitySample(emb: DataFrame): DataFrame = {
    val buckets = Similarity.lshBuckets(emb)
    // "first vec_id per bucket" IS min() — the aggregate gets map-side
    // partials, where the row_number window shuffled and sorted every
    // (bucket, vec_id) row just to keep one
    buckets.groupBy(col("bucket"))
      .agg(min(col("vec_id")).as("rep_id"))
  }

  /** Lloyd's k-means over the embedding column: deterministic init
    * (first k vectors), `iters` rounds of assign (broadcast centroids,
    * argmax cosine) + recompute (mean per cluster). Each round is one
    * broadcast join + one hash-aggregate over the corpus — O(iters)
    * passes, no pairwise blowup. Returns (vec_id, cluster). */
  def kmeans(emb: DataFrame, k: Int = 8, iters: Int = 3): DataFrame = {
    val spark = emb.sparkSession
    val vecs = Layout.widen(emb)
      .select(col("vec_id"), toDoubleArray(col("embedding")).as("v"))
      .cache()
    var centroids: Array[(Int, Seq[Double])] = vecs
      .filter(col("vec_id") < k).orderBy("vec_id").collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Double](1) }

    def assignTo(cents: Array[(Int, Seq[Double])]): DataFrame =
      // argmax as a SCAN-SIDE PROJECTION (the ivfCellsWith kernel):
      // the k centroids are bounded driver data, so they ride as a
      // plan constant inside argmax_cosine (strict > over ascending
      // ids ≡ the former max_by over (cos, -cluster) tie-break). The
      // former explode + groupBy(vec_id) aggregate re-shuffled the
      // whole corpus each Lloyd round to compute a value every row
      // determines alone; now the only per-round exchange is the
      // k-group centroid recompute (map-side partials collapse it)
      vecs.select(col("vec_id"), col("v"),
        graft.functions.VectorExpressions.argMaxCosine(col("v"),
          cents.toSeq.map { case (cid, cv) => (cid.toLong, cv) })
          .cast("int").as("cluster"))

    (1 to iters).foreach { _ =>
      val assigned = assignTo(centroids)
      val dim = centroids.head._2.length
      centroids = assigned.groupBy(col("cluster"))
        .agg(array((0 until dim).map(i =>
          avg(element_at(col("v"), i + 1))): _*).as("cv"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
        .sortBy(_._1)
    }
    val out = assignTo(centroids).select(col("vec_id"), col("cluster"))
    vecs.unpersist()
    out
  }

  /** Sequence packing (GPT-style concat-and-chunk): documents are
    * concatenated in doc_id order and the token stream is cut every
    * `maxTokens` — per document, its global token interval and the
    * training chunks it lands in. The op every LLM data pipeline runs
    * last, turning a curated corpus into fixed-length training rows.
    *
    * Scale design — a DISTRIBUTED PREFIX SUM, not a global window
    * (a single `Window.orderBy` with no partition key funnels 100 TB
    * through ONE task):
    *   1. range-partition by doc_id (partitions ordered by key),
    *   2. one tiny per-partition total aggregate → collect
    *      `numPartitions` rows to the driver (bounded by cluster
    *      size, not data size), prefix-sum them there,
    *   3. broadcast the per-partition offsets back and window-cumsum
    *      WITHIN each partition.
    * Every row moves once; the only global coordination is the
    * partition-count-sized offset table. Zero-token docs are excluded
    * (they occupy no interval). */
  def sequencePack(docs: DataFrame, maxTokens: Int = 2048,
                   partitions: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    val t = docs
      .select(col("doc_id"),
        ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks"))
      .filter(col("toks") > 0)
      .repartitionByRange(partitions, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .coreCheckpoint() // pid must not be recomputed under a different plan
    val totals = t.groupBy(col("pid")).agg(sum(col("toks")).as("total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot)
    }.tail.zip(totals).map { case ((pid, cumIncl), (_, tot)) =>
      (pid, cumIncl - tot)
    }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
    t.join(broadcast(offDf), "pid")
      .withColumn("cum_end", sum(col("toks")).over(w) + col("offset"))
      .withColumn("cum_start", col("cum_end") - col("toks"))
      .select(col("doc_id"), col("toks"), col("cum_start"), col("cum_end"),
        expr(s"cum_start div $maxTokens").as("chunk_first"),
        expr(s"(cum_end - 1) div $maxTokens").as("chunk_last"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + 1)
  }

  /** q145: packing-efficiency audit — certify-the-packing for
    * [[sequencePack]] (q73): the 1-row dashboard an owner reads
    * after a packing run — documents and tokens packed, chunks
    * produced, how many documents straddle a chunk boundary (each
    * split costs an attention-mask seam or a truncation downstream),
    * the worst per-doc spread, and the fill ratio (tokens ÷ chunk
    * capacity — the padding waste the packer exists to minimize).
    *
    * Scale design: one aggregate over the q73 output (which is itself
    * the distributed prefix-sum chain) — map-side partials collapse
    * to a single row; the ratio is one floor-r6'd IEEE division of
    * exact integers. */
  def packEfficiency(docs: DataFrame, maxTokens: Int = 2048,
                     partitions: Int = 32): DataFrame =
    packEfficiencyFrom(sequencePack(docs, maxTokens, partitions), maxTokens)

  /** [[packEfficiency]] from a packed table — shared-chain form. */
  private[scale] def packEfficiencyFrom(packed: DataFrame,
                                        maxTokens: Int): DataFrame =
    packed.agg(
      count(lit(1)).as("n_docs"),
      sum(col("toks")).as("total_tokens"),
      (max(col("chunk_last")) + 1L).as("n_chunks"),
      count(when(col("chunk_last") > col("chunk_first"), 1))
        .as("n_split_docs"),
      max(col("chunk_last") - col("chunk_first") + 1L)
        .as("max_chunks_per_doc"))
    .select(col("n_docs"), col("total_tokens"), col("n_chunks"),
      col("n_split_docs"), col("max_chunks_per_doc"),
      (floor(col("total_tokens").cast("double") /
        (col("n_chunks") * maxTokens) * 1000000d + 0.5d) / 1000000d)
        .as("fill_ratio"))

  /** q144: context-window chunking — the per-document sibling of
    * [[sequencePack]]: where q73 packs the whole corpus into a global
    * token stream, this slices EACH document into overlapping
    * fixed-size windows (`chunkSize` tokens every `stride` tokens,
    * the RAG / long-context preprocessing shape; overlap =
    * chunkSize − stride keeps boundary context). Per chunk: its index
    * and [tok_start, tok_end) word interval; the final chunk is
    * truncated at the document end, and every token is covered
    * (stride ≤ chunkSize enforced).
    *
    * Scale design: a pure scan-side projection + generate — zero
    * joins, zero shuffles, no state: each doc emits
    * ⌊(n−1)/stride⌋ + 1 rows from its own word count. Intervals are
    * integer arithmetic; both engines derive identical rows. */
  def chunkSpans(docs: DataFrame, chunkSize: Int = 64,
                 stride: Int = 48): DataFrame = {
    require(chunkSize >= 1 && stride >= 1 && stride <= chunkSize,
      s"chunkSpans: need 1 <= stride <= chunkSize, got $stride/$chunkSize")
    Layout.widen(docs)
      .select(col("doc_id"),
        size(words(col("text"))).as("n"))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("n"),
        explode(sequence(lit(0), expr(s"(n - 1) div $stride").cast("int")))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx").cast("long") * stride).as("tok_start"),
        least(col("chunk_idx").cast("long") * stride + chunkSize,
          col("n").cast("long")).as("tok_end"))
      .withColumn("n_toks", col("tok_end") - col("tok_start"))
  }

  /** Token-budget selection — "give me the best B tokens": rank the
    * corpus by quality (the q34 composite, ties broken doc_id ASC) and
    * keep documents while the cumulative token count stays within the
    * budget. The op every fixed-compute training run ends curation
    * with: the budget is the token budget of the run, the order is
    * whatever quality model the pipeline trusts.
    *
    * Scale design: the same distributed prefix-sum as [[sequencePack]]
    * — a single global `Window.orderBy` would funnel 100 TB through
    * one task, so instead: range-partition by (quality DESC, doc_id),
    * per-partition totals → driver prefix-sum (numPartitions rows),
    * broadcast offsets, window WITHIN partitions only. Quality and
    * token estimate are scan-side projections (one corpus pass); the
    * selection filter runs post-window, so every row moves exactly
    * once. Zero-token docs are excluded (they ship no training
    * signal and would tie at the cut). */
  def budgetSelect(docs0: DataFrame, budget: Long = 20000L,
                   partitions: Int = 32): DataFrame = {
    val docs = Layout.widen(docs0)
    budgetSelectFrom(docs.select(col("doc_id"),
      portableRound(TextAnalysis.qualityExpr(col("text")), 4).as("quality"),
      ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks")),
      budget, partitions)
  }

  /** [[budgetSelect]] from a pre-scored (doc_id, quality, toks) table
    * — shared-core form for the gate registry: the quality scan comes
    * from [[TextAnalysis.scoredDocs]]'s memoized core instead of a
    * private corpus pass. */
  private[scale] def budgetSelectFrom(scored: DataFrame,
                                      budget: Long = 20000L,
                                      partitions: Int = 32): DataFrame = {
    val spark = scored.sparkSession
    val t = scored.select(col("doc_id"), col("quality"), col("toks"))
      .filter(col("toks") > 0)
      .repartitionByRange(partitions, col("quality").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .coreCheckpoint() // pid must not be recomputed under a different plan
    val totals = t.groupBy(col("pid")).agg(sum(col("toks")).as("total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot)
    }.tail.zip(totals).map { case ((pid, cumIncl), (_, tot)) =>
      (pid, cumIncl - tot)
    }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("quality").desc, col("doc_id"))
    t.join(broadcast(offDf), "pid")
      .withColumn("cum_toks", sum(col("toks")).over(w) + col("offset"))
      .filter(col("cum_toks") <= budget)
      .select(col("doc_id"), col("quality"), col("toks"), col("cum_toks"))
  }

  /** Per-source mixture diversity — the "is this source a monoculture"
    * QA view mixture design reads next to [[mixtureSample]]'s rates:
    * per source, the language count, Gini impurity `1 − Σp²` and the
    * effective number of languages `1/Σp²` (the inverse-Simpson
    * "effective species" count — 3.0 means "as diverse as 3 equal
    * languages", robust to trace languages that inflate n_langs).
    * Shannon entropy is the textbook choice but needs `ln` — banned by
    * this codebase's cross-engine determinism rule (libm ULP drift);
    * Σp² = Σc²/n² is integer-derived and bit-identical.
    *
    * Scale design: two chained aggregations on narrowing keys
    * ((source, lang) → source), both with map-side partials; Σc² rides
    * a DECIMAL(38,0) accumulator (a long Σc² overflows once any cell
    * passes ~3×10⁹ rows — real at 100 TB; DuckDB's HUGEINT sum is the
    * same exact integer, and both cast to double once at the end). */
  def sourceDiversity(docs: DataFrame): DataFrame = {
    val cnt = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("c"))
    val nd = col("n_docs").cast("double")
    val sq = col("sum_sq").cast("double")
    cnt.groupBy(col("source"))
      .agg(sum(col("c")).as("n_docs"),
        count(lit(1)).as("n_langs"),
        sum(col("c").cast(org.apache.spark.sql.types.DecimalType(38, 0))
          * col("c")).as("sum_sq"))
      .select(col("source"), col("n_docs"), col("n_langs"),
        portableRound(lit(1.0) - sq / (nd * nd), 4).as("gini"),
        portableRound((nd * nd) / sq, 4).as("eff_langs"))
  }

  /** Cross-modality referential integrity — the J5 weights↔tests
    * audit applied to the corpus' two modalities: every document
    * should own exactly one embedding and every embedding exactly one
    * document. One row: distinct-id pairing counts, dangling ids on
    * either side, duplicate ids on either side, and the single
    * `consistent` verdict a pipeline gates ingestion on. Run after
    * every embedding job — a partial embedding run or a re-ingested
    * shard shows up here before an id join silently drops or fans out
    * rows downstream.
    *
    * Scale design: per-side id aggregates (map-side partials), ONE
    * full-outer equality join on the id, one final aggregate — no
    * row ever moves twice. */
  def modalityIntegrity(docs: DataFrame, emb: DataFrame): DataFrame = {
    val d = docs.groupBy(col("doc_id")).agg(count(lit(1)).as("dn"))
    val v = emb.select(col("vec_id").as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("vn"))
    d.join(v, Seq("doc_id"), "full_outer")
      .agg(
        coalesce(sum(col("dn")), lit(0L)).as("n_docs"),
        coalesce(sum(col("vn")), lit(0L)).as("n_vecs"),
        count(when(col("dn").isNotNull && col("vn").isNotNull, 1))
          .as("n_paired"),
        count(when(col("vn").isNull, 1)).as("n_text_only"),
        count(when(col("dn").isNull, 1)).as("n_vec_only"),
        count(when(col("dn") > 1, 1)).as("n_dup_doc_ids"),
        count(when(col("vn") > 1, 1)).as("n_dup_vec_ids"))
      .withColumn("consistent",
        col("n_text_only") === 0 && col("n_vec_only") === 0 &&
          col("n_dup_doc_ids") === 0 && col("n_dup_vec_ids") === 0)
  }

  /** q132: cluster-balanced selection — cap each embedding cell at the
    * `k` highest-quality documents: the semantic-diversity step a
    * mixture owner runs so no embedding region (one crawl's
    * boilerplate, one dominant topic) floods the training set, while
    * the kept docs inside every region are its best (DataComp/DoReMi
    * family cluster balancing, with q34's composite as the judge).
    *
    * Scale design: cell assignment is the scan-side `argmax_cosine`
    * plan constant (q38/q95 contract — zero joins to build it); the
    * doc↔vector attach is ONE doc_id equi-join of co-keyed tables
    * (bucketable at 100 TB); and the per-cell selection is the
    * capacity-bounded [[graft.functions.TopKAgg]] aggregate — with
    * nCells ≪ corpus a `row_number` window would funnel each cell's
    * corpus/nCells rows through one task (the q123 anti-pattern),
    * while the aggregate's exchange carries ≤ k rows per map task per
    * cell. Ties: quality DESC, doc_id ASC — total and engine-portable
    * (quality is the q34 ROUND'd double). */
  def cellBalancedSelect(docs: DataFrame, emb: DataFrame,
                         nCells: Int = Similarity.IvfCells,
                         k: Int = 20): DataFrame =
    cellBalancedSelectFrom(
      Layout.widen(docs).select(col("doc_id"),
        portableRound(TextAnalysis.qualityExpr(col("text")), 4).as("quality")),
      emb, nCells, k)

  /** [[cellBalancedSelect]] from a (doc_id, quality) table — the batch
    * form rides the memoized quality core instead of re-scanning. */
  private[scale] def cellBalancedSelectFrom(scored: DataFrame, emb: DataFrame,
                                            nCells: Int, k: Int): DataFrame = {
    // seeds drawn from the nonzero-norm universe ONLY (the oracle's
    // cents CTE bounds nrm > 0): a zero-norm seed would poison the
    // argmax scan with NaN at k==0 and swallow every row, while the
    // oracle's NULL cosine sorts last — silent divergence (fuzz r20).
    // Rows keep the full universe: a zero-norm DOC still lands in the
    // first real cell, identically on both engines.
    val cents = Similarity.seedCentroidList(Similarity.nonZeroNorm(emb), nCells)
    val cells = Layout.widen(emb).select(col("vec_id").as("doc_id"),
      graft.functions.VectorExpressions.argMaxCosine(
        toDoubleArray(col("embedding")), cents).as("cell_id"))
    scored.select(col("doc_id"), col("quality")).join(cells, Seq("doc_id"))
      .groupBy(col("cell_id"))
      .agg(graft.functions.TopKAgg.topK(col("quality"), col("doc_id"), k)
        .as("top"))
      .select(col("cell_id"), posexplode(col("top")))
      .select(col("cell_id"), (col("pos") + 1).as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("quality"))
  }

  /** q137: post-selection mixture reconciliation — the language
    * mixture of the q105 budget-selected set (token-weighted, the unit
    * mixtures are specified in) against the q79 target weights: the
    * "did quality selection skew the mixture" QA read a curation owner
    * checks before shipping a selected set, since quality and language
    * correlate and a pure-quality cut silently reweights languages.
    *
    * Scale design: rides the q105 selection (distributed prefix sum)
    * plus one doc_id equi-join to attach `lang`, then a languages-keyed
    * rollup and a 1-row total cross join (the documented safe shape).
    * The share divides exact integer token sums (floor-rounded 6
    * decimals — the q47 half-tie discipline); target weights are
    * plan literals, so `dev` is one subtraction of identical doubles
    * in both engines. */
  def selectionMixture(scored: DataFrame, budget: Long = 20000L,
                       target: Map[String, Double] = TargetMixture): DataFrame = {
    val sel = budgetSelectFrom(scored, budget)
    val perLang = sel
      .join(scored.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sel_toks"))
    val total = perLang.agg(sum(col("sel_toks")).as("total_toks"))
    val targetCol = target.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (l, v)) =>
        when(col("lang") === l, lit(v)).otherwise(acc)
      }
    perLang.crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"), col("sel_toks"),
        (floor(col("sel_toks").cast("double") / col("total_toks") * 1000000d
          + 0.5d) / 1000000d).as("share"),
        targetCol.as("target"))
      .withColumn("dev", col("share") - col("target"))
  }

  /** q138: temperature-scaled mixture rebalancing at τ = 0.5 — the
    * classic multilingual sqrt-sampling (mBERT/XLM family): target
    * language share ∝ √(raw token share), which lifts low-resource
    * languages without letting them dominate. Per language: the raw
    * token share, the rebalanced target share, and the sampling boost
    * (target/raw — the rate multiplier a sampler applies).
    *
    * τ = 0.5 is not just the literature default here — it is the ONE
    * temperature whose scaling (`sqrt`) is IEEE-exactly-rounded and
    * therefore bit-identical across engines; a general `pow(p, τ)`
    * rides libm and drifts by ulps (the same reason this codebase's
    * scores avoid `ln`). The √ values are floor-rounded to 6 decimals
    * before the normalizing sum, and that sum rides the exactSum
    * decimal accumulator, so normalized shares are deterministic.
    *
    * Scale design: ONE corpus aggregate keyed by language; everything
    * after runs on ≤ n_langs rows (the 1-row total is the documented
    * safe cross join). */
  def temperatureMixture(docs: DataFrame): DataFrame =
    temperatureMixtureFrom(docs.groupBy(col("lang"))
      .agg(sum(ceil(length(col("text")).cast("double") / 4d).cast("long"))
        .as("toks")))

  /** [[temperatureMixture]] from a pre-aggregated (lang, toks) table —
    * the normalization chain alone, shared with the streaming
    * reconciliation: [[graft.streaming.EventStreams.driftMonitor]]'s
    * per-window (source, n_tokens) emissions fold to exactly such a
    * table, so the monitor is a sufficient statistic for this board
    * (EventStreamsSpec pins it on a shared fixture). */
  private[graft] def temperatureMixtureFrom(perLang: DataFrame): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val tot = perLang.agg(sum(col("toks")).as("total"))
    val shared = perLang.crossJoin(broadcast(tot))
      .withColumn("share", r6(col("toks").cast("double") / col("total")))
      .withColumn("w", r6(sqrt(col("share"))))
    val wTot = shared.agg(exactSum(col("w")).as("wtot"))
    shared.crossJoin(broadcast(wTot))
      .select(col("lang"), col("toks"), col("share"),
        r6(col("w") / col("wtot")).as("target_share"))
      .withColumn("boost",
        when(col("share") > 0d, r6(col("target_share") / col("share"))))
  }

  /** q149: the portable temperature sweep — the q138 board at every
    * temperature an engine can certify bit-exactly: τ ∈ {1.0, 0.5,
    * 0.25}. A mixture owner picking a sampling temperature reads this
    * side-by-side table (per τ: rebalanced shares and boosts) to see
    * how hard each setting lifts the low-resource tail; τ = 1 is the
    * raw mixture (no rebalancing), τ = 0.5 the mBERT/XLM default,
    * τ = 0.25 the aggressive flattening end.
    *
    * Exactly these three temperatures, by design: share^τ at
    * τ = 1/2^k is a chain of k IEEE-exactly-rounded `sqrt`s (k = 0,
    * 1, 2), so both engines produce bit-identical weights — a general
    * `pow(share, τ)` rides libm and drifts by ulps (the q138
    * docstring's argument, extended from one temperature to the whole
    * certifiable family).
    *
    * Scale design: ONE corpus aggregate keyed by language; the τ
    * fan-out is a 3-way generator over the ≤ n_langs row table, the
    * per-τ normalizers are a grouped exactSum on ≤ 3·n_langs rows
    * joined back broadcast. Nothing after the first aggregate touches
    * corpus-sized data. */
  def temperatureSweep(docs: DataFrame): DataFrame =
    temperatureSweepFrom(docs.groupBy(col("lang"))
      .agg(sum(ceil(length(col("text")).cast("double") / 4d).cast("long"))
        .as("toks")))

  /** [[temperatureSweep]] from a pre-aggregated (lang, toks) table —
    * the same sufficient statistic as [[temperatureMixtureFrom]], so
    * the streaming reconciliation covers this board too. */
  private[graft] def temperatureSweepFrom(perLang: DataFrame): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val tot = perLang.agg(sum(col("toks")).as("total"))
    val shared = perLang.crossJoin(broadcast(tot))
      .withColumn("share", r6(col("toks").cast("double") / col("total")))
      .select(col("lang"), col("toks"), col("share"),
        explode(array(lit(1.0d), lit(0.5d), lit(0.25d))).as("tau"))
      .withColumn("w",
        when(col("tau") === 1.0d, col("share"))
          .when(col("tau") === 0.5d, r6(sqrt(col("share"))))
          .otherwise(r6(sqrt(sqrt(col("share"))))))
    val wTot = shared.groupBy(col("tau")).agg(exactSum(col("w")).as("wtot"))
    shared.join(broadcast(wTot), Seq("tau"))
      .select(col("tau"), col("lang"), col("toks"), col("share"),
        r6(col("w") / col("wtot")).as("target_share"))
      .withColumn("boost",
        when(col("share") > 0d, r6(col("target_share") / col("share"))))
  }

  /** q161: curriculum phases — the quality-ordered training schedule
    * read: split the corpus into quality quartiles (the standard
    * curriculum unit — train on progressively higher-quality data, or
    * anneal onto the top quartile last) and report each phase's doc
    * count, token mass and quality range. The board a curriculum
    * designer reads to see whether the phases are balanced in TOKENS
    * (they never are — quality correlates with length) before wiring
    * the schedule.
    *
    * Quartile boundaries are `percentile_disc`-equivalent picks from
    * the cumulative-distribution chain ([[CoreQueries.pickPercentile]]
    * — the q48 machinery, integer thresholds, bitwise portable). The
    * distinct-value window is bounded by construction: quality is
    * rounded to 4 decimals, so at ANY corpus size the sort holds at
    * most 10⁴ distinct values. Assignment is a scan-side CASE against
    * the broadcast 1-row break table; the rollup is a 4-group
    * aggregate. */
  def curriculumPhases(docs0: DataFrame): DataFrame =
    curriculumPhasesFrom(Layout.widen(docs0).select(col("doc_id"),
      portableRound(TextAnalysis.qualityExpr(col("text")), 4).as("quality"),
      ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks")))

  /** [[curriculumPhases]] from a (doc_id, quality, toks) table — the
    * gate form rides the memoized quality core. */
  private[scale] def curriculumPhasesFrom(scored: DataFrame): DataFrame = {
    import graft.ops.CoreQueries.pickPercentile
    val base = scored.filter(col("toks") > 0)
    val counts = base.select(col("quality").as("q"))
      .groupBy(col("q")).agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum(col("c")).as("n"))
    val byVal = Window.orderBy(col("q"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val breaks = counts.crossJoin(broadcast(tot))
      .withColumn("cum", sum(col("c")).over(byVal))
      .agg(pickPercentile("q", 25), pickPercentile("q", 50),
        pickPercentile("q", 75))
    base.crossJoin(broadcast(breaks))
      .select(
        when(col("quality") <= col("p25"), "1_q1")
          .when(col("quality") <= col("p50"), "2_q2")
          .when(col("quality") <= col("p75"), "3_q3")
          .otherwise("4_q4").as("phase"),
        col("toks"), col("quality"))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("phase_toks"),
        min(col("quality")).as("min_quality"),
        max(col("quality")).as("max_quality"))
  }

  /** q159: output shard plan — the write-path layout audit: assign
    * every document WHOLE to the output shard where its token-stream
    * position starts (greedy, never splitting a document across
    * files — the invariant a corpus writer wants, unlike q73's
    * training-chunk packing which splits by design), and report each
    * shard's doc count, actual token size, deviation from the target,
    * fill ratio, and id range. Balanced shards are what make the NEXT
    * job's `maxPartitionBytes` math work; this board is how the
    * writer proves balance before shipping, and the id ranges double
    * as the shard manifest.
    *
    * Scale design: rides the [[sequencePack]] distributed prefix-sum
    * chain (range partition + broadcast offsets — never a global
    * window) with the shard size as the chunk granularity: a doc's
    * shard IS its `chunk_first`, so the plan is the q73 plan plus one
    * hash-aggregate keyed by shard. A doc longer than the shard
    * target leaves gap shard-ids behind it — visible in the board as
    * the missing ids, priced in its own shard's `dev_toks`. */
  def shardPlan(docs: DataFrame, shardTokens: Int = 4096,
                partitions: Int = 32): DataFrame =
    shardPlanFrom(sequencePack(docs, shardTokens, partitions), shardTokens)

  /** [[shardPlan]] from a packed table — shared-chain form. */
  private[scale] def shardPlanFrom(packed: DataFrame,
                                   shardTokens: Int): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    packed
      .groupBy(col("chunk_first").as("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("shard_toks"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .select(col("shard_id"), col("n_docs"), col("shard_toks"),
        (col("shard_toks") - shardTokens.toLong).as("dev_toks"),
        r6(col("shard_toks").cast("double") / shardTokens).as("fill"),
        col("first_doc"), col("last_doc"))
  }

  /** Materialize the q159 shard plan as a physical parquet layout —
    * one directory (one file) per planned shard, documents whole,
    * shard membership exactly the plan's greedy `chunk_first`
    * assignment. Zero-token documents (empty text) are EXCLUDED, the
    * same exclusion [[sequencePack]] states: they carry no token mass,
    * so the packing plan never assigns them a shard and the written
    * corpus (and [[shardAudit]]'s plan-vs-disk reconciliation, which
    * reads the same plan) is defined over the toks > 0 sub-corpus. The write is `repartition(shard_id)` +
    * `partitionBy(shard_id)`: every shard's rows land in one task, so
    * each shard directory holds exactly one file — the property
    * [[shardAudit]] certifies. (At 100 TB shardTokens is set so one
    * shard ≈ one healthy parquet file, e.g. 10⁸ tokens — the same
    * number the q159 board's fill column is tuned against; 4096 here
    * matches the test-scale packing chain.) */
  def writeSharded(docs: DataFrame, path: String, shardTokens: Int = 4096,
                   partitions: Int = 32): Unit = {
    val assign = sequencePack(docs, shardTokens, partitions)
      .select(col("doc_id"), col("chunk_first").as("shard_id"))
    docs.join(assign, Seq("doc_id"))
      .repartition(col("shard_id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard_id").parquet(path)
  }

  /** The write-then-audit reconciliation that closes the q159→disk
    * loop: re-derive every shard's doc count, token mass and id range
    * FROM THE FILES ([[writeSharded]]'s output) and line them up
    * against the published plan (the q159 board, whose id ranges are
    * the manifest). Full-outer so a shard missing on disk or a stray
    * extra directory both surface as `ok = false` rows rather than
    * vanishing from an inner join; `n_files = 1` is asserted per
    * shard (the one-file-per-shard contract is what makes the NEXT
    * job's split math predictable).
    *
    * Scale design: one scan of the written layout (shard_id is a
    * partition column — no row data re-shuffled except the per-shard
    * aggregate), one broadcast-sized join against the plan (shard
    * count = corpus tokens / shardTokens). Token mass is recomputed
    * with the SAME ceil(len/4) estimator the packing chain used, so
    * plan-vs-disk equality is exact, not approximate. */
  def shardAudit(spark: SparkSession, path: String,
                 plan: DataFrame): DataFrame = {
    val disk = spark.read.parquet(path)
      .select(col("shard_id").cast("long").as("shard_id"), col("doc_id"),
        ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks"),
        input_file_name().as("f"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("disk_docs"), sum(col("toks")).as("disk_toks"),
        count_distinct(col("f")).as("n_files"),
        min(col("doc_id")).as("disk_first"),
        max(col("doc_id")).as("disk_last"))
    plan
      .select(col("shard_id"), col("n_docs"), col("shard_toks"),
        col("first_doc"), col("last_doc"))
      .join(disk, Seq("shard_id"), "full_outer")
      .select(col("shard_id"), col("n_docs"), col("disk_docs"),
        col("shard_toks"), col("disk_toks"), col("n_files"),
        (col("n_docs") <=> col("disk_docs") &&
          col("shard_toks") <=> col("disk_toks") &&
          col("first_doc") <=> col("disk_first") &&
          col("last_doc") <=> col("disk_last") &&
          col("n_files") <=> lit(1L)).as("ok"))
  }

  /** q168: shard mixing audit — per output shard of the q159 plan, how
    * well-mixed the sources are: a shard filled by one source feeds
    * the trainer a correlated run of near-identical distribution (the
    * within-shard analogue of q154's split balance; q109 reads source
    * diversity corpus-wide, this reads it at the granularity the
    * loader actually streams). Per shard: doc count, distinct
    * sources, the dominant source and its share, and the Simpson
    * concentration Σshare² (1 = single-source shard, 1/n_sources =
    * perfectly mixed).
    *
    * Determinism: Simpson's numerator is the exact integer Σcnt²; the
    * dominant source is the field-lexicographic `max(struct(cnt,
    * source))` (count DESC, ties to the lexicographically LAST source
    * — total order, no window). Both output ratios are single IEEE
    * divisions of exact integers, r6.
    *
    * Scale design: rides the q73/q159 prefix-sum packing chain; adds
    * one doc_id equi-join (unique keys) and two stacked aggregates —
    * (shard, source) with map-side partials, then ≤ n_sources rows
    * per shard down to one. */
  def shardMixing(docs: DataFrame, shardTokens: Int = 4096,
                  partitions: Int = 32): DataFrame =
    shardMixingFrom(sequencePack(docs, shardTokens, partitions), docs)

  /** [[shardMixing]] from a packed table — shared-chain form. */
  private[scale] def shardMixingFrom(packed0: DataFrame,
                                     docs: DataFrame): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val packed = packed0
      .select(col("doc_id"), col("chunk_first").as("shard_id"))
    val bySrc = packed
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("shard_id"), col("source")).agg(count(lit(1)).as("cnt"))
    bySrc.groupBy(col("shard_id"))
      .agg(sum(col("cnt")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        max(struct(col("cnt"), col("source"))).as("m"),
        sum(col("cnt") * col("cnt")).as("sq"))
      .select(col("shard_id"), col("n_docs"), col("n_sources"),
        col("m.source").as("top_source"),
        r6(col("m.cnt").cast("double") / col("n_docs")).as("top_share"),
        r6(col("sq").cast("double") /
          (col("n_docs") * col("n_docs")).cast("double")).as("simpson"))
  }

  /** q153: snapshot quality drift — "is the corpus getting better?":
    * the q141 diff statuses (added / removed / changed / unchanged)
    * with the quality and token mass attached, so a refresh review
    * reads not just HOW MANY docs churned but whether the churn
    * raised or lowered corpus quality (added mean-quality below
    * removed mean-quality is the classic regressing-crawl signal).
    * Changed/unchanged/added docs are scored on their CURRENT text,
    * removed docs on the only text they have (the previous snapshot's).
    *
    * Scale design: per-side (id, md5) collapse + ONE full-outer
    * equi-join (the q141 shape), then the scan-side quality projection
    * and a 4-group aggregate. Portability: mean quality rides the
    * exactSum decimal accumulator (a cross-partition double sum is
    * order-dependent; the decimal sum is not), and both means divide
    * exact totals once, r6-rounded. */
  def snapshotQualityDrift(prev: DataFrame, cur: DataFrame): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val p = prev.select(col("doc_id"), col("text").as("prev_text"),
      md5(col("text")).as("prev_md5"))
    val c = cur.select(col("doc_id"), col("text").as("cur_text"),
      md5(col("text")).as("cur_md5"))
    val classified = p.join(c, Seq("doc_id"), "full_outer")
      .select(
        when(col("prev_md5").isNull, "added")
          .when(col("cur_md5").isNull, "removed")
          .when(col("prev_md5") === col("cur_md5"), "unchanged")
          .otherwise("changed").as("status"),
        coalesce(col("cur_text"), col("prev_text")).as("text"))
    classified
      .select(col("status"),
        ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks"),
        portableRound(TextAnalysis.qualityExpr(col("text")), 4).as("q"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("sum_toks"),
        exactSum(col("q")).as("qsum"))
      .select(col("status"), col("n_docs"), col("sum_toks"),
        r6(col("qsum") / col("n_docs")).as("mean_quality"),
        r6(col("sum_toks").cast("double") / col("n_docs")).as("mean_toks"))
  }

  /** q154: split balance — is each q140 split REPRESENTATIVE? Per
    * (split, lang): doc/token counts, the language's token share
    * WITHIN the split, the language's global share, and the deviation.
    * The q146/q147 siblings audit leakage ACROSS the boundary; this
    * audits distribution parity INSIDE each side — a val set whose
    * language mixture drifts from train's invalidates every
    * per-language eval read off it. Hash-splitting is expected to pass
    * this board (uniform in expectation); a failure means skewed ids
    * or a too-small split.
    *
    * Scale design: the split label is the q140 scan-side expression
    * (pure function of the id), so the board is ONE corpus aggregate
    * keyed by (split, lang); the split/lang/global rollups re-aggregate
    * the bounded cell table (localCheckpointed — #splits × #langs
    * rows), and join back broadcast. */
  def splitBalance(docs: DataFrame): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val cell = docs.select(splitExpr(col("doc_id")).as("split"), col("lang"),
        ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("toks"))
      .coreCheckpoint() // bounded: feeds three rollups + the join
    val bySplit = cell.groupBy(col("split"))
      .agg(sum(col("toks")).as("split_toks"))
    val byLang = cell.groupBy(col("lang"))
      .agg(sum(col("toks")).as("lang_toks"))
    val total = cell.agg(sum(col("toks")).as("total_toks"))
    cell.join(broadcast(bySplit), Seq("split"))
      .join(broadcast(byLang), Seq("lang"))
      .crossJoin(broadcast(total))
      .select(col("split"), col("lang"), col("n_docs"), col("toks"),
        when(col("split_toks") > 0L,
          r6(col("toks").cast("double") / col("split_toks"))).as("share"),
        when(col("total_toks") > 0L,
          r6(col("lang_toks").cast("double") / col("total_toks")))
          .as("global_share"))
      .withColumn("dev", col("share") - col("global_share"))
  }

  /** Global ROW_NUMBER under a total order, distributed: range-partition
    * by the order columns, per-partition counts → driver prefix-sum
    * (numPartitions rows), broadcast offsets, window WITHIN partitions
    * only — the same shape as [[budgetSelectFrom]]'s prefix sum, with
    * count in place of token sum. Adds `rnk` (1-based). */
  private def withGlobalRank(t0: DataFrame, order: Seq[Column],
                             partitions: Int): DataFrame = {
    val spark = t0.sparkSession
    val t = t0.repartitionByRange(partitions, order: _*)
      .withColumn("pid", spark_partition_id())
      .coreCheckpoint() // pid must not be recomputed under another plan
    val counts = t.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) =>
      (pid, acc + c)
    }.tail.zip(counts).map { case ((pid, cumIncl), (_, c)) =>
      (pid, cumIncl - c)
    }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val w = Window.partitionBy(col("pid")).orderBy(order: _*)
    t.join(broadcast(offDf), "pid")
      .withColumn("rnk", row_number().over(w).cast("long") + col("offset"))
      .drop("pid", "offset")
  }

  /** q152: batching padding waste — does length-bucketed batching pay?
    * Padded-batch training (the non-packed regime: one sequence per
    * slot, batch padded to its longest member) wastes `Σ n_b·max_b −
    * Σ toks` tokens; forming batches from a length-sorted order
    * instead of arrival order collapses within-batch spread and
    * recovers most of it. This board quantifies both strategies on the
    * actual corpus — the measured read behind "sort by length before
    * batching", next to q73/q145's packed-regime numbers.
    *
    * Scale design: two distributed global-rank chains (range
    * partition + broadcast prefix offsets — never a single-partition
    * window), one hash-aggregate per strategy keyed by batch_id, and a
    * 1-row rollup each. Every quantity is an exact integer except the
    * final pad_frac division. */
  def batchPadding(docs0: DataFrame, batchSize: Int = 16,
                   partitions: Int = 32): DataFrame = {
    val docs = Layout.widen(docs0)
    val base = docs.select(col("doc_id"),
      ceil(length(col("text")).cast("double") / 4d).cast("long").as("toks"))
      .filter(col("toks") > 0)
      .coreCheckpoint() // feeds both rank chains; scan once
    def strategy(name: String, order: Seq[Column]): DataFrame =
      withGlobalRank(base, order, partitions)
        .withColumn("batch_id", expr(s"(rnk - 1) div $batchSize"))
        .groupBy(col("batch_id"))
        .agg(count(lit(1)).as("n"), sum(col("toks")).as("real"),
          max(col("toks")).as("mx"))
        .agg(count(lit(1)).as("n_batches"), sum(col("n")).as("n_docs"),
          sum(col("real")).as("real_toks"),
          sum(col("n") * col("mx")).as("padded_toks"))
        .select(lit(name).as("strategy"), col("n_docs"), col("n_batches"),
          col("real_toks"), col("padded_toks"),
          (col("padded_toks") - col("real_toks")).as("pad_toks"),
          when(col("padded_toks") > 0L,
            portableRound((col("padded_toks") - col("real_toks")).cast("double")
              / col("padded_toks"), 4)).as("pad_frac"))
    strategy("1_natural", Seq(col("doc_id")))
      .unionByName(strategy("2_length_sorted", Seq(col("toks"), col("doc_id"))))
  }

  /** q148: epoch allocation under a token budget — the data-constrained
    * planning read (Muennighoff et al. 2023, arXiv:2305.16264): given a
    * training-token budget and the q79 target mixture, each language
    * needs `target × budget` tokens; dividing by what the corpus
    * actually holds gives the implied epoch count, capped at
    * `maxEpochs` (past ~4 repeats, repeated data stops behaving like
    * fresh tokens), with the unfillable remainder surfaced as the
    * shortfall the mixture owner must re-weight away.
    *
    * Scale design: ONE corpus aggregate keyed by language (map-side
    * partials collapse to ≤ n_langs rows per task); everything after is
    * per-row IEEE arithmetic on the bounded table. Portability: `need`
    * is one double multiply of plan literals; epochs/shortfall
    * divide/subtract exact BIGINTs from it with identical expression
    * trees in both engines (the q47 discipline); languages with zero
    * available tokens yield NULL epochs rather than an engine-specific
    * division-by-zero artifact. */
  def epochAllocation(docs: DataFrame, budget: Long = 50000L,
                      target: Map[String, Double] = TargetMixture,
                      maxEpochs: Int = 4): DataFrame = {
    def r6(c: Column): Column = floor(c * 1000000d + 0.5d) / 1000000d
    val perLang = docs.groupBy(col("lang"))
      .agg(sum(ceil(length(col("text")).cast("double") / 4d).cast("long"))
        .as("avail_toks"))
    val targetCol = target.toSeq.sortBy(_._1)
      .foldLeft(lit(0.0)) { case (acc, (l, v)) =>
        when(col("lang") === l, lit(v)).otherwise(acc)
      }
    val avail = col("avail_toks").cast("double")
    perLang
      .select(col("lang"), col("avail_toks"), targetCol.as("target"))
      .withColumn("need_toks", col("target") * lit(budget.toDouble))
      .withColumn("epochs_frac",
        when(col("avail_toks") > 0L, r6(col("need_toks") / avail)))
      .withColumn("planned_epochs",
        when(col("avail_toks") > 0L,
          least(ceil(col("need_toks") / avail), lit(maxEpochs.toLong))))
      .withColumn("shortfall_toks",
        r6(greatest(col("need_toks") -
          (col("avail_toks") * lit(maxEpochs.toLong)).cast("double"), lit(0d))))
      .withColumn("oversampled",
        when(col("avail_toks") > 0L, col("need_toks") > avail))
  }

  /** q140: deterministic train/val/test split — the assignment every
    * training-data pipeline makes last and must make REPRODUCIBLY:
    * re-running the pipeline, adding a shard, or re-ordering input
    * files must never move a document across the split boundary (a
    * val→train leak invalidates the eval). Assignment is a pure
    * function of the document id: `portableHash60(doc_id) / 2^60` in
    * [0,1) against cumulative fraction thresholds in declaration
    * order — the [[stratifiedSample]] hash discipline pointed at
    * partitioning instead of sampling.
    *
    * Scale design: scan-side projection — zero shuffles, zero joins;
    * the split is decided per-row from the hash and plan-literal
    * thresholds. Adding a split or re-weighting only moves documents
    * whose hash falls in the moved interval (the minimal-churn
    * property consistent-hashing gives). */
  def hashSplit(df: DataFrame, idCol: String = "doc_id",
                splits: Seq[(String, Double)] = DefaultSplits): DataFrame =
    df.select(col(idCol), splitExpr(col(idCol), splits).as("split"))

  /** The q140 fractions shared by the split family (q140 assignment,
    * q146 leakage audit, q147 cluster-coherent split). */
  private[scale] val DefaultSplits: Seq[(String, Double)] =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** The q140 assignment as a pure column expression over ANY id —
    * computable scan-side wherever the id appears (a pair list's two
    * endpoints, a cluster representative) precisely because it is a
    * function of the id alone. */
  private[scale] def splitExpr(id: Column,
      splits: Seq[(String, Double)] = DefaultSplits): Column = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"splitExpr: fractions must sum to 1: $splits")
    val u = portableHash60(id.cast("string")).cast("double") /
      lit((1L << 60).toDouble)
    // cumulative upper bounds in declaration order; the last split
    // takes the remainder so fraction rounding can never drop a row
    val cum = splits.scanLeft(0.0) { case (acc, (_, f)) => acc + f }.tail
    splits.init.zip(cum.init).foldRight(
      lit(splits.last._1): Column) { case (((name, _), ub), rest) =>
      when(u < lit(ub), lit(name)).otherwise(rest)
    }
  }

  /** q141: corpus snapshot diff — the ingest regression audit run
    * after every pipeline re-run: per document id, whether it was
    * `added` (new id), `removed` (id gone), `changed` (same id,
    * different text fingerprint) or `unchanged`, plus the per-status
    * rollup a release gate reads. Content equality is md5 of the text
    * — the [[graft.scale.Dedup]] fingerprint discipline — so the diff
    * never ships full text across the wire twice.
    *
    * Scale design: each side collapses to (id, md5) at the scan, then
    * ONE full-outer equi-join on the id (both sides hash-partitioned
    * by the same key) and a 4-row rollup. No skew exposure: doc ids
    * are unique per side by contract, so every join key matches ≤ 1×1
    * rows. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame): DataFrame = {
    def side(df: DataFrame, h: String) =
      df.select(col("doc_id"), md5(col("text")).as(h))
    side(prev, "prev_md5").join(side(cur, "cur_md5"), Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("prev_md5").isNull, lit("added"))
          .when(col("cur_md5").isNull, lit("removed"))
          .when(col("prev_md5") === col("cur_md5"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** [[snapshotDiff]] rolled up per status — the 4-row release-gate
    * read (statuses with zero documents are absent: the diff is
    * sparse by nature and the reader checks `changed`/`removed`
    * presence, not zero-fill). */
  def snapshotDiffSummary(prev: DataFrame, cur: DataFrame): DataFrame =
    snapshotDiff(prev, cur)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))

  // ---- driver-gate queries ----

  private val SampleFractions = Map(
    "en" -> 0.1, "de" -> 0.5, "fr" -> 0.3, "es" -> 0.2, "zh" -> 0.05)

  /** The mixture q79 targets: a flatter language distribution than the
    * corpus ships with. */
  private[graft] val TargetMixture = Map(
    "en" -> 0.3, "de" -> 0.2, "fr" -> 0.2, "es" -> 0.2, "zh" -> 0.1)

  /** Importance weights for target-distribution data selection (DSIR,
    * Xie et al. 2023, arXiv:2302.03169): score every document by how
    * much its hashed-bigram feature distribution looks like a TARGET
    * slice of the corpus (here: `targetLang` documents, standing in
    * for the paper's Wikipedia-quality target) versus the raw corpus.
    * Per bucket `b`: the Laplace-smoothed frequency ratio
    * `((tgt_b+1)·(rawTot+nB)) / ((raw_b+1)·(tgtTot+nB))`; per doc: the
    * left-to-right fold of its features' ratios, plus the mean ratio
    * and a `keep` verdict (mean > 1 — more target-like than raw-like).
    * The paper sums LOG ratios; the ratio mean is the libm-free
    * surrogate this codebase's determinism rule requires (`ln` ULP
    * drift across engines — see [[TextAnalysis.commonness]]), with the
    * same neutral point (ratio 1 ↔ llr 0) — documented deviation, not
    * an accident.
    *
    * Scale design — hashed features exist precisely to BOUND the
    * estimator, and the plan leans on it twice:
    *  - the bucket table is `nBuckets` rows at any corpus size: ONE
    *    corpus aggregation keyed by bucket (map-side partials collapse
    *    to ≤ nBuckets rows per task) collects raw and target counts
    *    together, then the ratio table rides as a PLAN CONSTANT;
    *  - scoring is a pure scan-side fold (`aggregate` over the doc's
    *    bigram array, `element_at` into the literal ratio table) —
    *    zero joins, zero shuffles, the argmax_cosine discipline.
    *
    * Determinism: counts are integers; each ratio is one fixed
    * parenthesization of integer-derived doubles (driver Scala and
    * DuckDB run the identical IEEE ops); the per-doc sum folds in
    * array order on both engines (the q47 fold contract). Zero-feature
    * docs score sum 0, mean 0, keep false — no evidence, not kept. */
  def dsirWeights(docs0: DataFrame, targetLang: String = "en",
                  nBuckets: Int = 1024): DataFrame = {
    val docs = Layout.widen(docs0)
    val bucketOf: Column => Column = g =>
      (portableHash60(g) % nBuckets).cast("int")
    // one tokenize pass feeds the bucket counts AND the scoring scan
    val bgs = docs.select(col("doc_id"), col("lang"),
        coalesce(shinglesFromWords(words(col("text")), 2),
          typedLit(Seq.empty[String])).as("bgs"))
      .coreCheckpoint()
    val cnts = bgs.select(col("lang"), explode(col("bgs")).as("g"))
      .select(col("lang"), bucketOf(col("g")).as("b"))
      .groupBy(col("b")).agg(
        count(lit(1)).as("rc"),
        count(when(col("lang") === targetLang, 1)).as("tc"))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rawTot = cnts.values.map(_._1).sum
    val tgtTot = cnts.values.map(_._2).sum
    val ratios: Seq[Double] = (0 until nBuckets).map { b =>
      val (rc, tc) = cnts.getOrElse(b, (0L, 0L))
      ((tc + 1).toDouble * (rawTot + nBuckets)) /
        ((rc + 1).toDouble * (tgtTot + nBuckets))
    }
    val rtab = typedLit(ratios)
    val scored = bgs.select(col("doc_id"), col("lang"),
      size(col("bgs")).as("n_features"),
      aggregate(col("bgs"), lit(0.0),
        (acc, g) => acc + element_at(rtab, bucketOf(g) + 1)).as("sum_ratio"))
    scored.select(col("doc_id"), col("lang"), col("n_features"),
      col("sum_ratio"),
      (col("sum_ratio") / greatest(col("n_features"), lit(1))).as("avg_ratio"),
      (col("sum_ratio") / greatest(col("n_features"), lit(1)) > 1.0).as("keep"))
  }

  /** Memoized q73-chain packings, one per chunk size — sequencePack
    * eagerly checkpoints its partition table and collects offsets, so
    * a batch must not pay that per consumer. */
  private def gatePacked(s: SparkSession, d: String,
                         maxTokens: Int): DataFrame =
    graft.Shared.memo(s, s"cur:packed:$maxTokens:$d")(
      sequencePack(T.documents(s, d), maxTokens, 32))

  /** The celled media chain's keyed projection (vec_id, cell_id,
    * cell2, dbucket, bucket, v, nrm) — one feature-kernel pass +
    * scan-side key projections, memoized so q176's pair join, q177's
    * occupancy rollups and q178's multi-probe join read ONE table
    * (the feature encode is the dominant cost; a batch must not pay
    * it per consumer). */
  private def gateMediaKeyed(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"mm:keyed:$d") {
      val docs = T.documents(s, d)
      Dedup.celledKeyedVectors(Multimodal.mediaEmbeddings(s, docs),
        Multimodal.mediaSeeds(s, docs))
    }

  /** The published celled pair board off the keyed core — q176 IS this
    * table, and q184's incremental arm derives its cross and
    * frozen-frozen subsets from the same rows (the frozen-artifact
    * contract: the incremental board reconciles against the published
    * chain by construction). */
  private def gateMediaPairs(s: SparkSession, d: String): DataFrame =
    graft.Shared.memo(s, s"mm:cpairs:$d")(
      Dedup.embeddingNearDupCelledFrom(gateMediaKeyed(s, d),
        Multimodal.MediaNearDupMinCos, inputMaterialized = true))

  /** Batch-start core warmups (the [[graft.scale.Dedup.coreWarmups]]
    * contract) — both packing geometries the gate boards read. */
  private[graft] def coreWarmups(s: SparkSession,
                                 d: String): Seq[(String, () => Unit)] = Seq(
    "cur:packed2048" -> (() => { gatePacked(s, d, 2048); () }),
    "cur:packed4096" -> (() => { gatePacked(s, d, 4096); () }),
    "mm:keyed" -> (() => { gateMediaKeyed(s, d); () }),
    // the published pair board too: q176 IS this table and q184's
    // incremental board filters it — without the warmup both block on
    // its build mid-batch instead of overlapping it from t=0
    "mm:cpairs" -> (() => { gateMediaPairs(s, d); () }))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_stratified_sample" -> ((s, d) =>
      stratifiedSample(T.documents(s, d), "doc_id", SampleFractions, "lang")
        .select(col("doc_id"), col("lang"))),
    "q58_group_cap" -> ((s, d) =>
      perGroupCap(T.documents(s, d), "lang", "doc_id", k = 15)
        .select(col("doc_id"), col("lang"))),
    // the packing chains are memoized per (maxTokens): q73/q145 read
    // the 2048 table, q159/q168 the 4096 one — each built once a batch
    "q73_seq_pack" -> ((s, d) => gatePacked(s, d, 2048)),
    "q79_mixture_sample" -> ((s, d) =>
      mixtureSample(T.documents(s, d), TargetMixture, "lang", "doc_id")
        .select(col("doc_id"), col("lang"), portableRound(col("rate"), 6).as("rate"))),
    // DSIR-style importance weights toward the target-language slice
    "q98_dsir_weights" -> ((s, d) => dsirWeights(T.documents(s, d))),
    // best-B-tokens selection: quality-ordered distributed prefix sum
    "q105_budget_select" -> ((s, d) =>
      budgetSelectFrom(TextAnalysis.gateScored(s, d))),
    // per-source language-mix diversity (Gini / effective languages)
    "q109_source_diversity" -> ((s, d) => sourceDiversity(T.documents(s, d))),
    // text↔embedding referential integrity (the J5 audit, cross-modal)
    "q110_modality_integrity" -> ((s, d) =>
      modalityIntegrity(T.documents(s, d), T.embeddings(s, d))),
    // the certified media-feature kernel over the synthetic asset
    // table: byte histogram → exact L2 → float32, exploded to scalars
    "q170_media_features" -> ((s, d) => Multimodal.mediaFeaturesBoard(s,
      Multimodal.syntheticAssets(T.documents(s, d)))),
    // cross-modal dedup end-to-end: media embeddings (q170's certified
    // encoder at the ANN dim) through the q69 LSH near-dup chain
    "q173_media_neardup" -> ((s, d) =>
      Multimodal.mediaNearDup(s, T.documents(s, d))),
    // the FULL-corpus cross-modal near-dup: data-dependent cell +
    // diff-plane blocking (q176) and its volume pricing board (q177)
    // share ONE memoized keyed projection
    "q176_media_neardup_celled" -> ((s, d) => gateMediaPairs(s, d)),
    "q177_media_blocking" -> ((s, d) =>
      Multimodal.mediaBlockingBoard(gateMediaKeyed(s, d))),
    // the incremental arm: new arrivals vs the frozen celled index,
    // frozen-cluster labels from frozen-frozen pairs only — rides the
    // SAME published pair core as q176 (the q174 discipline)
    "q184_media_neardup_incr" -> ((s, d) =>
      Dedup.incrementalNearDupCelled(gateMediaKeyed(s, d),
        gateMediaPairs(s, d))),
    // the multi-probe recall dial: top-2 cells, same bands — q176's
    // candidates are a strict subset; rides the same memoized core
    "q178_media_neardup_probe2" -> ((s, d) =>
      Dedup.embeddingNearDupCelled2From(gateMediaKeyed(s, d),
        Multimodal.MediaNearDupMinCos, inputMaterialized = true)),
    // real-codec pixel round-trip: bytes -> true PNG -> javax.imageio
    // decode -> exact pixel stats, hash-certified against byte math
    "q179_pixel_decode" -> ((s, d) =>
      Multimodal.pixelDecodeBoard(s, T.documents(s, d))),
    // real-PCM audio round-trip: bytes -> true 16-bit mono WAV ->
    // sample decode -> exact sample stats, same certification shape
    "q180_audio_decode" -> ((s, d) =>
      Multimodal.audioDecodeBoard(s, T.documents(s, d))),
    // semantic-diversity cap: best-quality k docs per embedding cell —
    // rides the memoized quality core in a batch run
    "q132_cell_balanced" -> ((s, d) =>
      cellBalancedSelectFrom(TextAnalysis.gateScored(s, d),
        T.embeddings(s, d), Similarity.IvfCells, k = 20)),
    // token-weighted language mixture of the selected set vs targets
    "q137_selection_mixture" -> ((s, d) =>
      selectionMixture(TextAnalysis.gateScored(s, d))),
    // sqrt-sampling (τ=0.5) rebalanced language mixture + boosts
    "q138_temperature_mixture" -> ((s, d) =>
      temperatureMixture(T.documents(s, d))),
    // deterministic hash split: scan-side, reproducible, minimal-churn
    "q140_hash_split" -> ((s, d) => hashSplit(T.documents(s, d))),
    // overlapping context-window chunking: scan-side generate
    "q144_chunk_spans" -> ((s, d) => chunkSpans(T.documents(s, d))),
    // the 1-row packing dashboard over the q73 chain
    "q145_pack_efficiency" -> ((s, d) =>
      packEfficiencyFrom(gatePacked(s, d, 2048), 2048)),
    // data-constrained epoch planning: target mixture × budget vs
    // available tokens per language
    "q148_epoch_allocation" -> ((s, d) =>
      epochAllocation(T.documents(s, d))),
    // the q138 board at every IEEE-certifiable temperature (1, ½, ¼)
    "q149_temperature_sweep" -> ((s, d) =>
      temperatureSweep(T.documents(s, d))),
    // padded-batch waste: natural vs length-sorted batch formation
    "q152_batch_padding" -> ((s, d) => batchPadding(T.documents(s, d))),
    // q141's diff statuses with quality/token mass attached
    "q153_quality_drift" -> ((s, d) => {
      val docs = T.documents(s, d)
      snapshotQualityDrift(gatePrevSnapshot(docs), docs)
    }),
    // per-(split, lang) token shares vs the global mixture
    "q154_split_balance" -> ((s, d) => splitBalance(T.documents(s, d))),
    // whole-doc greedy output sharding + balance manifest
    "q159_shard_plan" -> ((s, d) =>
      shardPlanFrom(gatePacked(s, d, 4096), 4096)),
    // per-shard source concentration over the same packing chain
    "q168_shard_mixing" -> ((s, d) =>
      shardMixingFrom(gatePacked(s, d, 4096), T.documents(s, d))),
    // quality-quartile curriculum schedule (rides the quality core)
    "q161_curriculum" -> ((s, d) =>
      curriculumPhasesFrom(TextAnalysis.gateScored(s, d))),
    // snapshot diff vs a deterministically-derived previous snapshot
    // (hash slices simulate adds/removes/edits)
    "q141_snapshot_diff" -> ((s, d) => {
      val docs = T.documents(s, d)
      snapshotDiffSummary(gatePrevSnapshot(docs), docs)
    })
  )

  /** The synthetic "previous snapshot" the q141 gate diffs against —
    * hash-sliced from the current corpus so the diff exercises all
    * four statuses deterministically: ids with u ≥ 0.9 are absent
    * from prev (→ `added`), ids with u < 0.1 carry edited text
    * (→ `changed`), a shifted copy of the u < 0.05 slice exists only
    * in prev (→ `removed`), everything else is `unchanged`. */
  private[scale] val SnapshotAddedSlice = 0.9
  private[scale] val SnapshotChangedSlice = 0.1
  private[scale] val SnapshotRemovedSlice = 0.05

  private def gatePrevSnapshot(docs: DataFrame): DataFrame = {
    val u = portableHash60(col("doc_id").cast("string")).cast("double") /
      lit((1L << 60).toDouble)
    docs.filter(u < SnapshotAddedSlice)
      .select(col("doc_id"),
        when(u < SnapshotChangedSlice, concat(col("text"), lit(" [stale]")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(u < SnapshotRemovedSlice)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text")))
  }

  /** The synthetic prev-snapshot CTEs (`u`, `prev`) shared by the q141
    * and q153 oracles — ONE definition, slices interpolated from the
    * same constants as [[gatePrevSnapshot]], so the two drift boards
    * and the Spark fixture can never disagree about the snapshot. */
  private lazy val prevSnapshotCteSql: String =
    s"""u AS (SELECT doc_id, text,
       |  CAST($hashSql AS DOUBLE) / 1152921504606846976.0 AS u
       |FROM documents),
       |prev AS (
       |  SELECT doc_id,
       |    CASE WHEN u < $SnapshotChangedSlice THEN text || ' [stale]'
       |         ELSE text END AS text
       |  FROM u WHERE u < $SnapshotAddedSlice
       |  UNION ALL
       |  SELECT doc_id + 1000000000, text FROM u
       |  WHERE u < $SnapshotRemovedSlice)""".stripMargin

  // hash := high 60 bits of md5(id) — identical to portableHash60
  private[scale] def hashSqlFor(idExpr: String): String =
    s"CAST('0x' || substr(md5(CAST($idExpr AS VARCHAR)), 1, 15) AS BIGINT)"
  private val hashSql = hashSqlFor("doc_id")

  /** `portableHash60(id)/2^60` in SQL — the [[splitExpr]] uniform. */
  private[scale] def splitUSql(idExpr: String): String =
    s"CAST(${hashSqlFor(idExpr)} AS DOUBLE) / 1152921504606846976.0"

  // the project-wide tokenizer contract (see TextAnalysis.wsSql)
  private val wsSql =
    "list_filter(string_split_regex(trim(regexp_replace(regexp_replace(" +
      "lower(text),'[^a-z0-9 ]',' ','g'),' +',' ','g')), ' +'), w -> w <> '')"

  // q34's quality expression + q35's chars/4 token estimate, ranked
  // by (quality DESC, doc_id) with a running-total budget cut; the
  // distributed offsets reproduce the single global window exactly.
  // Shared by the q105 board and q137's reconciliation.
  private lazy val budgetCte =
    s"""w AS (SELECT doc_id, text, $wsSql AS ws FROM documents),
       |m AS (SELECT doc_id,
       |  CAST(len(ws) AS INTEGER) AS n_words,
       |  GREATEST(len(ws), 1) AS nw,
       |  GREATEST(len(text), 1) AS nc,
       |  len(list_filter(ws, x -> list_contains(${TextAnalysis.stopListSql}, x))) AS stop_hits,
       |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
       |  CAST(CEIL(CAST(len(text) AS DOUBLE)/4) AS BIGINT) AS toks
       |FROM w),
       |q AS (SELECT doc_id, toks,
       |  ${TextAnalysis.qualitySql} AS quality
       |FROM m WHERE toks > 0),
       |c AS (SELECT doc_id, quality, toks,
       |  CAST(SUM(toks) OVER (ORDER BY quality DESC, doc_id
       |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_toks
       |FROM q)""".stripMargin

  /** The q73 sequence-packing chain as a shared CTE (`pk`): global
    * token stream intervals + chunk coordinates. Shared by the q73
    * board and q145's efficiency rollup so the two cannot drift. */
  private lazy val seqPackCte =
    """t AS (SELECT doc_id,
      |  CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT) AS toks
      |  FROM documents),
      |f AS (SELECT * FROM t WHERE toks > 0),
      |c AS (SELECT doc_id, toks,
      |  CAST(SUM(toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum_end FROM f),
      |pk AS (SELECT doc_id, toks, cum_end - toks AS cum_start, cum_end,
      |  (cum_end - toks) // 2048 AS chunk_first,
      |  (cum_end - 1) // 2048 AS chunk_last
      |FROM c)""".stripMargin

  /** The q140 CASE over cumulative thresholds, rendered from the SAME
    * Scala scanLeft doubles the Spark plan uses (full-precision
    * toString, e.g. `0.9000000000000001` — DuckDB parses back the
    * identical bits, so boundary hashes land identically). */
  private[scale] def splitCaseSql(uVar: String,
      splits: Seq[(String, Double)] = DefaultSplits): String = {
    val cum = splits.scanLeft(0.0) { case (a, (_, f)) => a + f }.tail
    "CASE " + splits.init.zip(cum.init)
      .map { case ((n, _), ub) => s"WHEN $uVar < $ub THEN '$n'" }
      .mkString(" ") + s" ELSE '${splits.last._1}' END"
  }

  /** The q176/q177 shared oracle fragment: the q173 feature chain
    * UNBOUNDED (whole documents table → byte-histogram embeddings at
    * the ANN dim), then the celled chain's three blocking keys —
    * fixed sign-plane bucket ([[Similarity.bucketSql]] verbatim),
    * TOP-2 argmax-cosine cells over the first-[[Similarity.IvfCells]]
    * seed rows (the q95 CTE shape, rn ≤ 2 pivoted to cell_id/cell2 —
    * q178's probe set), and the diff-plane bucket whose planes
    * are component-wise differences of seed pairs (2p, 2p+1) — exact
    * double subtractions of float32-cast values, dotted with
    * `list_dot_product` (the same sequential fold as the Scala
    * kernel). Ends with the `keyed` CTE both consumers read. */
  /** The documents→bytes oracle fragment shared by the media family
    * (q176/q177/q178's keyed chain and the q179/q180 codec boards):
    * CTE `a` = (id, hex payload), CTE `b` = one (id, i, byte) row per
    * payload byte — THE byte-extraction expression, written once so
    * the five consumers cannot drift. `idAlias` names the id column
    * (`vec_id` for the ANN chain, `asset_id` for the codec boards). */
  private def docBytesCteSql(idAlias: String): String =
    s"""a AS (SELECT doc_id AS $idAlias, hex(encode(text)) AS h
       |           FROM documents),
       |b AS (SELECT $idAlias, i,
       |    CAST(('0x' || substring(h, CAST(2*i - 1 AS INTEGER), 2))
       |      AS INTEGER) AS byte
       |  FROM a, unnest(range(1, 1 + length(h) // 2)) t(i))""".stripMargin

  private lazy val mediaKeyedCteSql: String = {
    val dim = Multimodal.MediaAnnDim
    val nP = Similarity.NumPlanes
    s"""${docBytesCteSql("vec_id")},
       |c AS (SELECT vec_id, byte * $dim // 256 AS bin, COUNT(*) AS cnt
       |      FROM b GROUP BY 1, 2),
       |n AS (SELECT vec_id,
       |        CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS DOUBLE) AS ss
       |      FROM c GROUP BY 1),
       |g AS (SELECT vec_id, unnest(range(0, $dim)) AS pos FROM a),
       |f AS (SELECT g.vec_id, g.pos,
       |    CAST(CASE WHEN COALESCE(n.ss, 0) > 0
       |      THEN CAST(COALESCE(c.cnt, 0) AS DOUBLE) / sqrt(n.ss)
       |      ELSE 0.0 END AS FLOAT) AS value
       |  FROM g LEFT JOIN n USING (vec_id)
       |  LEFT JOIN c ON c.vec_id = g.vec_id AND c.bin = g.pos),
       |e AS (SELECT vec_id,
       |        list(CAST(value AS DOUBLE) ORDER BY pos) AS embedding
       |      FROM f GROUP BY 1),
       |bk0 AS (SELECT vec_id,
       |    CAST(${Similarity.bucketSql} AS BIGINT) AS bucket,
       |    embedding AS v,
       |    sqrt(list_dot_product(embedding, embedding)) AS nrm FROM e),
       |bk AS (SELECT * FROM bk0 WHERE nrm > 0),
       |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn FROM bk
       |          WHERE vec_id < ${Similarity.IvfCells}),
       |asg AS (SELECT vec_id,
       |    MAX(CASE WHEN rn = 1 THEN cell_id END) AS cell_id,
       |    MAX(CASE WHEN rn = 2 THEN cell_id END) AS cell2
       |  FROM (
       |    SELECT x.vec_id, c.cell_id,
       |      ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |        ORDER BY list_dot_product(x.v, c.cv)/(x.nrm*c.cn) DESC,
       |          c.cell_id ASC) AS rn
       |    FROM bk x, cents c) WHERE rn <= 2 GROUP BY vec_id),
       |pld AS (SELECT pp.p, u.i, ca.cv[i] - cb.cv[i] AS dv
       |  FROM (SELECT unnest(range(0, $nP)) AS p) pp
       |  JOIN cents ca ON ca.cell_id = 2*pp.p
       |  JOIN cents cb ON cb.cell_id = 2*pp.p + 1,
       |  unnest(range(1, $dim + 1)) u(i)),
       |plv AS (SELECT p, list(dv ORDER BY i) AS pv FROM pld GROUP BY p),
       |db AS (SELECT x.vec_id,
       |    CAST(SUM(CASE WHEN list_dot_product(x.v, pl.pv) > 0
       |             THEN 1 << p ELSE 0 END) AS BIGINT) AS dbucket
       |  FROM bk x, plv pl GROUP BY 1),
       |keyed AS (SELECT bk.vec_id, asg.cell_id, asg.cell2, db.dbucket,
       |    bk.bucket, bk.v, bk.nrm
       |  FROM bk JOIN asg USING (vec_id) JOIN db USING (vec_id)),""".stripMargin
  }

  override val oracle: Map[String, String] = Map(
    "q144_chunk_spans" ->
      s"""WITH w AS (SELECT doc_id, len($wsSql) AS n FROM documents),
         |f AS (SELECT * FROM w WHERE n > 0)
         |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
         |  CAST(i * 48 AS BIGINT) AS tok_start,
         |  CAST(LEAST(i * 48 + 64, n) AS BIGINT) AS tok_end,
         |  CAST(LEAST(i * 48 + 64, n) - i * 48 AS BIGINT) AS n_toks
         |FROM f, unnest(range(0, (n - 1) // 48 + 1)) t(i)""".stripMargin,
    "q140_hash_split" ->
      s"""WITH u AS (SELECT doc_id,
         |  CAST($hashSql AS DOUBLE) / 1152921504606846976.0 AS u
         |FROM documents)
         |SELECT doc_id,
         |  ${splitCaseSql("u")}
         |    AS split
         |FROM u""".stripMargin,
    // the synthetic prev snapshot restated: u ≥ 0.9 absent (added),
    // u < 0.1 edited (changed), shifted u < 0.05 copy (removed)
    "q141_snapshot_diff" ->
      s"""WITH $prevSnapshotCteSql,
         |p AS (SELECT doc_id, md5(text) AS prev_md5 FROM prev),
         |c AS (SELECT doc_id, md5(text) AS cur_md5 FROM documents),
         |j AS (SELECT
         |    CASE WHEN prev_md5 IS NULL THEN 'added'
         |         WHEN cur_md5 IS NULL THEN 'removed'
         |         WHEN prev_md5 = cur_md5 THEN 'unchanged'
         |         ELSE 'changed' END AS status
         |  FROM p FULL OUTER JOIN c USING (doc_id))
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs
         |FROM j GROUP BY status""".stripMargin,
    "q105_budget_select" ->
      s"""WITH $budgetCte
         |SELECT doc_id, quality, toks, cum_toks
         |FROM c WHERE cum_toks <= 20000""".stripMargin,
    // the q105 selection chain, reconciled against the target mixture:
    // language shares of the selected tokens vs the q79 targets, the
    // "did quality selection skew the mixture" QA read
    "q137_selection_mixture" -> {
      val targetCase = "CASE lang " + TargetMixture.toSeq.sortBy(_._1)
        .map { case (l, v) => s"WHEN '$l' THEN $v" }
        .mkString(" ") + " ELSE 0.0 END"
      s"""WITH $budgetCte,
         |sel AS (SELECT doc_id, toks FROM c WHERE cum_toks <= 20000),
         |lg AS (SELECT s.toks, d.lang FROM sel s JOIN documents d USING (doc_id)),
         |pl AS (SELECT lang, COUNT(*) AS n_docs,
         |       CAST(SUM(toks) AS BIGINT) AS sel_toks FROM lg GROUP BY lang),
         |tt AS (SELECT CAST(SUM(sel_toks) AS BIGINT) AS total_toks FROM pl),
         |sh AS (SELECT lang, n_docs, sel_toks,
         |  FLOOR(CAST(sel_toks AS DOUBLE) / total_toks * 1000000 + 0.5)
         |    / 1000000 AS share,
         |  $targetCase AS target
         |FROM pl, tt)
         |SELECT lang, n_docs, sel_toks, share, target,
         |  share - target AS dev
         |FROM sh""".stripMargin
    },
    // need = target × budget is one double multiply of the SAME parsed
    // literals; epochs/shortfall re-derive from it with identical
    // expression trees (CEIL/LEAST/GREATEST are exact on doubles)
    "q148_epoch_allocation" -> {
      val targetCase = "CASE lang " + TargetMixture.toSeq.sortBy(_._1)
        .map { case (l, v) => s"WHEN '$l' THEN $v" }
        .mkString(" ") + " ELSE 0.0 END"
      s"""WITH pl AS (SELECT lang,
         |  CAST(SUM(CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT))
         |    AS BIGINT) AS avail_toks
         |FROM documents GROUP BY lang),
         |t AS (SELECT lang, avail_toks, $targetCase AS target,
         |  ($targetCase) * 50000.0 AS need_toks FROM pl)
         |SELECT lang, avail_toks, target, need_toks,
         |  CASE WHEN avail_toks > 0 THEN
         |    FLOOR(need_toks / CAST(avail_toks AS DOUBLE) * 1000000 + 0.5)
         |      / 1000000 END AS epochs_frac,
         |  CASE WHEN avail_toks > 0 THEN
         |    CAST(LEAST(CEIL(need_toks / CAST(avail_toks AS DOUBLE)), 4)
         |      AS BIGINT) END AS planned_epochs,
         |  FLOOR(GREATEST(need_toks - CAST(avail_toks * 4 AS DOUBLE), 0.0)
         |    * 1000000 + 0.5) / 1000000 AS shortfall_toks,
         |  CASE WHEN avail_toks > 0 THEN
         |    need_toks > CAST(avail_toks AS DOUBLE) END AS oversampled
         |FROM t""".stripMargin
    },
    // the budget chain's quality CTE + ANSI percentile_disc quartiles
    // (spec-proven equivalent of the Spark cum-dist picks); phase
    // assignment is the same CASE against the same boundary values
    "q161_curriculum" ->
      s"""WITH $budgetCte,
         |b AS (SELECT
         |  percentile_disc(0.25) WITHIN GROUP (ORDER BY quality) AS p25,
         |  percentile_disc(0.5) WITHIN GROUP (ORDER BY quality) AS p50,
         |  percentile_disc(0.75) WITHIN GROUP (ORDER BY quality) AS p75
         | FROM q),
         |a AS (SELECT CASE WHEN quality <= b.p25 THEN '1_q1'
         |    WHEN quality <= b.p50 THEN '2_q2'
         |    WHEN quality <= b.p75 THEN '3_q3'
         |    ELSE '4_q4' END AS phase, toks, quality
         |  FROM q, b)
         |SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS phase_toks,
         |  MIN(quality) AS min_quality, MAX(quality) AS max_quality
         |FROM a GROUP BY phase""".stripMargin,
    // the q73 prefix-sum chain at shard granularity; every stat is
    // exact-integer, fill is one floor-r6'd division
    // the q159 shard assignment joined back to sources; Simpson's
    // numerator is the exact integer sum of squared counts, the
    // dominant source restates max(struct(cnt, source)) as the rn=1
    // row of (cnt DESC, source DESC)
    "q168_shard_mixing" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT) AS toks
        |  FROM documents),
        |f AS (SELECT * FROM t WHERE toks > 0),
        |c AS (SELECT doc_id, toks,
        |  CAST(SUM(toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum_end FROM f),
        |sh AS (SELECT (cum_end - toks) // 4096 AS shard_id, doc_id FROM c),
        |j AS (SELECT sh.shard_id, d.source FROM sh
        |      JOIN documents d USING (doc_id)),
        |g AS (SELECT shard_id, source, CAST(COUNT(*) AS BIGINT) AS cnt
        |      FROM j GROUP BY 1, 2),
        |a AS (SELECT shard_id, CAST(SUM(cnt) AS BIGINT) AS n_docs,
        |        CAST(COUNT(*) AS BIGINT) AS n_sources,
        |        CAST(SUM(cnt * cnt) AS BIGINT) AS sq
        |      FROM g GROUP BY 1),
        |top AS (SELECT shard_id, source AS top_source, cnt FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY shard_id
        |      ORDER BY cnt DESC, source DESC) AS rn FROM g) WHERE rn = 1)
        |SELECT a.shard_id, a.n_docs, a.n_sources, top.top_source,
        |  FLOOR(CAST(top.cnt AS DOUBLE) / a.n_docs * 1000000 + 0.5)
        |    / 1000000 AS top_share,
        |  FLOOR(CAST(a.sq AS DOUBLE) / (a.n_docs * a.n_docs)
        |    * 1000000 + 0.5) / 1000000 AS simpson
        |FROM a JOIN top USING (shard_id)""".stripMargin,
    "q159_shard_plan" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT) AS toks
        |  FROM documents),
        |f AS (SELECT * FROM t WHERE toks > 0),
        |c AS (SELECT doc_id, toks,
        |  CAST(SUM(toks) OVER (ORDER BY doc_id) AS BIGINT) AS cum_end FROM f),
        |sh AS (SELECT (cum_end - toks) // 4096 AS shard_id, doc_id, toks
        |  FROM c)
        |SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS shard_toks,
        |  CAST(SUM(toks) AS BIGINT) - 4096 AS dev_toks,
        |  FLOOR(CAST(SUM(toks) AS DOUBLE) / 4096 * 1000000 + 0.5) / 1000000
        |    AS fill,
        |  CAST(MIN(doc_id) AS BIGINT) AS first_doc,
        |  CAST(MAX(doc_id) AS BIGINT) AS last_doc
        |FROM sh GROUP BY shard_id""".stripMargin,
    // the q141 prev-snapshot CTE restated, statuses from the same
    // full-outer md5 compare, quality on COALESCE(cur, prev) text;
    // mean quality rides the DECIMAL(18,6) exact sum
    "q153_quality_drift" ->
      s"""WITH $prevSnapshotCteSql,
         |p AS (SELECT doc_id, text, md5(text) AS m FROM prev),
         |c AS (SELECT doc_id, text, md5(text) AS m FROM documents),
         |j AS (SELECT
         |    CASE WHEN p.m IS NULL THEN 'added'
         |         WHEN c.m IS NULL THEN 'removed'
         |         WHEN p.m = c.m THEN 'unchanged'
         |         ELSE 'changed' END AS status,
         |    COALESCE(c.text, p.text) AS text
         |  FROM p FULL OUTER JOIN c USING (doc_id)),
         |w2 AS (SELECT status, text, $wsSql AS ws FROM j),
         |m2 AS (SELECT status,
         |  CAST(len(ws) AS INTEGER) AS n_words,
         |  GREATEST(len(ws), 1) AS nw,
         |  GREATEST(len(text), 1) AS nc,
         |  len(list_filter(ws, x -> list_contains(${TextAnalysis.stopListSql}, x))) AS stop_hits,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         |  CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT) AS toks
         | FROM w2),
         |q2 AS (SELECT status, toks, ${TextAnalysis.qualitySql} AS q FROM m2)
         |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS sum_toks,
         |  FLOOR(${exactSumSql("q")} / COUNT(*) * 1000000 + 0.5) / 1000000
         |    AS mean_quality,
         |  FLOOR(CAST(SUM(toks) AS DOUBLE) / COUNT(*) * 1000000 + 0.5)
         |    / 1000000 AS mean_toks
         |FROM q2 GROUP BY status""".stripMargin,
    // split is the q140 CASE over the same scanLeft thresholds; every
    // rollup re-aggregates the (split, lang) cell table
    "q154_split_balance" -> {
      s"""WITH u AS (SELECT lang,
         |  CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT) AS toks,
         |  ${splitUSql("doc_id")} AS uu
         |FROM documents),
         |cell AS (SELECT ${splitCaseSql("uu")} AS split, lang,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS toks FROM u GROUP BY 1, 2),
         |s AS (SELECT split, CAST(SUM(toks) AS BIGINT) AS split_toks
         |      FROM cell GROUP BY 1),
         |l AS (SELECT lang, CAST(SUM(toks) AS BIGINT) AS lang_toks
         |      FROM cell GROUP BY 1),
         |t AS (SELECT CAST(SUM(toks) AS BIGINT) AS total_toks FROM cell)
         |SELECT split, lang, n_docs, toks, share, global_share,
         |  share - global_share AS dev
         |FROM (SELECT c.split, c.lang, c.n_docs, c.toks,
         |  CASE WHEN s.split_toks > 0 THEN
         |    FLOOR(CAST(c.toks AS DOUBLE) / s.split_toks * 1000000 + 0.5)
         |      / 1000000 END AS share,
         |  CASE WHEN t.total_toks > 0 THEN
         |    FLOOR(CAST(l.lang_toks AS DOUBLE) / t.total_toks * 1000000 + 0.5)
         |      / 1000000 END AS global_share
         | FROM cell c JOIN s USING (split) JOIN l USING (lang), t)""".stripMargin
    },
    // the two ROW_NUMBER orders are total (doc_id unique), so batch
    // membership is deterministic; every aggregate is exact-integer
    // (HUGEINT sums cast to BIGINT), only pad_frac divides
    "q152_batch_padding" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT) AS toks
        |  FROM documents),
        |f AS (SELECT * FROM t WHERE toks > 0),
        |rn AS (SELECT doc_id, toks,
        |  ROW_NUMBER() OVER (ORDER BY doc_id) AS r1,
        |  ROW_NUMBER() OVER (ORDER BY toks, doc_id) AS r2 FROM f),
        |b1 AS (SELECT (r1 - 1) // 16 AS batch_id, COUNT(*) AS n,
        |  SUM(toks) AS real, MAX(toks) AS mx FROM rn GROUP BY 1),
        |a1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_batches,
        |  CAST(SUM(n) AS BIGINT) AS n_docs,
        |  CAST(SUM(real) AS BIGINT) AS real_toks,
        |  CAST(SUM(n * mx) AS BIGINT) AS padded_toks FROM b1),
        |b2 AS (SELECT (r2 - 1) // 16 AS batch_id, COUNT(*) AS n,
        |  SUM(toks) AS real, MAX(toks) AS mx FROM rn GROUP BY 1),
        |a2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_batches,
        |  CAST(SUM(n) AS BIGINT) AS n_docs,
        |  CAST(SUM(real) AS BIGINT) AS real_toks,
        |  CAST(SUM(n * mx) AS BIGINT) AS padded_toks FROM b2)
        |SELECT '1_natural' AS strategy, n_docs, n_batches, real_toks,
        |  padded_toks, padded_toks - real_toks AS pad_toks,
        |  CASE WHEN padded_toks > 0 THEN
        |    FLOOR((CAST(padded_toks - real_toks AS DOUBLE) / padded_toks) * 10000.0 + 0.5) / 10000.0
        |  END AS pad_frac
        |FROM a1
        |UNION ALL
        |SELECT '2_length_sorted', n_docs, n_batches, real_toks,
        |  padded_toks, padded_toks - real_toks,
        |  CASE WHEN padded_toks > 0 THEN
        |    FLOOR((CAST(padded_toks - real_toks AS DOUBLE) / padded_toks) * 10000.0 + 0.5) / 10000.0
        |  END
        |FROM a2""".stripMargin,
    // share^τ at τ = 1/2^k is a k-deep chain of IEEE-exactly-rounded
    // SQRTs (k = 0, 1, 2), so every w is bit-identical to the Spark
    // side; per-τ wtot rides the DECIMAL(18,6) exact sum
    "q149_temperature_sweep" ->
      """WITH pl AS (SELECT lang,
        |  CAST(SUM(CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT))
        |    AS BIGINT) AS toks
        |FROM documents GROUP BY lang),
        |tt AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM pl),
        |sh AS (SELECT lang, toks,
        |  FLOOR(CAST(toks AS DOUBLE) / total * 1000000 + 0.5) / 1000000
        |    AS share
        |FROM pl, tt),
        |x AS (SELECT lang, toks, share, tau
        |      FROM sh, unnest([CAST(1.0 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                       CAST(0.25 AS DOUBLE)]) t(tau)),
        |w AS (SELECT lang, toks, share, tau,
        |  CASE WHEN tau = 1.0 THEN share
        |       WHEN tau = 0.5 THEN FLOOR(SQRT(share) * 1000000 + 0.5) / 1000000
        |       ELSE FLOOR(SQRT(SQRT(share)) * 1000000 + 0.5) / 1000000
        |  END AS w
        |FROM x),
        |wt AS (SELECT tau, CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE)
        |         AS wtot
        |       FROM w GROUP BY tau),
        |ts AS (SELECT lang, toks, share, tau,
        |  FLOOR(w / wtot * 1000000 + 0.5) / 1000000 AS target_share
        |FROM w JOIN wt USING (tau))
        |SELECT tau, lang, toks, share, target_share,
        |  CASE WHEN share > 0
        |    THEN FLOOR(target_share / share * 1000000 + 0.5) / 1000000
        |  END AS boost
        |FROM ts""".stripMargin,
    // √ is IEEE-exactly-rounded so both engines produce bit-identical
    // w from identical r6 shares; wtot rides the DECIMAL(18,6) exact
    // sum (the Spark side's exactSum accumulator) so the normalizer is
    // order-independent on both engines
    "q138_temperature_mixture" ->
      """WITH pl AS (SELECT lang,
        |  CAST(SUM(CAST(CEIL(CAST(len(text) AS DOUBLE) / 4) AS BIGINT))
        |    AS BIGINT) AS toks
        |FROM documents GROUP BY lang),
        |tt AS (SELECT CAST(SUM(toks) AS BIGINT) AS total FROM pl),
        |sh AS (SELECT lang, toks,
        |  FLOOR(CAST(toks AS DOUBLE) / total * 1000000 + 0.5) / 1000000
        |    AS share
        |FROM pl, tt),
        |w AS (SELECT lang, toks, share,
        |  FLOOR(SQRT(share) * 1000000 + 0.5) / 1000000 AS w
        |FROM sh),
        |wt AS (SELECT CAST(SUM(CAST(w AS DECIMAL(18,6))) AS DOUBLE) AS wtot
        |       FROM w),
        |ts AS (SELECT lang, toks, share,
        |  FLOOR(w / wtot * 1000000 + 0.5) / 1000000 AS target_share
        |FROM w, wt)
        |SELECT lang, toks, share, target_share,
        |  CASE WHEN share > 0
        |    THEN FLOOR(target_share / share * 1000000 + 0.5) / 1000000
        |  END AS boost
        |FROM ts""".stripMargin,
    // q38's assign CTE names each doc's cell; q34's quality judges
    // inside the cell; per-cell ROW_NUMBER restates the bounded top-k
    "q132_cell_balanced" ->
      s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM v),
         |cents AS (SELECT vec_id AS cell_id, v AS cv, nrm AS cn
         |          FROM n WHERE vec_id < ${Similarity.IvfCells} AND nrm > 0),
         |assign AS (SELECT vec_id AS doc_id, cell_id FROM (
         |    SELECT a.vec_id, c.cell_id,
         |      ROW_NUMBER() OVER (PARTITION BY a.vec_id
         |        ORDER BY list_dot_product(a.v, c.cv)/(a.nrm*c.cn) DESC,
         |          c.cell_id ASC) AS rn
         |    FROM n a, cents c) WHERE rn <= 1),
         |w AS (SELECT doc_id, text, $wsSql AS ws FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(ws) AS INTEGER) AS n_words,
         |  GREATEST(len(ws), 1) AS nw,
         |  GREATEST(len(text), 1) AS nc,
         |  len(list_filter(ws, x -> list_contains(${TextAnalysis.stopListSql}, x))) AS stop_hits,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
         |FROM w),
         |q AS (SELECT doc_id, ${TextAnalysis.qualitySql} AS quality FROM m),
         |j AS (SELECT a.cell_id, q.doc_id, q.quality
         |      FROM q JOIN assign a USING (doc_id)),
         |r AS (SELECT cell_id, doc_id, quality,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY cell_id
         |    ORDER BY quality DESC, doc_id ASC) AS INTEGER) AS rank
         |FROM j)
         |SELECT cell_id, rank, doc_id, quality
         |FROM r WHERE rank <= 20""".stripMargin,
    "q110_modality_integrity" ->
      """WITH d AS (SELECT doc_id, COUNT(*) AS dn FROM documents GROUP BY 1),
        |v AS (SELECT vec_id AS doc_id, COUNT(*) AS vn
        |      FROM embeddings GROUP BY 1),
        |j AS (SELECT d.dn, v.vn FROM d FULL OUTER JOIN v USING (doc_id)),
        |s AS (SELECT CAST(COALESCE(SUM(dn), 0) AS BIGINT) AS n_docs,
        |  CAST(COALESCE(SUM(vn), 0) AS BIGINT) AS n_vecs,
        |  COUNT(CASE WHEN dn IS NOT NULL AND vn IS NOT NULL THEN 1 END)
        |    AS n_paired,
        |  COUNT(CASE WHEN vn IS NULL THEN 1 END) AS n_text_only,
        |  COUNT(CASE WHEN dn IS NULL THEN 1 END) AS n_vec_only,
        |  COUNT(CASE WHEN dn > 1 THEN 1 END) AS n_dup_doc_ids,
        |  COUNT(CASE WHEN vn > 1 THEN 1 END) AS n_dup_vec_ids
        |FROM j)
        |SELECT *, (n_text_only = 0 AND n_vec_only = 0
        |  AND n_dup_doc_ids = 0 AND n_dup_vec_ids = 0) AS consistent
        |FROM s""".stripMargin,
    // the whole feature map restated: UTF-8 payload bytes via hex
    // 2-char slices, dim-bin histogram, Σc² exact in HUGEINT with one
    // cast to double, one sqrt, one division, one float32 cast — the
    // same single-rounding chain as the Scala kernel
    "q170_media_features" -> {
      val dim = Multimodal.MediaFeatureDim
      s"""WITH a AS (SELECT doc_id AS vec_id,
         |    (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)]
         |      AS kind,
         |    hex(encode(text)) AS h FROM documents),
         |b AS (SELECT vec_id,
         |    CAST(('0x' || substring(h, CAST(2*i - 1 AS INTEGER), 2))
         |      AS INTEGER) AS byte
         |  FROM a, unnest(range(1, 1 + length(h) // 2)) t(i)),
         |c AS (SELECT vec_id, byte * $dim // 256 AS bin, COUNT(*) AS cnt
         |      FROM b GROUP BY 1, 2),
         |n AS (SELECT vec_id,
         |        CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS DOUBLE) AS ss
         |      FROM c GROUP BY 1),
         |g AS (SELECT vec_id, kind, unnest(range(0, $dim)) AS pos FROM a)
         |SELECT g.vec_id, g.kind, CAST(g.pos AS INTEGER) AS pos,
         |  CAST(CASE WHEN COALESCE(n.ss, 0) > 0
         |    THEN CAST(COALESCE(c.cnt, 0) AS DOUBLE) / sqrt(n.ss)
         |    ELSE 0.0 END AS FLOAT) AS value
         |FROM g LEFT JOIN n USING (vec_id)
         |LEFT JOIN c ON c.vec_id = g.vec_id AND c.bin = g.pos""".stripMargin
    },
    // cross-modal dedup: the q170 feature CTE at the ANN dim assembled
    // into a DOUBLE[] named `embedding`, then the q69 oracle verbatim
    // (Similarity.bucketSql composes because the column name matches);
    // threshold compares the RAW cosine, rounding is display-only
    "q173_media_neardup" -> {
      val dim = Multimodal.MediaAnnDim
      s"""WITH a AS (SELECT doc_id AS vec_id, hex(encode(text)) AS h
         |           FROM documents
         |           WHERE doc_id < ${Multimodal.MediaNearDupMaxId}),
         |b AS (SELECT vec_id,
         |    CAST(('0x' || substring(h, CAST(2*i - 1 AS INTEGER), 2))
         |      AS INTEGER) AS byte
         |  FROM a, unnest(range(1, 1 + length(h) // 2)) t(i)),
         |c AS (SELECT vec_id, byte * $dim // 256 AS bin, COUNT(*) AS cnt
         |      FROM b GROUP BY 1, 2),
         |n AS (SELECT vec_id,
         |        CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS DOUBLE) AS ss
         |      FROM c GROUP BY 1),
         |g AS (SELECT vec_id, unnest(range(0, $dim)) AS pos FROM a),
         |f AS (SELECT g.vec_id, g.pos,
         |    CAST(CASE WHEN COALESCE(n.ss, 0) > 0
         |      THEN CAST(COALESCE(c.cnt, 0) AS DOUBLE) / sqrt(n.ss)
         |      ELSE 0.0 END AS FLOAT) AS value
         |  FROM g LEFT JOIN n USING (vec_id)
         |  LEFT JOIN c ON c.vec_id = g.vec_id AND c.bin = g.pos),
         |e AS (SELECT vec_id,
         |        list(CAST(value AS DOUBLE) ORDER BY pos) AS embedding
         |      FROM f GROUP BY 1),
         |bk AS (SELECT vec_id,
         |    CAST(${Similarity.bucketSql} AS BIGINT) AS bucket,
         |    embedding AS v,
         |    sqrt(list_dot_product(embedding, embedding)) AS nrm FROM e),
         |pr AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |    list_dot_product(x.v, y.v) / (x.nrm * y.nrm) AS cos
         |  FROM bk x JOIN bk y
         |    ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
         |SELECT vec_a, vec_b, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos
         |FROM pr WHERE cos >= ${Multimodal.MediaNearDupMinCos}""".stripMargin
    },
    // full-corpus celled chain: the q173 feature CTE unbounded, then
    // the three blocking keys restated — fixed bucket (bucketSql),
    // argmax-cosine cell over the first-IvfCells seeds (q95's CTE),
    // and the diff-plane bucket with planes DERIVED from the same
    // seeds (exact double subtractions of float32-cast components;
    // list_dot_product = the kernel's sequential fold)
    "q176_media_neardup_celled" ->
      s"""WITH $mediaKeyedCteSql
         |k2 AS (SELECT vec_id, cell_id, bucket,
         |    ${Dedup.celledBandDefsSql}, v, nrm FROM keyed),
         |pr AS (
         |  ${Dedup.celledPairArmsSql})
         |SELECT vec_a, vec_b, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos
         |FROM pr WHERE cos >= ${Multimodal.MediaNearDupMinCos}""".stripMargin,
    // the blocking-volume pricing board: exact integer counts off the
    // same keyed CTE — sub-quadraticity is the two band rows' summed
    // cand_pairs sitting orders of magnitude under quad_pairs
    "q177_media_blocking" -> (s"WITH $mediaKeyedCteSql\n" +
      Dedup.celledBlockingBoardSql),
    // incremental celled near-dup: the q176 pair arms feed the q174
    // shape verbatim — frozen-frozen pairs close into min-id clusters,
    // cross-boundary pairs attach the frozen labels, spine = arrivals
    "q184_media_neardup_incr" ->
      s"""WITH RECURSIVE $mediaKeyedCteSql
         |k2 AS (SELECT vec_id, cell_id, bucket,
         |    ${Dedup.celledBandDefsSql}, v, nrm FROM keyed),
         |pr0 AS (
         |  ${Dedup.celledPairArmsSql}),
         |p AS (SELECT vec_a, vec_b FROM pr0
         |      WHERE cos >= ${Multimodal.MediaNearDupMinCos}),
         |fp AS (SELECT vec_a, vec_b FROM p
         |       WHERE vec_b < ${Dedup.IncrementalBoundary}),
         |eg AS (SELECT vec_a AS a, vec_b AS b FROM fp
         |      UNION SELECT vec_b, vec_a FROM fp),
         |reach(a, b) AS (SELECT a, b FROM eg
         |  UNION SELECT r.a, e2.b FROM reach r JOIN eg e2 ON r.b = e2.a),
         |cl AS (SELECT a AS vec_id, LEAST(a, MIN(b)) AS cluster_id
         |       FROM reach GROUP BY a),
         |cm AS (SELECT vec_a, vec_b FROM p
         |       WHERE vec_a < ${Dedup.IncrementalBoundary}
         |         AND vec_b >= ${Dedup.IncrementalBoundary}),
         |m AS (SELECT cm.vec_b AS vec_id,
         |        CAST(COUNT(*) AS BIGINT) AS n_matches,
         |        CAST(COUNT(DISTINCT COALESCE(cl.cluster_id, cm.vec_a))
         |          AS BIGINT) AS n_clusters,
         |        MIN(COALESCE(cl.cluster_id, cm.vec_a)) AS cluster
         |      FROM cm LEFT JOIN cl ON cl.vec_id = cm.vec_a GROUP BY 1)
         |SELECT k.vec_id, m.vec_id IS NOT NULL AS matched,
         |  COALESCE(m.n_matches, 0) AS n_matches,
         |  COALESCE(m.n_clusters, 0) AS n_clusters, m.cluster
         |FROM keyed k LEFT JOIN m USING (vec_id)
         |WHERE k.vec_id >= ${Dedup.IncrementalBoundary}""".stripMargin,
    // the real-codec pixel board: the oracle recomputes the decoded
    // stats from the SOURCE bytes (hex-slice CTE) — the hash match IS
    // the certification that the PNG encode/decode round-trip was
    // bit-exact (gray pixels: sum_r = sum_g = sum_b = Σ bytes;
    // padding pixels are 0, so min collapses to 0 whenever w·h > n)
    "q179_pixel_decode" -> {
      val w = Multimodal.PixelWidth
      s"""WITH ${docBytesCteSql("asset_id")},
         |s AS (SELECT asset_id, COUNT(*) AS n, SUM(byte) AS sumb,
         |        MIN(byte) AS minb, MAX(byte) AS maxb
         |      FROM b GROUP BY 1),
         |d AS (SELECT a.asset_id, COALESCE(s.n, 0) AS n,
         |        COALESCE(s.sumb, 0) AS sumb, s.minb, s.maxb
         |      FROM a LEFT JOIN s USING (asset_id)),
         |f AS (SELECT asset_id, $w AS width,
         |        GREATEST(1, (n + $w - 1) // $w) AS height, n, sumb,
         |        minb, maxb
         |      FROM d)
         |SELECT asset_id, CAST(width AS INTEGER) AS width,
         |  CAST(height AS INTEGER) AS height,
         |  CAST(sumb AS BIGINT) AS sum_r, CAST(sumb AS BIGINT) AS sum_g,
         |  CAST(sumb AS BIGINT) AS sum_b,
         |  CAST(CASE WHEN width * height > n THEN 0 ELSE minb END
         |    AS INTEGER) AS min_c,
         |  CAST(COALESCE(maxb, 0) AS INTEGER) AS max_c
         |FROM f""".stripMargin
    },
    // the real-PCM audio board: byte PAIRS become signed 16-bit LE
    // samples (odd tail pads a zero high byte); the oracle recomputes
    // every statistic from the source bytes — the hash match certifies
    // the RIFF writer, chunk walker, signed sample decode and padding
    "q180_audio_decode" -> {
      val rate = Multimodal.WavSampleRate
      s"""WITH ${docBytesCteSql("asset_id")},
         |lo AS (SELECT asset_id, (i - 1) // 2 AS k, byte FROM b
         |       WHERE i % 2 = 1),
         |hi AS (SELECT asset_id, (i - 2) // 2 AS k, byte FROM b
         |       WHERE i % 2 = 0),
         |sg AS (SELECT lo.asset_id, lo.k,
         |    CASE WHEN lo.byte + 256 * COALESCE(hi.byte, 0) >= 32768
         |      THEN lo.byte + 256 * COALESCE(hi.byte, 0) - 65536
         |      ELSE lo.byte + 256 * COALESCE(hi.byte, 0) END AS s
         |  FROM lo LEFT JOIN hi
         |    ON hi.asset_id = lo.asset_id AND hi.k = lo.k),
         |st AS (SELECT asset_id, COUNT(*) AS n, SUM(s) AS sum_s,
         |        MIN(s) AS mn, MAX(s) AS mx,
         |        SUM(CAST(s AS HUGEINT) * s) AS ss
         |      FROM sg GROUP BY 1)
         |SELECT a.asset_id, $rate AS rate,
         |  CAST(COALESCE(st.n, 0) AS BIGINT) AS n_samples,
         |  CAST(COALESCE(st.sum_s, 0) AS BIGINT) AS sum_s,
         |  CAST(COALESCE(st.mn, 0) AS INTEGER) AS min_s,
         |  CAST(COALESCE(st.mx, 0) AS INTEGER) AS max_s,
         |  CAST(COALESCE(st.ss, 0) AS BIGINT) AS sum_sq
         |FROM a LEFT JOIN st USING (asset_id)""".stripMargin
    },
    // the multi-probe pair board: DISTINCT over shared probe cells
    // restates the Scala side's min-shared-cell exactly-once emission
    "q178_media_neardup_probe2" ->
      s"""WITH $mediaKeyedCteSql
         |k2 AS (SELECT vec_id, cell_id, cell2, bucket,
         |    ${Dedup.celledBandDefsSql}, v, nrm FROM keyed),
         |px AS (SELECT vec_id, cell_id AS pcell FROM k2
         |       UNION ALL SELECT vec_id, cell2 FROM k2),
         |pr AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |  FROM px pa JOIN px pb ON pa.pcell = pb.pcell
         |  JOIN k2 x ON x.vec_id = pa.vec_id
         |  JOIN k2 y ON y.vec_id = pb.vec_id
         |  WHERE x.vec_id < y.vec_id AND x.bucket = y.bucket
         |    AND ${Dedup.anyBandEqSql}),
         |sc AS (SELECT pr.vec_a, pr.vec_b,
         |    list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos
         |  FROM pr JOIN k2 a ON a.vec_id = pr.vec_a
         |  JOIN k2 b ON b.vec_id = pr.vec_b)
         |SELECT vec_a, vec_b, FLOOR((cos) * 10000.0 + 0.5) / 10000.0 AS cos
         |FROM sc WHERE cos >= ${Multimodal.MediaNearDupMinCos}""".stripMargin,
    // Σc² exact in HUGEINT (= the Spark decimal accumulator), one cast
    // to double, identical division trees
    "q109_source_diversity" ->
      """WITH c AS (SELECT source, lang, COUNT(*) AS c
        |           FROM documents GROUP BY 1, 2),
        |s AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
        |        COUNT(*) AS n_langs,
        |        CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE) AS sq
        |      FROM c GROUP BY source)
        |SELECT source, n_docs, n_langs,
        |  FLOOR((1.0 - sq / (CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE))) * 10000.0 + 0.5) / 10000.0
        |    AS gini,
        |  FLOOR(((CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)) / sq) * 10000.0 + 0.5) / 10000.0
        |    AS eff_langs
        |FROM s""".stripMargin,
    "q57_stratified_sample" -> {
      val cases = SampleFractions
        .map { case (l, f) => s"WHEN '$l' THEN $f" }.mkString(" ")
      s"""SELECT doc_id, lang FROM documents
         |WHERE CAST($hashSql AS DOUBLE) / 1152921504606846976.0
         |  < (CASE lang $cases ELSE 0.0 END)""".stripMargin
    },
    "q58_group_cap" ->
      s"""SELECT doc_id, lang FROM (
         |  SELECT doc_id, lang,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY $hashSql ASC, doc_id ASC) AS rn
         |  FROM documents) WHERE rn <= 15""".stripMargin,
    "q79_mixture_sample" -> {
      val cases = TargetMixture
        .map { case (l, t) => s"WHEN '$l' THEN $t" }.mkString(" ")
      s"""WITH c AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang),
         |t AS (SELECT COUNT(*) AS n_total FROM documents),
         |r AS (SELECT lang,
         |  LEAST(1.0, CAST(CASE lang $cases ELSE 0.0 END AS DOUBLE) * n_total / n_s) AS rate
         |FROM c, t)
         |SELECT d.doc_id, d.lang, FLOOR((r.rate) * 1000000.0 + 0.5) / 1000000.0 AS rate
         |FROM documents d JOIN r USING (lang)
         |WHERE CAST($hashSql AS DOUBLE) / 1152921504606846976.0 < r.rate""".stripMargin
    },
    "q73_seq_pack" ->
      s"""WITH $seqPackCte
         |SELECT doc_id, toks, cum_start, cum_end, chunk_first,
         |  chunk_last, chunk_last - chunk_first + 1 AS n_chunks
         |FROM pk""".stripMargin,
    // the q73 chain aggregated to the 1-row packing dashboard
    "q145_pack_efficiency" ->
      s"""WITH $seqPackCte
         |SELECT COUNT(*) AS n_docs,
         |  CAST(SUM(toks) AS BIGINT) AS total_tokens,
         |  CAST(MAX(chunk_last) + 1 AS BIGINT) AS n_chunks,
         |  COUNT(CASE WHEN chunk_last > chunk_first THEN 1 END)
         |    AS n_split_docs,
         |  CAST(MAX(chunk_last - chunk_first + 1) AS BIGINT)
         |    AS max_chunks_per_doc,
         |  FLOOR(CAST(SUM(toks) AS DOUBLE) / ((MAX(chunk_last) + 1) * 2048)
         |    * 1000000 + 0.5) / 1000000 AS fill_ratio
         |FROM pk""".stripMargin,
    // bucket counts restated as CTEs (the Spark side collects the same
    // bounded table to the driver); ratio parenthesization and the
    // per-doc in-order fold are IDENTICAL expression trees
    "q98_dsir_weights" ->
      s"""WITH w AS (SELECT doc_id, lang, $wsSql AS ws FROM documents),
         |bg AS (SELECT doc_id, lang,
         |  CASE WHEN len(ws) >= 2
         |    THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
         |    ELSE [] END AS bgs FROM w),
         |fb AS (SELECT lang,
         |    CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % 1024 AS b
         |  FROM (SELECT lang, unnest(bgs) AS g FROM bg)),
         |cnt AS (SELECT b, COUNT(*) AS rc,
         |    COUNT(CASE WHEN lang = 'en' THEN 1 END) AS tc
         |  FROM fb GROUP BY b),
         |tot AS (SELECT CAST(SUM(rc) AS BIGINT) AS rt,
         |    CAST(SUM(tc) AS BIGINT) AS tt FROM cnt),
         |ratio AS (SELECT b,
         |    (CAST(tc + 1 AS DOUBLE) * (rt + 1024)) /
         |    (CAST(rc + 1 AS DOUBLE) * (tt + 1024)) AS r
         |  FROM cnt, tot),
         |idx AS (SELECT doc_id, bgs, unnest(range(1, len(bgs) + 1)) AS i
         |        FROM bg WHERE len(bgs) >= 1),
         |fr AS (SELECT x.doc_id, x.i, r.r FROM (
         |    SELECT doc_id, i,
         |      CAST('0x' || substr(md5(bgs[i]), 1, 15) AS BIGINT) % 1024 AS b
         |    FROM idx) x
         |  JOIN ratio r ON r.b = x.b),
         |ds AS (SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(r ORDER BY i)),
         |      (a, b) -> a + b) AS sum_ratio
         |  FROM fr GROUP BY doc_id)
         |SELECT b.doc_id, b.lang, CAST(len(b.bgs) AS INTEGER) AS n_features,
         |  COALESCE(d.sum_ratio, CAST(0.0 AS DOUBLE)) AS sum_ratio,
         |  COALESCE(d.sum_ratio, CAST(0.0 AS DOUBLE)) / GREATEST(len(b.bgs), 1) AS avg_ratio,
         |  (COALESCE(d.sum_ratio, CAST(0.0 AS DOUBLE)) / GREATEST(len(b.bgs), 1)) > 1.0 AS keep
         |FROM bg b LEFT JOIN ds d USING (doc_id)""".stripMargin
  )
}
