package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: concatenate documents into
  * fixed-token-budget training sequences (the step between a deduped
  * corpus and a dataloader — unpacked short docs waste context length
  * as padding).
  *
  * Scale + determinism design: a greedy reset-on-overflow scan is
  * inherently sequential, so the corpus is first bucketed by
  * md5(doc_id) range into `nBuckets` independent streams — each bucket
  * packs in parallel (bucket count is the parallelism knob at 100 TB)
  * and membership is a pure hash function, so packing is identical on
  * any engine, layout, or rerun. Buckets are laid out contiguously by
  * repartition(bucket) + sortWithinPartitions(bucket, doc_id), then ONE
  * streaming mapPartitions scan packs each bucket in doc-id order,
  * resetting its counters at every bucket boundary — per-task memory is
  * O(1) regardless of bucket size (a flatMapGroups fold would buffer
  * corpus/nBuckets tuples per task: tens of GB at 10B docs). The
  * stateful scan is genuinely non-relational — the same per-partition
  * escape hatch as the reference's stateful operators. Oversized docs
  * (> budget) get a sequence of their own, like every packing
  * implementation.
  *
  * Output: one row per doc with its (bucket, seq_id, seq_pos) — the
  * dataloader key. Token counts use TextFunctions.tokenCount (same
  * whitespace contract the l1 oracle verifies).
  */
object Packing {

  /** Internal/output column names must be ABSENT from the input:
    * `withColumn` silently replaces a caller column of the same name
    * (and `withColumnRenamed` silently DUPLICATES the target name), so
    * a collision is either data loss or a downstream ambiguity error
    * far from its cause. Loud failure at the operator boundary instead
    * — the same convention the engine uses for corrupt weights and
    * ambiguous recovery states. */
  private[operators] def requireAbsent(df: DataFrame, op: String,
                                       names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"$op: input already has column(s) ${clash.mkString(", ")} — " +
        "rename them first; these names are reserved for the operator's output/scratch")
  }

  /** Context-window chunking — the inverse sibling of packSequences:
    * documents LONGER than the window split into consecutive
    * `chunkSize`-token chunks (last chunk ragged). Pure projection +
    * explode over codegen'd built-ins: no shuffle, no state — scales as
    * a map-only pass. Token-free docs yield one empty chunk (row
    * preserved for lineage joins). */
  def chunkTokens(docs: DataFrame, id: String, text: String, chunkSize: Int): DataFrame = {
    require(chunkSize > 0, "chunkSize must be positive")
    require(!Seq("toks", "chunk_idx", "chunk_text", "n_tokens").contains(id),
      s"chunkTokens: id column '$id' collides with an output/scratch name")
    val nChunks = greatest(
      ceil(size(col("toks")).cast("double") / chunkSize).cast("int"), lit(1))
    // null text ≡ token-free text (one empty chunk, n_tokens 0) — raw
    // nulls would null-poison size()/least() into a phantom full chunk
    docs.select(col(id),
        coalesce(TextFunctions.tokens(col(text)), array().cast("array<string>")).as("toks"))
      .select(col(id), col("toks"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_idx"))
      .select(col(id), col("chunk_idx"),
        array_join(slice(col("toks"), col("chunk_idx") * chunkSize + 1, lit(chunkSize)), " ")
          .as("chunk_text"),
        least(size(col("toks")) - col("chunk_idx") * chunkSize, lit(chunkSize))
          .as("n_tokens"))
  }

  def packSequences(spark: SparkSession, docs: DataFrame, id: String, text: String,
                    tokenBudget: Int, nBuckets: Int): DataFrame = {
    require(tokenBudget > 0 && nBuckets > 0, "tokenBudget and nBuckets must be positive")
    import spark.implicits._
    // null hygiene for crawl-shaped data: a null text packs as a
    // 0-token doc (row preserved for lineage); a null id cannot be
    // packed deterministically (no bucket, no order) and is dropped
    val prepared = docs.filter(col(id).isNotNull).select(
      col(id).cast("long").as("doc_id"),
      (conv(substring(md5(col(id).cast("string")), 1, 4), 16, 10) % nBuckets)
        .cast("int").as("bucket"),
      coalesce(TextFunctions.tokenCount(col(text)), lit(0)).cast("long").as("n_tokens"))
    // a partition may carry SEVERAL buckets (hash(bucket) % nBuckets
    // collides) — the sort makes them contiguous and the scan resets at
    // each boundary, so correctness never depends on the partitioning,
    // only the per-bucket doc-id order (Spark's sort-based shuffle
    // spills, so even a skewed bucket streams off disk, never the heap)
    prepared
      .repartition(nBuckets, col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"))
      .as[(Long, Int, Long)]
      .mapPartitions { it =>
        // greedy reset-on-overflow in doc-id order: deterministic given
        // the deterministic bucket membership. The new-sequence guard is
        // sequence-NON-EMPTY (pos > 0), not fill > 0: zero-token docs
        // occupy a position without consuming budget, and an oversized
        // doc following one must still take a sequence of its own
        // (caught by the ScalaCheck packing property)
        var curBucket = -1
        var seq = 0L
        var fill = 0L
        var pos = 0
        it.map { case (docId, bucket, n) =>
          if (bucket != curBucket) { curBucket = bucket; seq = 0L; fill = 0L; pos = 0 }
          if (pos > 0 && fill + n > tokenBudget) { seq += 1; fill = 0; pos = 0 }
          val row = (docId, bucket, n, seq, pos)
          fill += n
          pos += 1
          row
        }
      }
      .toDF("doc_id", "bucket", "n_tokens", "seq_id", "seq_pos")
  }

  /** The rank family's offset pass needs only ORDER-INDEPENDENT
    * per-partition summaries (row counts, weight sums), yet reading the
    * sorted frame would pay the per-partition O(n log n) sort a second
    * time: across jobs the range exchange's shuffle FILES are reused,
    * but the post-read `sortWithinPartitions` re-executes per job. This
    * digs the executed plan for the Sort node's child — the exchange
    * read — and hands THAT to the summary job: the same rows in the
    * same partition indices (an intra-partition sort is 1:1), minus the
    * sort. Falls back to the sorted output when the plan shape is
    * unexpected (correct either way, just the old double-sort cost).
    * Package-private with the fast-path flag exposed so PackingSpec can
    * assert the sort-free read ENGAGES — a Spark upgrade that changed
    * the plan shape would otherwise silently restore the double sort. */
  private[operators] def preSortRdd(sorted: DataFrame)
      : (org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow], Boolean) = {
    import org.apache.spark.sql.execution.{InputAdapter, SortExec, SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val qe = sorted.queryExecution
    // descend ONLY through top-level wrappers to the first Sort: the
    // helper is private to frames this object built as
    // repartitionByRange(...).sortWithinPartitions(...), so the Sort is
    // the plan root modulo AQE/codegen wrapping
    def sortChild(p: SparkPlan): Option[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => sortChild(a.finalPhysicalPlan)
      case q: QueryStageExec => sortChild(q.plan)
      case w: WholeStageCodegenExec => sortChild(w.child)
      case i: InputAdapter => sortChild(i.child)
      case s: SortExec => Some(s.child)
      case _ => None
    }
    sortChild(qe.executedPlan) match {
      case Some(child) => (child.execute(), true)
      case None => (qe.toRdd, false)
    }
  }

  /** Exact 0-based global rank of every row under `order` — the
    * building block for rank-dependent layout (shard dealing below)
    * that a plain `Window.orderBy` CANNOT provide at scale: an
    * unpartitioned window funnels the whole corpus through ONE task.
    * Here the order is materialized distributively: one range shuffle
    * clusters rows by order key across partitions, an intra-partition
    * sort finishes the total order, and per-partition offsets are
    * stitched from an O(partitions) count job (P longs on the driver,
    * never rows) that reads the exchange output PRE-sort — so the
    * per-partition sort, the expensive half, runs exactly once, in the
    * ranked pass. Rank is a pure function of the TOTAL order, so
    * range-boundary placement (which may vary with input splits)
    * cannot change the result — but the caller MUST make `order` total
    * (include a unique tiebreak column), or ranks within ties are
    * boundary-dependent. */
  def globalRank(df: DataFrame, order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(order.nonEmpty, "globalRank requires an ordering")
    requireAbsent(df, "globalRank", "_rank")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val counts = preSortRdd(sorted)._1.mapPartitionsWithIndex { (i, it) =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator((i, n))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val main = sorted.rdd
    require(counts.length == main.getNumPartitions,
      s"globalRank: offset pass saw ${counts.length} partitions, ranked pass has ${main.getNumPartitions}")
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "_rank", org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = main.mapPartitionsWithIndex { (i, it) =>
      var r = offsets(i) - 1
      it.map { row => r += 1; org.apache.spark.sql.Row.fromSeq(row.toSeq :+ r) }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Exact 0-based rank of every row WITHIN its `group` under `order`,
    * plus the group's size — the per-group sibling of `globalRank` and
    * the scalable replacement for `row_number over (partition by
    * group)`: a partitioned window funnels EACH GROUP through one task,
    * so a dominant group (one language holding 60 % of a 100 TB corpus)
    * serializes on a single executor. Here the range shuffle partitions
    * by (group, order...) JOINTLY — a giant group spreads across many
    * partitions — and each group's start offset and size come from a
    * |groups|-row aggregate broadcast back onto the ranked frame (the
    * aggregate re-reads the range shuffle's files, so the corpus
    * shuffles once). group_rank = global rank − group start: a pure
    * function of the total order, layout-invariant like `globalRank`.
    * Callers must make `order` total within each group (unique
    * tiebreak) and keep `group` cardinality broadcast-small
    * (sources/languages — not doc ids). Output: input columns +
    * `group_rank`, `group_n`. */
  def groupRank(df: DataFrame, group: String,
                order: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(order.nonEmpty, "groupRank requires an ordering")
    requireAbsent(df, "groupRank", "group_rank", "group_n", "_gstart", "_gkey")
    val g = globalRank(df, col(group) +: order)
    val starts = g.groupBy(col(group))
      .agg(min(col("_rank")).as("_gstart"), count(lit(1)).as("group_n"))
    // null-SAFE join: groupBy treats null as a group (crawl data has
    // null sources), but an equi-join would never match it back —
    // silently dropping every null-group row. <=> keeps the rank
    // total over the whole input.
    g.join(broadcast(starts.withColumnRenamed(group, "_gkey")),
        col(group) <=> col("_gkey"))
      .withColumn("group_rank", col("_rank") - col("_gstart"))
      .drop("_rank", "_gstart", "_gkey")
  }

  /** The dispatch record of `autoGroupRank` — which path ran and the
    * measured group cardinality that chose it (symmetric with
    * `Skew.SaltDecision`: the probe result travels with the output so
    * callers and specs can assert the decision, never guess it). */
  final case class RankDispatch(broadcastPath: Boolean, nGroups: Long,
                                maxBroadcastGroups: Long)

  /** Probe-driven per-group ranking: MEASURE the group cardinality and
    * dispatch to the right formulation, removing `groupRank`'s
    * "caller must know the cardinality or fail at runtime" constraint
    * (the rank-family sibling of `Skew.autoSaltedSumCount`).
    *
    * The two regimes fail in opposite directions, which is why the
    * dispatch is a cardinality probe:
    *  - FEW groups (≤ `maxBroadcastGroups`): each group can be huge —
    *    a window partitioned by the group funnels a dominant group
    *    through ONE task, so the broadcast-offset path (range shuffle
    *    over (group, order) jointly + |groups|-row broadcast) is the
    *    scale path; the offset frame is broadcast-small by the probe.
    *  - MANY groups: the |groups|-row offset frame is NOT
    *    broadcast-small, but high cardinality is exactly what makes a
    *    partitioned window safe — per-task work is bounded by the
    *    largest group, and groups spread across tasks.
    * Values are IDENTICAL either way (rank is a pure function of the
    * per-group total order; the spec pins equality), so downstream
    * code and oracles cannot tell which plan ran except through the
    * returned dispatch. The probe is one map-side-combined
    * count-distinct pass over the group column. Callers must still
    * make `order` total within each group (unique tiebreak). */
  def autoGroupRank(df: DataFrame, group: String,
                    order: Seq[org.apache.spark.sql.Column],
                    maxBroadcastGroups: Long = 1000000L)
      : (DataFrame, RankDispatch) = {
    require(order.nonEmpty, "autoGroupRank requires an ordering")
    require(maxBroadcastGroups > 0,
      s"maxBroadcastGroups must be positive, got $maxBroadcastGroups")
    val n = df.agg(countDistinct(col(group))).head().getLong(0)
    val dispatch = RankDispatch(n <= maxBroadcastGroups, n, maxBroadcastGroups)
    val out =
      if (dispatch.broadcastPath) groupRank(df, group, order)
      else {
        requireAbsent(df, "autoGroupRank", "group_rank", "group_n")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(group)).orderBy(order: _*)
        val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(group))
        df.withColumn("group_rank", row_number().over(w).cast("long") - 1)
          .withColumn("group_n", count(lit(1)).over(wAll))
          // match groupRank's column order (input..., group_n, group_rank)
          .select(df.columns.map(col) :+ col("group_n") :+ col("group_rank"): _*)
      }
    (out, dispatch)
  }

  /** Inclusive prefix sum of `weight` under the total order `order` —
    * the distributed form of `SUM(w) OVER (ORDER BY ... ROWS UNBOUNDED
    * PRECEDING)`, which Spark's window would otherwise compute on ONE
    * task (an unpartitioned ordered frame). Shape: the same range
    * shuffle as `globalRank` materializes the order; one O(partitions)
    * job collects per-partition weight totals (P longs on the driver,
    * never rows) from the exchange output PRE-sort — sums are
    * order-independent, so the per-partition sort runs once, in the
    * prefix pass; exclusive offsets are handed back and each partition
    * streams its own running sum. The prefix pass re-reads the range
    * shuffle's files (same RDD lineage → Spark skips the exchange), so
    * the corpus is shuffled once. Weights must be non-negative longs —
    * a negative weight silently corrupts every later prefix, so it
    * fails the job instead. Output: input columns + `_cum`. */
  def cumulativeByRank(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                       weight: String): DataFrame = {
    require(order.nonEmpty, "cumulativeByRank requires an ordering")
    requireAbsent(df, "cumulativeByRank", "_w", "_cum")
    val spark = df.sparkSession
    val sorted = df.withColumn("_w",
        when(col(weight).isNull || col(weight).cast("long") < 0,
          raise_error(lit(s"cumulativeByRank: null/negative weight in '$weight'")))
          .otherwise(col(weight).cast("long")))
      .repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val wIdx = sorted.schema.fieldIndex("_w")
    val rdd = sorted.rdd
    // pre-sort read: InternalRow layout matches the logical schema for
    // this Sort-over-Exchange plan (the sort neither adds nor reorders
    // columns), so _w sits at the same index
    val partSums = preSortRdd(sorted)._1.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(wIdx)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    require(partSums.length == rdd.getNumPartitions,
      s"cumulativeByRank: offset pass saw ${partSums.length} partitions, prefix pass has ${rdd.getNumPartitions}")
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix per partition
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields.filterNot(_.name == "_w") :+
        org.apache.spark.sql.types.StructField(
          "_cum", org.apache.spark.sql.types.LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = offsets(i)
      it.map { r =>
        run += r.getLong(wIdx)
        val vals = r.toSeq.zipWithIndex.collect { case (v, j) if j != wIdx => v }
        org.apache.spark.sql.Row.fromSeq(vals :+ run)
      }
    }
    spark.createDataFrame(out, schema)
  }

  /** Greedy budget selection: keep the best-ranked rows while the
    * running `weight` total stays within `budget` — "take the
    * highest-quality documents until the 1B-token budget", the
    * corpus-sizing step between scoring and export. Inclusive prefix
    * semantics: a row is kept iff the budget covers it ENTIRELY
    * (cum ≤ budget), matching the windowed-SQL formulation any engine
    * can replay. One range shuffle + one O(partitions) offset job —
    * never a single-task ordered window. */
  def selectByBudget(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                     weight: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    cumulativeByRank(df, order, weight)
      .filter(col("_cum") <= budget).drop("_cum")
  }

  /** Deterministic per-epoch dataloader order: position = exact global
    * rank under md5("epoch<e>|" + id) — a fresh pseudo-random
    * permutation of the corpus for every epoch, reproducible on any
    * engine/layout/rerun (training runs must be able to replay epoch 7's
    * exact batch order after a restart; `orderBy(rand())` cannot).
    * Same distributed-rank machinery as `globalRank` — one range
    * shuffle, never a single-reducer window. The id is the tiebreak, so
    * the order is total whenever ids are unique. Output: input columns
    * + `pos` (dense 0-based). */
  def epochOrder(df: DataFrame, id: String, epoch: Int): DataFrame = {
    requireAbsent(df, "epochOrder", "pos")
    val h = md5(concat(lit(s"epoch$epoch|"), col(id).cast("string")))
    globalRank(df, Seq(h, col(id))).withColumnRenamed("_rank", "pos")
  }

  /** Deal documents into `nShards` output shards with near-equal total
    * `weight` per shard — the training-export step between a curated
    * corpus and N dataloader files, where "hash(id) % N" balances COUNT
    * but lets token mass skew with the length distribution. Rows are
    * ranked by (weight desc, id) and dealt SERPENTINE (round r
    * left-to-right, round r+1 right-to-left), so each full round gives
    * every shard one heavy-half and one light-half document; per-shard
    * totals differ by at most one round's spread. Fully deterministic
    * (exact global rank over a total order, integer arithmetic only)
    * and reproducible by any engine with a window function at oracle
    * scale. Output: input columns + `shard`. */
  def balancedShards(df: DataFrame, id: String, weight: String,
                     nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    requireAbsent(df, "balancedShards", "shard")
    globalRank(df, Seq(col(weight).desc, col(id)))
      .withColumn("shard",
        when(expr(s"_rank div $nShards") % 2 === 0,
          pmod(col("_rank"), lit(nShards.toLong)))
          .otherwise(lit(nShards.toLong) - 1L - pmod(col("_rank"), lit(nShards.toLong))))
      .drop("_rank")
  }
}
