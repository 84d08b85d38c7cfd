package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table co-location: the shuffle-elimination leg of the
  * engine's partitioning toolkit (broadcast for small dims, salting for
  * skew — this one is for BIG-big equi-joins that repeat).
  *
  * A fact table joined repeatedly on the same key (documents↔verdicts,
  * events↔sessions, codes↔lists) pays a full shuffle of both sides per
  * run when stored as plain parquet. Persisting both sides bucketed by
  * the join key with the same bucket count makes every later equi-join
  * on that key exchange-free: each task reads matching bucket files
  * from both sides, so at 100 TB the nightly joins cost scan + merge,
  * not scan + cluster-wide shuffle + merge. `sortBy` within buckets
  * additionally lets the sort-merge join skip its per-task sort.
  *
  * Spark-first: this is just `DataFrameWriter.bucketBy.sortBy
  * .saveAsTable` — the catalog carries the bucket spec and Catalyst
  * drops the Exchange when output partitioning already satisfies the
  * join's distribution requirement. BucketingSpec pins the physical
  * plan (zero ShuffleExchange under a forced sort-merge join) AND
  * result-equality with the plain-parquet join.
  */
object Bucketing {

  /** Persist `df` as a parquet table bucketed (and sorted) by `key`
    * into `nBuckets` buckets. Both sides of a co-located join must use
    * the SAME key and bucket count. `path` makes it an EXTERNAL table
    * at that location (a caller-owned dir — e.g. a Scratch dir for a
    * self-contained graded query, so reruns in fresh JVMs never collide
    * with a managed-table dir left in the warehouse by a previous
    * process); default is a managed warehouse table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    nBuckets: Int, path: Option[String] = None): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their shared bucket key. When
    * both were written by `writeBucketed` with equal bucket counts the
    * plan is exchange-free; otherwise it degrades to a normal shuffled
    * join (still correct).
    *
    * `forceSortMerge` pins the SMJ path via a MERGE hint — the
    * co-location assertion's control knob: a small side AQE converts to
    * broadcast has no exchange to eliminate, so "0 shuffles" would be
    * vacuously true of any plan. A hint scopes the choice to THIS join;
    * mutating `spark.sql.autoBroadcastJoinThreshold` would leak into
    * whatever else the session plans before the conf is restored. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String,
                   joinType: String = "inner",
                   forceSortMerge: Boolean = false): DataFrame = {
    val left = spark.table(leftTable)
    (if (forceSortMerge) left.hint("merge") else left)
      .join(spark.table(rightTable), Seq(key), joinType)
  }

  /** Count the ShuffleExchange operators in a frame's executed plan —
    * the spec's assertion surface, exposed for plan audits (Ctl/REPL
    * callers checking a production join really is co-located). */
  def shuffleExchangeCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    // Three traps here. (1) AQE's pre-execution plan is NOT the truth —
    // `finalPhysicalPlan` drives this frame's OWN AdaptiveSparkPlanExec
    // to its runtime re-planned result (materializing its query stages,
    // but collecting nothing); a side-channel execution (e.g. a noop
    // write) would finalize a DIFFERENT QueryExecution and leave this
    // one at its initial plan. (2) AQE hides materialized stages behind
    // childless QueryStageExec wrappers (the exchange hangs off `plan`,
    // not `children`), so a naive children-walk undercounts to a
    // vacuous zero.
    def walk(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => walk(a.finalPhysicalPlan)
      case s: QueryStageExec => walk(s.plan)
      case e: ShuffleExchangeLike => 1 + e.children.map(walk).sum
      // (3) exchange REUSE hides a shuffle behind a leaf wrapper: the
      // reused exchange doesn't re-execute, but the consumer still
      // depends on shuffled data — a co-location audit asserting 0 must
      // see it, so walk the wrapped exchange (each plan OCCURRENCE
      // counts; this metric is "how often is data clustered by a
      // shuffle here", not "how many shuffles execute")
      case r: ReusedExchangeExec => walk(r.child)
      case _ => p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }

  /** The EXECUTED-shuffle view of the same plan: (distinct exchanges,
    * reused occurrences). A reused exchange runs once and is read from
    * twice — `shuffleExchangeCount` counts every occurrence (the
    * co-location audit's semantics: "is this consumer fed by a
    * shuffle"), this counts each exchange instance once and reports the
    * reuse separately, which is the cost view a scoreboard comparing
    * rounds wants (reuse is a plan IMPROVEMENT, not added work).
    * ReusedExchangeExec wraps the original exchange node, so identity
    * dedup is exact. */
  def executedShuffleCount(df: DataFrame): (Int, Int) = {
    import org.apache.spark.sql.execution.{ExternalRDDScanExec, RDDScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[ShuffleExchangeLike, java.lang.Boolean]())
    var reused = 0
    // RDD-LINEAGE shuffles: operators that materialize an order at the
    // RDD level (the rank family's range exchange + offset stitching)
    // surface in the SQL plan only as an `ExistingRDD` leaf — a counter
    // that stopped there would under-report exactly the shuffles those
    // operators exist to manage (the PLANS_r10 "honesty note"). Walking
    // the scan's RDD dependency DAG counts every ShuffleDependency the
    // lineage executes, dedup'd by shuffleId so a lineage referenced
    // twice (groupRank joins a frame derived from itself) counts once —
    // the same each-instance-once semantics as the SQL side.
    val seenRddShuffles = scala.collection.mutable.Set[Int]()
    val seenRdds = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[org.apache.spark.rdd.RDD[_], java.lang.Boolean]())
    def walkRdd(rdd: org.apache.spark.rdd.RDD[_]): Unit =
      if (seenRdds.add(rdd)) rdd.dependencies.foreach {
        case s: org.apache.spark.ShuffleDependency[_, _, _] =>
          seenRddShuffles += s.shuffleId
          walkRdd(s.rdd)
        case d => walkRdd(d.rdd)
      }
    // each exchange INSTANCE is walked into exactly once (identity
    // guard), wherever it is first met — as a live stage or through a
    // reuse wrapper — so nested exchanges below it count once too
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.finalPhysicalPlan)
      case s: QueryStageExec => walk(s.plan)
      case e: ShuffleExchangeLike => if (seen.add(e)) e.children.foreach(walk)
      case r: ReusedExchangeExec =>
        r.child match {
          case e: ShuffleExchangeLike =>
            reused += 1
            if (seen.add(e)) e.children.foreach(walk)
          case other => walk(other) // broadcast reuse: not a shuffle read,
          // but its subtree can hold exchanges met nowhere else
        }
      case r: RDDScanExec => walkRdd(r.rdd)
      case r: ExternalRDDScanExec[_] => walkRdd(r.rdd)
      case _ => p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    (seen.size + seenRddShuffles.size, reused)
  }
}
