package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Byte-pair-encoding tokenizer TRAINING in-engine (reference scope:
  * the text-analysis ladder of the north star; l37 computes only the
  * first merge's statistics — this trains the actual merge sequence).
  *
  * Discipline mirrors `Classify.trainLogReg`: the driver holds only
  * the learned state (the merge list — `iters` string pairs); each
  * iteration is ONE aggregation job over the word-frequency frame
  * (|vocab| rows, not |corpus| — BPE's classic bounded intermediate),
  * and iteration k's symbols are recomputed from the merge list, so
  * nothing per-word is ever collected.
  *
  * Symbol sequences ride a sentinel-delimited STRING — `␟␟a␟␟b␟␟`
  * (U+001F between and around symbols, doubled between) — because
  * applying a merge then is one literal `replace(repr, ␟l␟␟r␟, ␟lr␟)`:
  * greedy left-to-right non-overlapping in both Spark and DuckDB, which
  * is exactly BPE's one-pass merge semantics (a token produced by a
  * merge never re-merges within the same pass), and the doubled inner
  * sentinel keeps one replacement from consuming the boundary the next
  * occurrence needs. Corpus text must not contain U+001F. */
object Bpe {

  val Sep = "\u001f"

  /** The bounded frame BPE trains on: one row per distinct word with
    * its corpus frequency. */
  def wordFreqs(docs: DataFrame, text: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(text))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Initial character-level symbol repr: `␟␟h␟␟i␟␟` for "hi". */
  private[graft] def initRepr(word: Column): Column =
    concat(lit(Sep), regexp_replace(word, "(.)", Sep + "$1" + Sep), lit(Sep))

  /** One merge applied to a repr — literal replace, no regex. */
  private[graft] def applyMerge(repr: Column, l: String, r: String): Column =
    replace(repr, lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))

  /** Symbol array of a repr (split on the doubled sentinel, dropping
    * the empty ends). */
  private[graft] def symbols(repr: Column): Column = {
    val parts = split(repr, Sep + Sep)
    slice(parts, lit(2), size(parts) - 2)
  }

  /** Train `iters` merges over the word-frequency frame. Each step
    * counts adjacent symbol pairs weighted by word frequency (one
    * shuffle of |vocab|·avg_len pair rows) and takes the arg-max
    * (frequency desc, then (left, right) lexicographic — binary UTF-8
    * order on both engines). Returns (step, l_sym, r_sym, pair_freq).
    */
  def trainMerges(words: DataFrame, iters: Int): Seq[(Long, String, String, Long)] = {
    require(iters >= 1)
    var repr: Column = initRepr(col("word"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (k <- 1 to iters) {
      val sy = symbols(repr)
      val pairs = words
        .select(col("freq"),
          explode(zip_with(
            slice(sy, lit(1), size(sy) - 1),
            slice(sy, lit(2), size(sy) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("s"))
      val best = pairs.orderBy(col("s").desc, col("l"), col("r")).limit(1).collect()
      if (best.isEmpty) return merges.toSeq // vocabulary exhausted: every
      // word is one symbol — the oracle's CTE chain likewise yields no
      // further m_k rows, so both sides return the same shorter sequence
      val (l, r, s) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((k.toLong, l, r, s))
      repr = applyMerge(repr, l, r)
    }
    merges.toSeq
  }
}
