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

  /** Fail fast on a word containing the repr sentinel: it would corrupt
    * merge training silently and IDENTICALLY on both engines, so
    * hash-grading could never catch it — one codegen'd `contains` per
    * distinct word instead. */
  private def guarded(word: Column): Column =
    when(word.contains(lit(Sep)),
      raise_error(concat(lit("BPE sentinel U+001F occurs in corpus word: "), word))
        .cast("string"))
      .otherwise(word)

  /** The bounded frame BPE trains on: one row per distinct word with
    * its corpus frequency. The sentinel constraint is ENFORCED here
    * (after the aggregation — one check per distinct word). */
  def wordFreqs(docs: DataFrame, text: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(text))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(guarded(col("word")).as("word"), col("freq"))

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
    *
    * Expression depth is BOUNDED: each merge wraps the repr in one more
    * literal `replace`, and a 30k-merge production vocabulary as a
    * single chain would sink Catalyst analysis long before the data
    * (and make iteration k redo k replaces — O(iters²·|vocab|) total
    * string work). So every `materializeEvery` merges the (repr, freq)
    * frame is materialized into a persisted RDD and the chain REBASED
    * on the stored column — the same round-materialization discipline
    * as `Dedup.connectedComponentsStar`. Catalyst never sees a plan
    * more than `materializeEvery` replaces deep, per-iteration work is
    * O(materializeEvery·|vocab|), and total work is linear in `iters`.
    * Values are unaffected (the RDD round-trip stores exact strings).
    */
  def trainMerges(words: DataFrame, iters: Int,
                  materializeEvery: Int = 25): Seq[(Long, String, String, Long)] = {
    require(iters >= 1)
    require(materializeEvery >= 1, "materializeEvery must be >= 1")
    val spark = words.sparkSession
    // (repr, freq) with the chain's base column; `pending` carries the
    // merges applied since the last materialization (depth <= K)
    var base = words.select(initRepr(col("word")).as("repr"), col("freq"))
    var baseRdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = null
    var pending: Column = col("repr")
    var depth = 0
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    try {
      for (k <- 1 to iters) {
        val sy = symbols(pending)
        val pairs = base
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
        pending = applyMerge(pending, l, r)
        depth += 1
        if (depth >= materializeEvery && k < iters) {
          val next = base.select(pending.as("repr"), col("freq"))
          val rdd = next.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          base = spark.createDataFrame(rdd, next.schema)
          // materialize the new round THROUGH the old round's cached
          // blocks BEFORE dropping them — unpersisting first would make
          // every later round recompute the whole chain from the words
          // frame (quadratic total work, the exact failure this rebase
          // exists to prevent; same ordering discipline as
          // connectedComponentsStar's probe-then-unpersist)
          rdd.count()
          if (baseRdd != null) baseRdd.unpersist(blocking = false)
          baseRdd = rdd
          pending = col("repr")
          depth = 0
        }
      }
      merges.toSeq
    } finally {
      // the returned merge list is plain driver values — nothing lazy
      // escapes that could still need the materialized rounds
      if (baseRdd != null) baseRdd.unpersist(blocking = false)
    }
  }

  /** Apply a TRAINED merge list to a distinct-word frame → (word,
    * pieces): each word's learned-subword array, produced by replaying
    * the merges in training order with the same literal sentinel
    * replace. The expression chain rebases onto an RDD-backed frame
    * every `materializeEvery` merges, so CATALYST never analyzes a plan
    * more than K replaces deep — trainMerges' depth discipline. Unlike
    * training (which runs an action per iteration and therefore caches
    * rounds), this builds ONE lazy frame: the RDD hops pipeline into a
    * single pass per downstream action, so nothing persists and nothing
    * leaks into a long-lived session's block manager. */
  def encodeWords(words: DataFrame, merges: Seq[(String, String)],
                  materializeEvery: Int = 25): DataFrame = {
    require(materializeEvery >= 1, "materializeEvery must be >= 1")
    val spark = words.sparkSession
    var base = words.select(guarded(col("word")).as("word"))
      .select(col("word"), initRepr(col("word")).as("repr"))
    var pending: Column = col("repr")
    var depth = 0
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      pending = applyMerge(pending, l, r)
      depth += 1
      if (depth >= materializeEvery && i < merges.size - 1) {
        val next = base.select(col("word"), pending.as("repr"))
        base = spark.createDataFrame(next.rdd, next.schema)
        pending = col("repr")
        depth = 0
      }
    }
    base.select(col("word"), symbols(pending).as("pieces"))
  }

  /** Encode a corpus with a trained merge list — the tokenize step of
    * the learned tokenizer: (id, n_pieces, pieces) per document, pieces
    * in original token order. The 100 TB shape: merges replay over the
    * DISTINCT word vocabulary once (|vocab| rows — BPE's bounded
    * intermediate, exactly like training), and the corpus itself pays
    * one posexplode, one equi-join on the word, and one per-document
    * reassembly; document text never rides the merge chain. Token-free
    * documents surface with zero pieces, not dropped rows. */
  def encode(docs: DataFrame, id: String, text: String,
             merges: Seq[(String, String)],
             materializeEvery: Int = 25): DataFrame = {
    val toks = docs.select(col(id),
      posexplode(TextFunctions.tokens(col(text))).as(Seq("pos", "word")))
    val vocab = toks.select(col("word")).distinct()
    val enc = encodeWords(vocab, merges, materializeEvery)
    val rebuilt = toks.join(enc, Seq("word"))
      .groupBy(col(id))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("pieces")))),
        x => x.getField("pieces"))).as("pieces"))
    docs.select(col(id))
      .join(rebuilt, Seq(id), "left")
      .select(col(id),
        coalesce(col("pieces"), array().cast("array<string>")).as("pieces"))
      .select(col(id), size(col("pieces")).cast("long").as("n_pieces"), col("pieces"))
  }
}
