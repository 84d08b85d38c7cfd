package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Statistical language-model scoring for corpus quality filtering —
  * the CCNet/Gopher recipe: train a cheap LM on a reference corpus,
  * score every candidate document's cross-entropy under it, and drop
  * the tail (gibberish scores high, boilerplate scores low; both ends
  * are suspect). The reference's quality-filter stage
  * (pspf/processors/quality.py) exposes heuristic features only; a
  * perplexity score is the standard next step a curation pipeline adds
  * on top, so it lives beside qualityScore as a first-class operator.
  *
  * The model is an add-one-smoothed unigram LM: p(w) = (c(w)+1)/(N+V)
  * with c from the training corpus, N total training tokens, V distinct
  * training tokens. Out-of-vocabulary tokens score c=0 (the +1 floor).
  * Cross-entropy is the mean -ln p(w) over a document's tokens, in
  * nats; perplexity = exp(xent), left to the caller (exp compounds
  * rounding, so the verified surface is the entropy itself).
  *
  * Scale design: the LM is a (token, count) table built by one
  *   explode + groupBy(token) — shuffle carries distinct tokens, not
  * the token stream. Scoring joins the candidate token stream to the
  * LM on the token key: an equi-join that stays a shuffle-hash join at
  * any corpus size (a real-text vocabulary is millions of rows — too
  * big to ASSUME broadcastable, so the plan must not require it; AQE
  * broadcasts it when it does fit). The scalar (N, V) row is an
  * explicit broadcast. Per-doc aggregation shuffles (doc_id, rounded
  * logp) pairs — no vectors, no text.
  *
  * Cross-engine determinism: c, N, V are exact longs; (c+1)/(N+V) is
  * one IEEE double division (identical everywhere); ln agrees to
  * <=1 ulp across libms and is rounded to 6 d.p. per token BEFORE the
  * mean, and the mean itself sums the rounded values as DECIMAL (exact,
  * order-free) over an exact count — the same discipline the cosine
  * and BM25 families use.
  */
object LanguageModel {

  /** Train the unigram table: one row per distinct token with its
    * count. Shape: explode + groupBy — map-side partial aggregation
    * collapses the token stream before the shuffle. */
  def unigramLm(corpus: DataFrame, text: String): DataFrame =
    corpus.select(explode(TextFunctions.tokens(col(text))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))

  /** Score each document's cross-entropy under `lm` (a (token, c)
    * frame from unigramLm, possibly trained on a DIFFERENT reference
    * corpus — that split is exactly how CCNet uses Wikipedia-trained
    * LMs to score Common Crawl).
    *
    * Returns every input row: (id, n_tokens, xent) with xent null for
    * token-free documents (nothing to score; the row is preserved for
    * lineage joins, matching chunkTokens' contract). */
  def crossEntropy(docs: DataFrame, lm: DataFrame,
                   id: String, text: String): DataFrame = {
    val totals = lm.agg(sum(col("c")).as("n"), count(lit(1)).as("v"))
    val toks = docs.select(col(id), explode(TextFunctions.tokens(col(text))).as("token"))
    // left join: OOV tokens keep c null -> coalesce to 0 (add-one
    // smoothing floors them at 1/(N+V))
    val lp = toks.join(lm, Seq("token"), "left")
      .crossJoin(broadcast(totals))
      .select(col(id),
        round(-log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
          (col("n") + col("v")).cast("double")), 6).as("lp"))
    val scored = lp.groupBy(col(id)).agg(
      count(lit(1)).as("n_tokens"),
      // exact decimal sum (order-free), cast to double BEFORE the
      // division — decimal-division result scales differ across
      // engines, double division of an exactly-represented sum doesn't.
      // The quotient is deliberately NOT rounded: the mean of scale-6
      // decimals over an even count lands EXACTLY on a scale-6 midpoint
      // for real data (observed: S=210.926201, n=62 → 3.4020355), where
      // each engine's round() tie-breaks independently — while the
      // unrounded IEEE quotient of a correctly-rounded sum-double and
      // an exact count is bit-identical everywhere (both engines'
      // decimal→double conversions verified correctly-rounded over the
      // sf0.1 corpus).
      (sum(col("lp").cast("decimal(28,6)")).cast("double") /
        count(lit(1))).as("xent"))
    docs.select(col(id)).join(scored, Seq(id), "left")
      .select(col(id), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"), col("xent"))
  }

  /** Self-scored convenience: train on the corpus and score the same
    * corpus (the "how typical is this document of its own collection"
    * signal — boilerplate floors, gibberish ceilings). */
  def selfCrossEntropy(docs: DataFrame, id: String, text: String): DataFrame =
    crossEntropy(docs, unigramLm(docs, text), id, text)
}
