package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** kNN label propagation over embeddings — the relational core of
  * classifier-based corpus filtering (the FineWeb-Edu recipe: a small
  * labeled seed set + nearest-neighbor structure scores the whole
  * corpus; docs whose neighborhood is low-quality get dropped). The
  * reference stops at heuristic per-document features; this is the
  * semi-supervised step a production curation stack layers on top.
  *
  * The operator is deliberately SPLIT from neighbor search: it takes
  * any (qid, cid, cos, rk) neighbor frame — brute cosineTopK as the
  * exact baseline, lshTopK/ivfTopK as the bucketed 100 TB path — so
  * the vote is one groupBy over |corpus|·k rows regardless of how
  * neighbors were found. No vectors move through the vote: ids,
  * labels, and counts only.
  *
  * Vote rule (deterministic): most votes wins, ties break on the
  * smaller label. Unlabeled-neighborhood rows keep pred null.
  */
object Classify {

  /** Majority vote of each query's top-`k` labeled neighbors.
    * `neighbors`: (qid, cid, cos, rk) — rk-ascending = best-first.
    * `labels`: (id, label) for the LABELED subset (seed set).
    * Returns (id, pred, votes). */
  def knnVote(neighbors: DataFrame, labels: DataFrame,
              id: String, label: String, k: Int): DataFrame = {
    require(k >= 1, "knnVote requires k >= 1")
    val nb = neighbors.filter(col("rk") <= k)
      .join(labels.select(col(id).as("cid"), col(label).as("nl")), "cid")
    val votes = nb.groupBy(col("qid"), col("nl")).agg(count(lit(1)).as("votes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("votes").desc, col("nl"))
    votes.withColumn("vr", row_number().over(w)).filter(col("vr") === 1)
      .select(col("qid").as(id), col("nl").as("pred"), col("votes"))
  }

  /** Contrastive triplet mining for embedding training: each labeled
    * anchor pairs with its nearest SAME-label neighbor (positive) and
    * its nearest DIFFERENT-label neighbor (hard negative) — the
    * highest-cosine impostor is exactly the example a metric-learning
    * loss needs. margin = pos_cos - neg_cos (negative margin = the
    * anchor's neighborhood is dominated by impostors; those rows are
    * also a label-noise audit). Anchors missing either side keep null
    * columns rather than dropping — k (upstream, in the neighbor
    * frame) is the recall knob.
    *
    * Same decoupling as knnVote: any (qid, cid, cos, rk) frame works;
    * labels broadcast onto the neighbor stream; vectors never enter. */
  def tripletMine(neighbors: DataFrame, labels: DataFrame,
                  id: String, label: String): DataFrame = {
    val lab = labels.select(col(id), col(label))
    val nb = neighbors
      .join(lab.select(col(id).as("qid"), col(label).as("ql")), "qid")
      .join(lab.select(col(id).as("cid"), col(label).as("cl")), "cid")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
    def first(side: DataFrame, idName: String, cosName: String) =
      side.withColumn("pk", row_number().over(w)).filter(col("pk") === 1)
        .select(col("qid").as(id), col("cid").as(idName), col("cos").as(cosName))
    lab
      .join(first(nb.filter(col("ql") === col("cl")), "pos_id", "pos_cos"), Seq(id), "left")
      .join(first(nb.filter(col("ql") =!= col("cl")), "neg_id", "neg_cos"), Seq(id), "left")
      .select(col(id), col(label), col("pos_id"), col("pos_cos"),
        col("neg_id"), col("neg_cos"),
        round(col("pos_cos") - col("neg_cos"), 6).as("margin"))
  }

  /** Leave-one-out evaluation: predict every labeled row from its own
    * neighbors and compare — the held-out accuracy check run before
    * trusting the propagated labels on the unlabeled corpus.
    * Returns every row of `labels`: (id, label, pred, votes, correct
    * 0/1, with pred null => correct 0). */
  def knnSelfEval(neighbors: DataFrame, labels: DataFrame,
                  id: String, label: String, k: Int): DataFrame = {
    val pred = knnVote(neighbors, labels, id, label, k)
    labels.select(col(id), col(label))
      .join(pred, Seq(id), "left")
      .select(col(id), col(label), col("pred"), col("votes"),
        coalesce((col(label) === col("pred")).cast("int"), lit(0)).as("correct"))
  }
}
