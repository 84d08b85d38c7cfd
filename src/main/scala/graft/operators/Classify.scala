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

  /** Trainable quality classifier: logistic regression fit with
    * FIXED-iteration batch gradient descent — the FineWeb-Edu-style
    * "train a small classifier on heuristic features, score the
    * corpus" step, without reaching outside the engine. Determinism
    * discipline is `Similarity.kmeansIters`'s: per-row gradient
    * contributions round to 9 d.p. and sum as exact DECIMAL, so the
    * learned weights are bit-identical under any partitioning/layout
    * and a SQL oracle can replay training iteration by iteration.
    * Driver holds only the weight vector (|features|+1 doubles);
    * each iteration is ONE aggregation job over the corpus.
    *
    * Returns weights (features, then bias). `lr` is the plain GD step
    * scaled by 1/n. Features should be bounded (ratios, log-lengths) —
    * no internal standardization is applied. */
  def trainLogReg(df: DataFrame, features: Seq[String], label: String,
                  iters: Int, lr: Double): Array[Double] = {
    require(features.nonEmpty && iters >= 1)
    var w = Array.fill(features.size + 1)(0.0)
    val y = col(label).cast("double")
    // the row count rides the first gradient aggregation (a count
    // column costs nothing there) — a separate count() would be a
    // whole extra corpus scan before training even starts
    var n = 0.0
    for (it <- 0 until iters) {
      val z = features.zipWithIndex
        .map { case (f, j) => col(f).cast("double") * lit(w(j)) }
        .reduce(_ + _) + lit(w(features.size))
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val gradCols = features.map(f =>
        sum(round((p - y) * col(f).cast("double"), 9).cast("decimal(28,9)"))) ++
        Seq(sum(round(p - y, 9).cast("decimal(28,9)"))) ++
        // the count is only read once — later iterations aggregate
        // just the gradient columns
        (if (it == 0) Seq(count(lit(1))) else Nil)
      val row = df.agg(gradCols.head, gradCols.tail: _*).head()
      if (it == 0) {
        n = row.getLong(features.size + 1).toDouble
        require(n > 0, "empty training frame")
      }
      w = w.indices.map { j =>
        val g = if (row.isNullAt(j)) 0.0
          else row.getDecimal(j).doubleValue()
        w(j) - lr * g / n
      }.toArray
    }
    w
  }

  /** Decision column for `trainLogReg` weights: P(label) >= 0.5, i.e.
    * the linear score is non-negative. */
  def predictLogReg(features: Seq[String], w: Array[Double]): org.apache.spark.sql.Column = {
    val z = features.zipWithIndex
      .map { case (f, j) => col(f).cast("double") * lit(w(j)) }
      .reduce(_ + _) + lit(w(features.size))
    z >= 0.0
  }
}
