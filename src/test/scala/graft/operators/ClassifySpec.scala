package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trainLogReg learns a separable boundary and predicts it back") {
    // y = 1 iff x1 > 0.5, comfortably separated
    val data = ((1 to 40).map(i => (0.8 + (i % 5) * 0.04, 0.3, 1.0)) ++
      (1 to 40).map(i => (0.1 + (i % 5) * 0.04, 0.3, 0.0))).toDF("x1", "x2", "y")
    val w = Classify.trainLogReg(data, Seq("x1", "x2"), "y", iters = 200, lr = 2.0)
    val acc = data.select(
        (Classify.predictLogReg(Seq("x1", "x2"), w) === (col("y") === 1.0))
          .cast("int").as("c"))
      .agg(org.apache.spark.sql.functions.avg("c")).head.getDouble(0)
    assert(acc == 1.0, s"separable data must classify perfectly, got $acc (w=${w.toSeq})")
    assert(w(0) > 0, "weight on the separating feature must be positive")
  }

  test("trainLogReg weights are bit-identical under any partitioning (decimal gradient sums)") {
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(300)((rnd.nextDouble(), rnd.nextDouble(),
      if (rnd.nextBoolean()) 1.0 else 0.0)).toDF("x1", "x2", "y")
    val w1 = Classify.trainLogReg(data, Seq("x1", "x2"), "y", iters = 15, lr = 1.0)
    val w2 = Classify.trainLogReg(data.repartition(17), Seq("x1", "x2"), "y", iters = 15, lr = 1.0)
    val w3 = Classify.trainLogReg(data.coalesce(1), Seq("x1", "x2"), "y", iters = 15, lr = 1.0)
    assert(w1.toSeq == w2.toSeq && w1.toSeq == w3.toSeq,
      s"layout must not change learned weights: $w1 / $w2 / $w3")
  }

  // (qid, cid, cos, rk) — rk already best-first, as lshTopK emits
  private def nb(rows: (Long, Long, Double, Int)*) =
    rows.toSeq.toDF("qid", "cid", "cos", "rk")

  test("majority label wins; k caps the neighborhood") {
    val neighbors = nb(
      (1L, 10L, 0.9, 1), (1L, 11L, 0.8, 2), (1L, 12L, 0.7, 3),
      (1L, 13L, 0.6, 4)) // rk=4 must be ignored at k=3
    val labels = Seq((10L, 7), (11L, 7), (12L, 3), (13L, 3)).toDF("vec_id", "label")
    val got = Classify.knnVote(neighbors, labels, "vec_id", "label", k = 3)
      .as[(Long, Int, Long)].collect()
    assert(got.toSeq == Seq((1L, 7, 2L)))
  }

  test("vote ties break on the smaller label") {
    val neighbors = nb((1L, 10L, 0.9, 1), (1L, 11L, 0.8, 2))
    val labels = Seq((10L, 5), (11L, 2)).toDF("vec_id", "label")
    val got = Classify.knnVote(neighbors, labels, "vec_id", "label", k = 2)
      .as[(Long, Int, Long)].collect()
    assert(got.toSeq == Seq((1L, 2, 1L)))
  }

  test("self-eval marks correctness and keeps neighbor-less rows with null pred") {
    val neighbors = nb((1L, 2L, 0.9, 1), (2L, 1L, 0.9, 1))
    val labels = Seq((1L, 0), (2L, 0), (3L, 1)).toDF("vec_id", "label")
    val got = Classify.knnSelfEval(neighbors, labels, "vec_id", "label", k = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), Option(r.get(2)), r.getInt(4)))).toMap
    assert(got(1L) == ((0, Some(0), 1)))
    assert(got(2L) == ((0, Some(0), 1)))
    assert(got(3L) == ((1, None, 0)))
  }

  test("triplet mining picks nearest same-label positive and hardest impostor") {
    val neighbors = nb(
      (1L, 10L, 0.9, 1), // impostor, hardest
      (1L, 11L, 0.8, 2), // positive
      (1L, 12L, 0.7, 3), // second positive — must lose to 11
      (1L, 13L, 0.6, 4)) // second impostor — must lose to 10
    val labels = Seq((1L, 0), (10L, 1), (11L, 0), (12L, 0), (13L, 2), (99L, 5))
      .toDF("vec_id", "label")
    val got = Classify.tripletMine(neighbors, labels, "vec_id", "label")
      .collect().map(r => r.getLong(0) -> r).toMap
    val a = got(1L)
    assert(a.getLong(2) == 11L && a.getDouble(3) == 0.8)
    assert(a.getLong(4) == 10L && a.getDouble(5) == 0.9)
    assert(math.abs(a.getDouble(6) - (-0.1)) < 1e-9) // negative margin = noisy anchor
    // isolated anchor keeps a row with null sides
    assert(got(99L).isNullAt(2) && got(99L).isNullAt(4) && got(99L).isNullAt(6))
  }

  test("unlabeled neighbors are invisible to the vote") {
    val neighbors = nb((1L, 10L, 0.9, 1), (1L, 11L, 0.8, 2))
    val labels = Seq((10L, 4)).toDF("vec_id", "label") // 11 unlabeled
    val got = Classify.knnVote(neighbors, labels, "vec_id", "label", k = 2)
      .as[(Long, Int, Long)].collect()
    assert(got.toSeq == Seq((1L, 4, 1L)))
  }
}
