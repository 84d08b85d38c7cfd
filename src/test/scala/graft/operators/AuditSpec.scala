package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("splitLeakage classifies pairs by unordered split endpoints and flags cross-split rows") {
    val pairs = Seq((1L, 2L), (1L, 3L), (4L, 5L), (2L, 3L)).toDF("da", "db")
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "train"),
      (4L, "val"), (5L, "val")).toDF("doc_id", "split")
    val out = Audit.splitLeakage(pairs, splits, "doc_id")
      .orderBy("split_lo", "split_hi")
      .as[(String, String, Long, Boolean)].collect().toSeq
    // (1,2)=train/test leak, (1,3)=train/train, (4,5)=val/val, (2,3)=test/train leak
    assert(out == Seq(
      ("test", "train", 2L, true),
      ("train", "train", 1L, false),
      ("val", "val", 1L, false)))
  }

  test("corpusCard aggregates per-source counts, sizes, short docs, exact dupes, language") {
    val docs = Seq(
      (1L, "web", "the a and of is something rather longer than the floor limit yes truly"),
      (2L, "web", "the a and of is something rather longer than the floor limit yes truly"),
      (3L, "web", "tiny"),
      (4L, "books", "der die das und ist ein buch text hier")).toDF("doc_id", "source", "text")
    val out = Audit.corpusCard(docs, "doc_id", "text", "source",
        graft.functions.TextFunctions.langId(col("text")), shortTokenFloor = 5)
      .orderBy("source")
      .as[(String, Long, Long, Double, Long, Long, Long, Long)].collect().toSeq
    val Seq(books, web) = out
    assert(books._1 == "books" && books._2 == 1L && books._5 == 0L &&
      books._6 == 0L && books._7 == 0L) // german, not short, no dupes
    assert(books._8 == 4L)    // sample pointer = min doc id of the source
    assert(web._1 == "web" && web._2 == 3L)
    assert(web._5 == 1L)      // "tiny" is short
    assert(web._6 == 1L)      // docs 1 and 2 are byte-identical → one dupe
    assert(web._7 == 2L)      // two english docs ("tiny" has no stopwords)
    assert(web._8 == 1L)
    assert(math.abs(web._4 - (14 + 14 + 1) / 3.0) < 1e-9) // avg tokens
  }

  test("groupQuartiles: exact rank-position quantiles, singleton and tied groups") {
    val docs = Seq(
      // group a: values 10,20,30,40 → positions ceil(1,2,3) = 10,20,30
      (1L, "a", 40L), (2L, "a", 10L), (3L, "a", 30L), (4L, "a", 20L),
      // group b: a single row — all three quartiles are that value
      (5L, "b", 7L),
      // group c: all ties — quartiles equal the tied value regardless of id order
      (6L, "c", 5L), (7L, "c", 5L), (8L, "c", 5L)
    ).toDF("doc_id", "g", "v")
    val out = Audit.groupQuartiles(docs, "g", "doc_id", col("v"))
      .orderBy("g")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("a", 4L, 10L, 20L, 30L),
      ("b", 1L, 7L, 7L, 7L),
      ("c", 3L, 5L, 5L, 5L)))
  }

  test("groupQuartiles (groupRank-based) equals the window formulation at any layout") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def windowed(df: org.apache.spark.sql.DataFrame) = {
      val v = df.select(col("source").as("g"), col("doc_id"), col("n_chars").cast("long").as("v"))
      val w = Window.partitionBy(col("g")).orderBy(col("v"), col("doc_id"))
      v.withColumn("rk", row_number().over(w))
        .withColumn("n_docs", count(lit(1)).over(Window.partitionBy(col("g"))))
        .groupBy(col("g"), col("n_docs"))
        .agg(
          max(when(col("rk") === ceil(col("n_docs") * 0.25), col("v"))).as("p25"),
          max(when(col("rk") === ceil(col("n_docs") * 0.5), col("v"))).as("p50"),
          max(when(col("rk") === ceil(col("n_docs") * 0.75), col("v"))).as("p75"))
        .orderBy("g")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    }
    val want = windowed(docs)
    for (p <- Seq(1, 7, 32)) {
      val got = Audit.groupQuartiles(docs.repartition(p), "source", "doc_id", col("n_chars"))
        .orderBy("source")
        .as[(String, Long, Long, Long, Long)].collect().toSeq
      assert(got == want, s"quartiles drifted at $p partitions")
    }
  }

  test("snapshotDiff classifies added/removed/changed and is silent on unchanged ids") {
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val cur = Seq((1L, "alpha"), (2L, "beta v2"), (4L, "delta"), (5L, "epsilon"))
      .toDF("doc_id", "text")
    val out = Audit.snapshotDiff(prev, cur, "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    // 1 and 4 unchanged (no row), 2 revised, 3 dropped, 5 new
    assert(out == Seq((2L, "changed"), (3L, "removed"), (5L, "added")))
  }

  test("snapshotDiff is null-safe on the payload and loud on reserved columns") {
    // null payloads fingerprint like any value: null -> null is
    // unchanged, null -> value (and back) is changed
    val prev = Seq((1L, null: String), (2L, null: String), (3L, "x"))
      .toDF("doc_id", "text")
    val cur = Seq((1L, null: String), (2L, "now set"), (3L, null: String))
      .toDF("doc_id", "text")
    val out = Audit.snapshotDiff(prev, cur, "doc_id", col("text"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(out == Seq((2L, "changed"), (3L, "changed")))

    val clash = Seq((1L, "a", "scratch")).toDF("doc_id", "text", "_fpa")
    val e = intercept[IllegalArgumentException](
      Audit.snapshotDiff(clash, clash, "doc_id", col("text")))
    assert(e.getMessage.contains("_fpa"))
  }

  test("snapshotDiff enforces the id-is-a-key contract on BOTH snapshots") {
    // a duplicated id would fan out across the full-outer join into
    // duplicated, contradictory verdicts — the diff must refuse loudly
    val clean = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val duped = Seq((1L, "a"), (1L, "a'"), (2L, "b")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException](
      Audit.snapshotDiff(duped, clean, "doc_id", col("text")).collect())
    assert(e1.getMessage.contains("prev") && e1.getMessage.contains("not a key"))
    val e2 = intercept[IllegalArgumentException](
      Audit.snapshotDiff(clean, duped, "doc_id", col("text")).collect())
    assert(e2.getMessage.contains("cur"))
  }

  test("incrementalRefresh equals a full recompute and touches only the delta") {
    val prev = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val cur = Seq((1L, "alpha"), (2L, "beta v2"), (4L, "delta"), (5L, "epsilon"))
      .toDF("doc_id", "text")
    def derive(c: org.apache.spark.sql.DataFrame) =
      c.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val state = derive(prev)
    val diff = Audit.snapshotDiff(prev, cur, "doc_id", col("text"))
    var touched: Seq[Long] = Nil
    val out = Audit.incrementalRefresh(state, cur, diff, "doc_id", todo => {
      touched = todo.select("doc_id").as[Long].collect().toSeq.sorted
      derive(todo)
    }).orderBy("doc_id").as[(Long, Long)].collect().toSeq
    // identical to deriving over the whole new snapshot...
    assert(out == derive(cur).orderBy("doc_id").as[(Long, Long)].collect().toSeq)
    // ...with the expensive leg fed exactly the added+changed docs
    assert(touched == Seq(2L, 5L))
  }

  test("snapshotDiff matches the brute-force model on generated snapshot pairs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val payloads = Vector("p0", "p1", "p2", "p3")
    def snapshot(seed: Long): Map[Long, String] = {
      val g = Gen.mapOf(Gen.zip(Gen.choose(0L, 30L), Gen.oneOf(payloads)))
      g(Gen.Parameters.default.withSize(40), Seed(seed)).get
    }
    for (s <- 1L to 5L) {
      val a = snapshot(s); val b = snapshot(s + 100)
      val model = (a.keySet ++ b.keySet).flatMap { k =>
        (a.get(k), b.get(k)) match {
          case (Some(_), None) => Some(k -> "removed")
          case (None, Some(_)) => Some(k -> "added")
          case (Some(x), Some(y)) if x != y => Some(k -> "changed")
          case _ => None
        }
      }.toMap
      val got = Audit.snapshotDiff(
          a.toSeq.toDF("doc_id", "text"), b.toSeq.toDF("doc_id", "text"),
          "doc_id", col("text"))
        .as[(Long, String)].collect().toMap
      assert(got == model, s"seed $s: got $got want $model")
    }
  }

  test("snapshotDiff shuffles pointer frames, not payloads") {
    // the full-outer join's inputs must project to (id, fingerprint)
    // BEFORE the exchange — the payload column may not ride the shuffle
    val prev = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    val cur = Seq((2L, "beta v2"), (3L, "new")).toDF("doc_id", "text")
    val df = Audit.snapshotDiff(prev, cur, "doc_id", col("text"))
    df.collect() // finalize the adaptive plan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    val found = scala.collection.mutable.ArrayBuffer[ShuffleExchangeLike]()
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.finalPhysicalPlan)
      case s: QueryStageExec => walk(s.plan)
      case e: ShuffleExchangeLike => found += e; e.children.foreach(walk)
      case r: ReusedExchangeExec => walk(r.child)
      case _ => p.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(found.nonEmpty, "expected a shuffle for the full-outer join")
    found.foreach { e =>
      val names = e.output.map(_.name).toSet
      assert(!names.contains("text"),
        s"payload column crossed the shuffle: ${names.mkString(", ")}")
    }
  }
}
