package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding columns — the 4× storage /
  * shuffle-bytes lever for vector corpora (float32 → int8 ahead of ANN
  * or archival; at 100 TB the embedding column IS the shuffle cost of
  * every similarity pass, so this is a first-class curation op).
  *
  * Symmetric per-vector scheme: scale = max|x| / 127, q = round(x /
  * scale) clamped to [-127, 127] (the clamp is belt-and-braces: by
  * construction |x/scale| <= 127 up to one ulp). Zero vectors quantize
  * to all-zero with scale 0 — no NaN poisoning.
  *
  * Engine determinism: max|x| is an exact float→double max (order-free),
  * scale one IEEE division, each q element one division + one
  * HALF_UP/away-from-zero round — Spark's BigDecimal HALF_UP and
  * DuckDB's round() agree away from zero, so quantized values are
  * bit-identical cross-engine. All map-side column ops: zero shuffle.
  */
object Quantize {

  def maxAbs(vec: Column): Column =
    array_max(transform(vec, e => abs(e.cast("double"))))

  /** Per-vector quantization scale (0.0 for the zero vector). */
  def scaleOf(vec: Column): Column = maxAbs(vec) / lit(127.0)

  /** int8 codes (as array<int> — parquet/arrow byte-pack downstream). */
  def int8(vec: Column, scale: Column): Column =
    when(scale === 0.0, transform(vec, _ => lit(0)))
      .otherwise(transform(vec, e =>
        least(lit(127), greatest(lit(-127),
          round(e.cast("double") / scale, 0).cast("int")))))

  /** Reconstruction: q * scale as array<double>. */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, e => e.cast("double") * scale)

  /** Per-vector quality report: (id, scale, q_sum, max_abs_err,
    * cos_deq). q_sum is an exact integer checksum of the codes;
    * max_abs_err is an order-free max of IEEE-deterministic per-element
    * errors (no summation-order hazard); cos_deq is the cosine between
    * the original and its reconstruction, 6-d.p.-rounded like every
    * cosine in this library. */
  def stats(df: DataFrame, id: String, vec: String): DataFrame = {
    val x = col(vec)
    val out = df
      .withColumn("scale", scaleOf(x))
      .withColumn("q", int8(x, col("scale")))
    val err = zip_with(x, col("q"), (e, qq) =>
      abs(e.cast("double") - qq.cast("double") * col("scale")))
    val dotXQ = aggregate(
      zip_with(x, col("q"), (e, qq) => e.cast("double") * (qq.cast("double") * col("scale"))),
      lit(0.0), (acc, v) => acc + v)
    val n2x = aggregate(x, lit(0.0), (acc, e) => acc + e.cast("double") * e.cast("double"))
    val n2q = aggregate(col("q"), lit(0.0),
      (acc, qq) => acc + (qq.cast("double") * col("scale")) * (qq.cast("double") * col("scale")))
    out.select(col(id),
      col("scale"),
      aggregate(col("q"), lit(0L), (acc, qq) => acc + qq.cast("long")).as("q_sum"),
      array_max(err).as("max_abs_err"),
      when(n2x === 0.0 || n2q === 0.0, lit(0.0))
        .otherwise(round(dotXQ / (sqrt(n2x) * sqrt(n2q)), 6)).as("cos_deq"))
  }

  // ---------------------------------------------------------------------
  // Product quantization (PQ): split dim into m subspaces, code each
  // subvector against a per-subspace codebook of k centroids, and search
  // with asymmetric distance (ADC) over a k×m lookup table — the
  // IVF-PQ memory layout every billion-vector ANN deployment runs
  // (codes are m bytes/vector instead of dim×4). Codebooks here are
  // prefix-initialized (first k vectors by id, the same deterministic
  // discipline as l18's coarse quantizer); `Similarity.kmeansIters`
  // composes per subspace when trained codebooks are wanted — assignment
  // and ADC are identical either way.
  // ---------------------------------------------------------------------

  /** Squared L2 distance between two float vectors, 6-d.p. rounded —
    * left-to-right fold, matching DuckDB's list_sum order exactly.
    * Shared with AnnIndex.driftAudit (the residual is the same metric
    * the encoder minimizes). */
  private[operators] def sqDist(a: Column, b: Column): Column =
    round(aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, z) => acc + z), 6)

  /** Per-subspace prefix codebooks: (sub, cid, cvec) — m×k rows, always
    * broadcast-sized (m·k·(dim/m) floats ≪ executor memory). */
  def pqCodebooks(emb: DataFrame, id: String, vec: String,
                  dim: Int, m: Int, k: Int): DataFrame = {
    require(dim % m == 0, s"dim $dim must split into $m equal subspaces")
    val d = dim / m
    val base = emb.orderBy(col(id)).limit(k)
      .select(col(id), col(vec))
      .withColumn("cid", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col(id))) - 1)
    base.select(col("cid").cast("long").as("cid"), col(vec),
        posexplode(sequence(lit(0), lit(m - 1))).as(Seq("_p", "sub")))
      .select(col("sub").cast("long").as("sub"), col("cid"),
        expr(s"slice($vec, sub * $d + 1, $d)").as("cvec"))
  }

  /** PQ codes per vector: (id, sub, code) — the argmin centroid per
    * subspace (squared-L2, ties on lower cid). The codebook join is a
    * broadcast; everything else is a codegen'd projection + one
    * groupBy(id, sub) whose input is |vectors|·m·k scored rows. */
  def pqEncode(emb: DataFrame, codebooks: DataFrame, id: String, vec: String,
               dim: Int, m: Int): DataFrame = {
    val d = dim / m
    val sliced = emb.select(col(id), col(vec),
        posexplode(sequence(lit(0), lit(m - 1))).as(Seq("_p", "sub")))
      .select(col(id), col("sub").cast("long").as("sub"),
        expr(s"slice($vec, sub * $d + 1, $d)").as("svec"))
    sliced.join(broadcast(codebooks), Seq("sub"))
      .select(col(id), col("sub"),
        struct(sqDist(col("svec"), col("cvec")).as("dist"), col("cid")).as("sc"))
      .groupBy(col(id), col("sub"))
      .agg(min(col("sc")).as("best"))
      .select(col(id), col("sub"), col("best.cid").as("code"))
  }

  /** ADC top-k: distances from ONE probe vector to every coded vector
    * — a thin wrapper over the batch form (one-row probe frame,
    * self-matches KEPT: a single known probe ranking itself first is
    * useful signal, and the l54 contract grades it). Returns
    * (id, adc_dist) for the nearest `topK` (ties on id). */
  def pqAdcTopK(codes: DataFrame, codebooks: DataFrame, probe: DataFrame,
                id: String, vec: String, dim: Int, m: Int, topK: Int): DataFrame =
    pqAdcTopKAll(codes, codebooks, probe, id, vec, dim, m, topK,
      excludeSelf = false)
      .select(col(id), col("adc_dist"))
      .orderBy(col("adc_dist"), col(id))

  /** Batch-probe ADC: top-k per probe for a whole FRAME of query
    * vectors — the serving shape (requests arrive in batches, not one
    * at a time). The lookup table becomes (qid, sub, code) → dsub,
    * |probes|·m·k rows; it broadcasts while the probe batch stays
    * bounded (serve in chunks otherwise), so each corpus code row still
    * costs m lookups regardless of probe count. This is the ONE copy of
    * the determinism-critical ADC arithmetic: per-sub distances become
    * exact integer micros BEFORE the m-term sum (adding rounded doubles
    * in partial-agg order is not associative, integer addition is), so
    * the sum is order-free and the oracles mirror it exactly. Returns
    * (qid, id, adc_dist, rk), ties on id; `excludeSelf` drops qid = id
    * rows (corpus-resident probes searching for OTHER neighbors). */
  def pqAdcTopKAll(codes: DataFrame, codebooks: DataFrame, probes: DataFrame,
                   id: String, vec: String, dim: Int, m: Int, topK: Int,
                   excludeSelf: Boolean = true,
                   candidates: Option[DataFrame] = None): DataFrame = {
    val d = dim / m
    val probeSub = probes.select(col(id).as("qid"), col(vec),
        posexplode(sequence(lit(0), lit(m - 1))).as(Seq("_p", "sub")))
      .select(col("qid"), col("sub").cast("long").as("sub"),
        expr(s"slice($vec, sub * $d + 1, $d)").as("qvec"))
    val dtab = codebooks.join(broadcast(probeSub), Seq("sub"))
      .select(col("qid"), col("sub"), col("cid").as("code"),
        sqDist(col("qvec"), col("cvec")).as("dsub"))
    // IVF-batch restriction: only (probe, vector) pairs whose vector
    // sits in one of THAT probe's routed lists are scored. The
    // candidate join runs FIRST — codes ⋈ cand on the vector id emits
    // |cand|·m rows (nProbe/nCentroids of the corpus per probe), and
    // only those meet the lookup table; restricting after a full
    // codes ⋈ dtab join would do whole-corpus ADC work per probe.
    val joined = candidates match {
      case Some(c) =>
        codes.join(c.select(col("qid"), col(id)), Seq(id))
          .join(broadcast(dtab), Seq("qid", "sub", "code"))
      case None => codes.join(broadcast(dtab), Seq("sub", "code"))
    }
    val adc = (if (excludeSelf) joined.filter(col(id) =!= col("qid")) else joined)
      .select(col("qid"), col(id),
        round(col("dsub") * 1000000).cast("long").as("du"))
      .groupBy(col("qid"), col(id))
      .agg((sum(col("du")).cast("double") / 1000000).as("adc_dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc_dist"), col(id))
    adc.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topK)
  }
}
