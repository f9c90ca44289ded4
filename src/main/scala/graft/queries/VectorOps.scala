package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Vectors

/** Similarity search over the `embeddings` table (SURVEY.md §2.3):
  * brute-force cosine top-k as the correctness baseline, and the
  * LSH-bucketed variants as the scale path.
  *
  * Scale posture: the brute-force form broadcasts the (small) query set
  * against the corpus — a map-side nested loop, no corpus shuffle — and
  * the window top-k partitions by query id. The bucketed forms replace the
  * all-pairs O(n^2) with a groupBy/join on the sign-LSH bucket key, i.e.
  * one shuffle with expected group size n / 2^bits.
  *
  * Oracle parity: dot products are strict left-to-right double folds in
  * both engines (Vectors.dot ~ list_aggregate(...,'sum')), so cosines are
  * bit-identical and safe to sort/compare on.
  */
object VectorOps {

  type Q = (SparkSession, String) => DataFrame
  private def emb(s: SparkSession, dir: String) = {
    graft.functions.VecDot.ensureRegistered(s) // no-op on GraftSession-built sessions
    Tables.load(s, dir, "embeddings")
  }

  /** DuckDB-side double dot product identical to Vectors.dot. */
  private def dDot(a: String, b: String): String =
    s"list_aggregate(list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), 'sum')"
  private def dCos(a: String, b: String): String =
    s"${dDot(a, b)} / (sqrt(${dDot(a, a)}) * sqrt(${dDot(b, b)}))"
  /** DuckDB-side sign-LSH bucket identical to Vectors.signBucket(_, 8). */
  private val dBucket =
    "array_to_string(list_transform(list_slice(embedding, 1, 8), " +
      "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"

  // -- q30: brute-force cosine top-5 per query (vec_id < 10 as queries) --
  private val q30: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    val q = e.filter($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
    broadcast(q).join(e, $"q_id" =!= $"vec_id")
      .select($"q_id", $"vec_id",
        Vectors.cosine($"q_emb", $"embedding").as("cos"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 5)
      .select($"q_id", $"vec_id", round($"cos", 6).as("cos"), $"rn")
  }
  private val q30Sql =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
       |           FROM embeddings WHERE vec_id < 10),
       |p AS (SELECT q_id, vec_id, ${dCos("q_emb", "embedding")} AS cos
       |      FROM q JOIN embeddings ON q_id <> vec_id)
       |SELECT q_id, vec_id, round(cos, 6) AS cos, rn FROM (
       |  SELECT q_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
       |  FROM p) WHERE rn <= 5""".stripMargin

  // -- q211: MMR-diversified re-rank (Mmr.rerank) — q30's cosine top-10
  // candidate pools greedily re-ranked for diversity at λ=0.5 (chosen
  // because 1−λ is exact in binary, so Spark's lit(0.5)·score −
  // lit(0.5)·maxsim and the oracle's 0.5*cos − 0.5*maxsim are the SAME
  // doubles — cosines are already bit-identical per q30, products by a
  // power of two stay exact, and selection order therefore agrees
  // bit-for-bit). Oracle: the five greedy steps unrolled as CTE pairs
  // (the q120/q92 iteration-unroll precedent) — s_i = per-query window
  // argmax of the objective, r_{i+1} = survivors with the new
  // selection's cosine folded into a running greatest(). --
  private val q211: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id".asc)
    val cands = broadcast(q).join(e, $"q_id" =!= $"vec_id")
      .select($"q_id", $"vec_id",
        Vectors.cosine($"q_emb", $"embedding").as("cos"), $"embedding")
      .withColumn("__rn", row_number().over(w))
      .filter($"__rn" <= 10).drop("__rn")
    graft.operators.Mmr.rerank(cands, "q_id", "vec_id", "cos", "embedding",
        k = 5, lambda = 0.5)
      .select($"q_id", $"vec_id", round($"cos", 6).as("cos"),
        round($"mmr_score", 6).as("mmr_score"), $"mmr_rank")
  }
  private val q211Sql = {
    def sel(i: Int, from: String) =
      s"""s$i AS (SELECT q_id, vec_id, cos, emb, mmr FROM (
         |  SELECT *, 0.5*cos - 0.5*maxsim AS mmr,
         |    row_number() OVER (PARTITION BY q_id
         |      ORDER BY 0.5*cos - 0.5*maxsim DESC, vec_id) AS rn
         |  FROM $from) WHERE rn = 1)""".stripMargin
    def rem(i: Int, prevR: String, prevS: String) =
      s"""r$i AS (SELECT r.q_id, r.vec_id, r.cos, r.emb,
         |  greatest(r.maxsim, ${dCos("r.emb", "s.emb")}) AS maxsim
         |  FROM $prevR r JOIN $prevS s
         |    ON r.q_id = s.q_id AND r.vec_id <> s.vec_id)""".stripMargin
    val steps = (1 to 5).map { i =>
      (if (i == 1) "" else rem(i, s"r${i - 1}", s"s${i - 1}") + ",\n") +
        sel(i, s"r$i")
    }.mkString(",\n")
    val out = (1 to 5).map(i =>
      s"SELECT q_id, vec_id, round(cos, 6) AS cos, " +
        s"round(mmr, 6) AS mmr_score, $i AS mmr_rank FROM s$i")
      .mkString("\nUNION ALL ")
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
       |           FROM embeddings WHERE vec_id < 5),
       |p AS (SELECT q_id, vec_id, ${dCos("q_emb", "embedding")} AS cos,
       |        embedding AS emb
       |      FROM q JOIN embeddings ON q_id <> vec_id),
       |c AS (SELECT q_id, vec_id, cos, emb FROM (
       |  SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cos DESC, vec_id) AS rn FROM p) WHERE rn <= 10),
       |r1 AS (SELECT q_id, vec_id, cos, emb, 0.0 AS maxsim FROM c),
       |$steps
       |$out""".stripMargin
  }

  // -- q31: sign-LSH bucket histogram (the ANN pre-partitioner) --
  private val q31: Q = (s, dir) => {
    import s.implicits._
    emb(s, dir)
      .select(Vectors.signBucket($"embedding", 8).as("bucket"), $"vec_id", $"label")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        count_distinct($"label").as("n_labels"),
        min($"vec_id").as("min_vec"))
  }
  private val q31Sql =
    s"""SELECT $dBucket AS bucket, count(*) AS n,
       |  count(DISTINCT label) AS n_labels, min(vec_id) AS min_vec
       |FROM embeddings GROUP BY 1""".stripMargin

  // -- q32: embedding near-dup pairs within an LSH bucket (scale path) --
  private val q32: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
      .select($"vec_id", $"embedding", Vectors.signBucket($"embedding", 8).as("bucket"))
    val a = e.toDF("vec_a", "emb_a", "bucket")
    val b = e.toDF("vec_b", "emb_b", "bucket")
    a.join(b, Seq("bucket"))
      .filter($"vec_a" < $"vec_b")
      .select($"vec_a", $"vec_b",
        Vectors.cosine($"emb_a", $"emb_b").as("cos"))
      .filter($"cos" >= 0.3)
      .select($"vec_a", $"vec_b", round($"cos", 6).as("cos"))
  }
  private val q32Sql =
    s"""WITH e AS (SELECT vec_id, embedding, $dBucket AS bucket FROM embeddings)
       |SELECT vec_a, vec_b, round(cos, 6) AS cos FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${dCos("a.embedding", "b.embedding")} AS cos
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |WHERE cos >= 0.3""".stripMargin

  // -- q33: IVF-style coarse quantizer — nearest-centroid assignment --
  // The IVF scale path for ANN: a small centroid set broadcasts to every
  // executor (map-side nested loop, no corpus shuffle), each vector gets
  // its inverted-list id, and subsequent searches probe only matching
  // lists. Centroids here are a deterministic sample (vec_id < 16) so the
  // DuckDB oracle reproduces the assignment exactly; at scale they'd come
  // from k-means, which only changes how the centroid frame is built.
  private val q33: Q = (s, dir) => {
    import s.implicits._
    val c = emb(s, dir).filter($"vec_id" < 16)
      .select($"vec_id".as("c_id"), $"embedding".as("c_emb"))
    val w = Window.partitionBy($"vec_id").orderBy($"cos".desc, $"c_id".asc)
    emb(s, dir).join(broadcast(c))
      .select($"vec_id", $"c_id", Vectors.cosine($"embedding", $"c_emb").as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"vec_id", $"c_id".as("centroid"), round($"cos", 6).as("cos"))
  }
  private val q33Sql =
    s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb
       |           FROM embeddings WHERE vec_id < 16),
       |p AS (SELECT vec_id, c_id, ${dCos("embedding", "c_emb")} AS cos
       |      FROM embeddings CROSS JOIN c)
       |SELECT vec_id, c_id AS centroid, round(cos, 6) AS cos FROM (
       |  SELECT vec_id, c_id, cos,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
       |  FROM p) WHERE rn = 1""".stripMargin

  // -- q34b/q56: embedding preprocessing — L2 normalize + int8 quantize --
  // The standard storage shrink for ANN corpora (float32 -> int8 is 4x).
  // Truncation (not round) for the quantized values: DuckDB's
  // double->int CAST rounds while Spark's truncates, so both sides use
  // explicit trunc semantics. max-abs scaling per vector. The quantized
  // vector is emitted as a ','-joined string — the driver's oracle compare
  // row-sorts in pandas, which cannot hash bare array columns.
  private val q56: Q = (s, dir) => {
    import s.implicits._
    val maxAbs = array_max(transform($"embedding", x => abs(x.cast("double"))))
    emb(s, dir)
      .select($"vec_id", $"embedding", maxAbs.as("m"))
      .select($"vec_id",
        round($"m", 6).as("max_abs"),
        array_join(transform($"embedding", x =>
          (x.cast("double") * 127.0 / $"m").cast("int")), ",").as("q8"),
        round(Vectors.norm($"embedding"), 6).as("l2"))
  }
  private val q56Sql =
    s"""WITH m AS (
       |  SELECT vec_id, embedding,
       |    list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS m
       |  FROM embeddings)
       |SELECT vec_id, round(m, 6) AS max_abs,
       |  array_to_string(list_transform(embedding,
       |    x -> CAST(trunc(CAST(x AS DOUBLE) * 127.0 / m) AS INT)), ',') AS q8,
       |  round(sqrt(${dDot("embedding", "embedding")}), 6) AS l2
       |FROM m""".stripMargin

  // -- q59: IVF top-k ANN search — the end-to-end scale path q33 sets up.
  // Each query probes its 4 nearest of the 16 inverted lists, candidates
  // come from a broadcast join on the list id (corpus never shuffles; the
  // assignment itself is a map-side fold with zero exchanges), and the
  // exact top-5 within probed lists is the answer. Deterministic
  // centroids (vec_id < 16, as q33) make the whole algorithm — not just
  // its output shape — reproducible in the DuckDB oracle. --
  private val q59: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    graft.operators.Similarity.ivfTopK(
      corpus = e,
      centroids = e.filter($"vec_id" < 16)
        .select($"vec_id".as("c_id"), $"embedding"),
      queries = e.filter($"vec_id" < 10),
      idCol = "vec_id", embCol = "embedding", centroidIdCol = "c_id",
      k = 5, nProbe = 4)
      .select($"q_id", $"vec_id", round($"cos", 6).as("cos"))
  }
  private val q59Sql =
    s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb
       |           FROM embeddings WHERE vec_id < 16),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb
       |      FROM embeddings WHERE vec_id < 10),
       |assign AS (
       |  SELECT vec_id, embedding, c_id AS list FROM (
       |    SELECT e.vec_id, e.embedding, c.c_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dCos("e.embedding", "c.c_emb")} DESC, c.c_id) AS rn
       |    FROM embeddings e CROSS JOIN c) WHERE rn = 1),
       |probes AS (
       |  SELECT q_id, q_emb, c_id AS list FROM (
       |    SELECT q.q_id, q.q_emb, c.c_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${dCos("q.q_emb", "c.c_emb")} DESC, c.c_id) AS rn
       |    FROM q CROSS JOIN c) WHERE rn <= 4),
       |cand AS (
       |  SELECT p.q_id, a.vec_id, ${dCos("p.q_emb", "a.embedding")} AS cos
       |  FROM probes p JOIN assign a ON p.list = a.list AND p.q_id <> a.vec_id)
       |SELECT q_id, vec_id, round(cos, 6) AS cos FROM (
       |  SELECT q_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
       |  FROM cand) WHERE rn <= 5""".stripMargin

  // -- q63: cosine top-k via the k-bounded heap aggregate (graft_topk) —
  // the same answer as q30's window form, computed without sorting the
  // candidate set: partial aggregation trims to k map-side, so the
  // per-query shuffle carries ≤ k entries (PlanSpec pins a window-free,
  // single-shuffle plan). Oracle: the window SQL — two different
  // algorithms, one hash. --
  private val q63: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    graft.operators.Similarity.cosineTopK(
      corpus = e, queries = e.filter($"vec_id" < 10),
      idCol = "vec_id", embCol = "embedding", k = 3)
      .select($"q_id", $"vec_id", round($"cos", 6).as("cos"))
  }
  private val q63Sql =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
       |           FROM embeddings WHERE vec_id < 10),
       |p AS (SELECT q_id, vec_id, ${dCos("q_emb", "embedding")} AS cos
       |      FROM q JOIN embeddings ON q_id <> vec_id)
       |SELECT q_id, vec_id, round(cos, 6) AS cos FROM (
       |  SELECT q_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
       |  FROM p) WHERE rn <= 3""".stripMargin

  /** Shared PQ codebook frame: subspace s (0..3) of 16 dims, codes = the
    * first 8 vectors' slices — deterministic, so the oracle reproduces
    * the whole algorithm, exactly like q59's fixed IVF centroids. */
  private def pqCodebooks(s: SparkSession, dir: String) = {
    import s.implicits._
    val e = emb(s, dir).filter($"vec_id" < 8)
    (0 until 4).map { sub =>
      e.select(lit(sub).as("subspace"), $"vec_id".cast("int").as("code"),
        slice($"embedding", sub * 16 + 1, 16).as("vector"))
    }.reduce(_ unionByName _)
  }
  /** DuckDB: squared-L2 via the same ||a||²−2a·b+||b||² expansion of
    * sequential folds the Spark side uses — bit-identical distances. */
  private def dL2(a: String, b: String): String =
    s"${dDot(a, a)} - 2 * ${dDot(a, b)} + ${dDot(b, b)}"
  private val dCbSql =
    """cb AS (
      |  SELECT s.s AS subspace, vec_id AS code,
      |         list_slice(embedding, s.s * 16 + 1, s.s * 16 + 16) AS v
      |  FROM embeddings, (SELECT unnest([0, 1, 2, 3]) AS s) s
      |  WHERE vec_id < 8)""".stripMargin
  private val dSubSlice = "list_slice(%s, c.subspace * 16 + 1, c.subspace * 16 + 16)"

  // -- q73: product-quantization encode — per subspace, the nearest
  // codebook entry's code (squared-L2, ties to the smaller code). The
  // Spark plan is a zero-shuffle literal argmin fold per subspace; the
  // oracle recomputes every doc × subspace × code distance and takes the
  // window rank-1 — independent algorithm, one hash. --
  private val q73: Q = (s, dir) => {
    import s.implicits._
    graft.operators.Similarity.pqEncode(emb(s, dir), pqCodebooks(s, dir), "embedding")
      .select($"vec_id", posexplode($"pq_codes"))
      .select($"vec_id", $"pos".cast("long").as("subspace"),
        $"col".cast("long").as("code"))
  }
  private val q73Sql = {
    val a = dSubSlice.format("e.embedding")
    s"""WITH $dCbSql
       |SELECT vec_id, CAST(subspace AS BIGINT) AS subspace,
       |       CAST(code AS BIGINT) AS code FROM (
       |  SELECT e.vec_id, c.subspace, c.code,
       |    row_number() OVER (PARTITION BY e.vec_id, c.subspace
       |      ORDER BY ${dL2(a, "c.v")} ASC, c.code) AS rn
       |  FROM embeddings e CROSS JOIN cb c) WHERE rn = 1""".stripMargin
  }

  // -- q74: PQ ADC top-k — approximate nearest neighbors where each
  // (query, doc) pair costs m table lookups instead of a 64-dim dot:
  // the quantized half of an IVF-PQ index, composed with the k-bounded
  // heap aggregate. Oracle: re-derive codes (q73's logic), join the
  // codebook back, sum the same per-subspace distances, window top-5. --
  private val q74: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    graft.operators.Similarity.pqAdcTopK(
      corpus = e, codebooks = pqCodebooks(s, dir),
      queries = e.filter($"vec_id" < 10),
      idCol = "vec_id", embCol = "embedding", k = 5)
  }
  private val q74Sql = {
    val qa = dSubSlice.format("q.q_emb")
    s"""WITH $dCbSql,
       |codes AS (
       |  SELECT vec_id, subspace, code FROM (
       |    SELECT e.vec_id, c.subspace, c.code,
       |      row_number() OVER (PARTITION BY e.vec_id, c.subspace
       |        ORDER BY ${dL2(dSubSlice.format("e.embedding"), "c.v")} ASC, c.code) AS rn
       |    FROM embeddings e CROSS JOIN cb c) WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb
       |      FROM embeddings WHERE vec_id < 10),
       |parts AS (
       |  SELECT q.q_id, d.vec_id, d.subspace, ${dL2(qa, "c.v")} AS pd
       |  FROM q CROSS JOIN codes d
       |  JOIN cb c ON c.subspace = d.subspace AND c.code = d.code
       |  WHERE q.q_id <> d.vec_id),
       |-- ordered list sum, NOT sum(pd): a bare GROUP BY sum adds the four
       |-- doubles in a thread-dependent order, so its last-ulp bits (and
       |-- thus round(,6) at a boundary) vary run to run; the ordered fold
       |-- reproduces Spark's subspace-order aggregate exactly
       |adcs AS (SELECT q_id, vec_id,
       |           list_aggregate(list(pd ORDER BY subspace), 'sum') AS adc
       |         FROM parts GROUP BY 1, 2)
       |SELECT q_id, vec_id, round(adc, 6) AS adc FROM (
       |  SELECT q_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc ASC, vec_id) AS rn
       |  FROM adcs) WHERE rn <= 5""".stripMargin
  }

  // -- q92: trained PQ codebooks (Similarity.pqTrain) — closes the
  // IVF-PQ loop end-to-end: per-subspace deterministic k-means (first-k
  // init, cosine assignment, element-wise mean, empty clusters keep
  // their centroid), then the q73 encode against the TRAINED codebooks.
  // Oracle: the two Lloyd iterations unrolled as CTEs — assignment is
  // the q33 window form on sub-slices, the mean is per-position avg
  // re-packed in order, the final encode is q73's L2 window — a fully
  // independent reconstruction of training AND encoding. Output is the
  // assignment table (argmins are stable under the mean's last-ulp
  // summation-order noise; the codebook doubles themselves are not
  // cross-engine comparable, the assignments are). --
  private val q92: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    val cb = graft.operators.Similarity.pqTrain(e, "vec_id", "embedding",
      m = 4, k = 4, iterations = 2)
    graft.operators.Similarity.pqEncode(e, cb, "embedding")
      .select($"vec_id", posexplode($"pq_codes"))
      .select($"vec_id", $"pos".cast("long").as("subspace"),
        $"col".cast("long").as("code"))
  }
  private val q92Sql = {
    def iterCte(prev: String, n: Int): String =
      s"""a$n AS (
         |  SELECT subspace, vec_id, code FROM (
         |    SELECT sub.subspace, sub.vec_id, $prev.code,
         |      row_number() OVER (PARTITION BY sub.subspace, sub.vec_id
         |        ORDER BY ${dCos("sub.v", s"$prev.v")} DESC, $prev.code ASC) AS rn
         |    FROM sub JOIN $prev USING (subspace)) WHERE rn = 1),
         |m$n AS (
         |  SELECT a$n.subspace, a$n.code, i.i, avg(sub.v[i.i]) AS mv
         |  FROM a$n JOIN sub USING (subspace, vec_id),
         |       (SELECT unnest(range(1, 17)) AS i) i
         |  GROUP BY 1, 2, 3),
         |cr$n AS (SELECT subspace, code, list(mv ORDER BY i) AS v
         |         FROM m$n GROUP BY 1, 2),
         |c$n AS (SELECT $prev.subspace, $prev.code, COALESCE(cr$n.v, $prev.v) AS v
         |        FROM $prev LEFT JOIN cr$n USING (subspace, code))""".stripMargin
    s"""WITH sub AS (
       |  SELECT vec_id, s.s AS subspace,
       |         list_slice(embedding, s.s * 16 + 1, s.s * 16 + 16) AS v
       |  FROM embeddings, (SELECT unnest([0, 1, 2, 3]) AS s) s),
       |c0 AS (SELECT subspace, CAST(vec_id AS INT) AS code, v
       |       FROM sub WHERE vec_id < 4),
       |${iterCte("c0", 1)},
       |${iterCte("c1", 2)}
       |SELECT vec_id, CAST(subspace AS BIGINT) AS subspace,
       |       CAST(code AS BIGINT) AS code FROM (
       |  SELECT sub.vec_id, sub.subspace, c2.code,
       |    row_number() OVER (PARTITION BY sub.vec_id, sub.subspace
       |      ORDER BY ${dL2("sub.v", "c2.v")} ASC, c2.code) AS rn
       |  FROM sub JOIN c2 USING (subspace)) WHERE rn = 1""".stripMargin
  }

  // -- q93: full IVF-PQ search (Similarity.ivfPqTopK) — q59's coarse
  // probe composed with q74's ADC ranking: probe 4 of 16 lists, rank
  // only their members by quantized distance. Oracle: the q59 assign/
  // probe CTEs joined with the q74 codes/parts/adcs CTEs, restricted to
  // probed lists — both halves independently proven, composed the same
  // way the operator composes them. --
  private val q93: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    graft.operators.Similarity.ivfPqTopK(
      corpus = e,
      centroids = e.filter($"vec_id" < 16)
        .select($"vec_id".as("c_id"), $"embedding"),
      codebooks = pqCodebooks(s, dir),
      queries = e.filter($"vec_id" < 10),
      idCol = "vec_id", embCol = "embedding", centroidIdCol = "c_id",
      k = 5, nProbe = 4)
  }
  private val q93Sql = {
    val qa = dSubSlice.format("p.q_emb")
    s"""WITH $dCbSql,
       |cents AS (SELECT vec_id AS c_id, embedding AS c_emb
       |          FROM embeddings WHERE vec_id < 16),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb
       |      FROM embeddings WHERE vec_id < 10),
       |assign AS (
       |  SELECT vec_id, c_id AS list FROM (
       |    SELECT e.vec_id, cents.c_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dCos("e.embedding", "cents.c_emb")} DESC, cents.c_id) AS rn
       |    FROM embeddings e CROSS JOIN cents) WHERE rn = 1),
       |codes AS (
       |  SELECT vec_id, subspace, code FROM (
       |    SELECT e.vec_id, c.subspace, c.code,
       |      row_number() OVER (PARTITION BY e.vec_id, c.subspace
       |        ORDER BY ${dL2(dSubSlice.format("e.embedding"), "c.v")} ASC, c.code) AS rn
       |    FROM embeddings e CROSS JOIN cb c) WHERE rn = 1),
       |probes AS (
       |  SELECT q_id, q_emb, c_id AS list FROM (
       |    SELECT q.q_id, q.q_emb, cents.c_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${dCos("q.q_emb", "cents.c_emb")} DESC, cents.c_id) AS rn
       |    FROM q CROSS JOIN cents) WHERE rn <= 4),
       |parts AS (
       |  SELECT p.q_id, a.vec_id, d.subspace, ${dL2(qa, "c.v")} AS pd
       |  FROM probes p
       |  JOIN assign a ON p.list = a.list AND p.q_id <> a.vec_id
       |  JOIN codes d ON d.vec_id = a.vec_id
       |  JOIN cb c ON c.subspace = d.subspace AND c.code = d.code),
       |adcs AS (SELECT q_id, vec_id,
       |           list_aggregate(list(pd ORDER BY subspace), 'sum') AS adc
       |         FROM parts GROUP BY 1, 2)
       |SELECT q_id, vec_id, round(adc, 6) AS adc FROM (
       |  SELECT q_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc ASC, vec_id) AS rn
       |  FROM adcs) WHERE rn <= 5""".stripMargin
  }

  // -- q98: sign random projection (graft_rand_proj) — Achlioptas
  // Johnson-Lindenstrauss reduction 64 -> 16 dims as one codegen'd
  // kernel call per row (sign matrix = md5(i:j) top bits, built once
  // per plan as a reference object). outDim is a power of FOUR so the
  // 1/sqrt(outDim) scale is an exact power of two: each term is an
  // exact product and both engines fold in i-order, so the doubles are
  // bit-identical before the 6-dp round. Oracle: the same per-term
  // arithmetic via list_transform + list_aggregate. --
  private val q98: Q = (s, dir) => {
    import s.implicits._
    graft.functions.GraftFunctions.ensureRegistered(s)
    emb(s, dir)
      .select($"vec_id",
        posexplode(graft.functions.RandProj.randProj($"embedding", 64, 16)))
      .select($"vec_id", $"pos".cast("long").as("j"), round($"col", 6).as("v"))
  }
  private val q98Sql =
    """WITH j AS (SELECT unnest(range(0, 16)) AS j)
      |SELECT vec_id, j,
      |  round(list_aggregate(list_transform(range(1, len(embedding) + 1),
      |    i -> (CASE WHEN substring(md5(CAST(i - 1 AS VARCHAR) || ':' ||
      |                    CAST(j AS VARCHAR)), 1, 1) >= '8'
      |               THEN CAST(embedding[i] AS DOUBLE)
      |               ELSE -CAST(embedding[i] AS DOUBLE) END)
      |         * CAST(0.25 AS DOUBLE)), 'sum'), 6) AS v
      |FROM embeddings CROSS JOIN j""".stripMargin

  // -- q99: project-then-re-rank ANN (Similarity.projectedTopK) — the
  // two-stage search q98's projection exists for: candidates scored in
  // the 16-dim reduced space (bit-identical projections, q98), top-20
  // per query re-ranked at full 64-dim width, true-cosine top-5 out.
  // Oracle: projection lists via nested lambdas + the q30 window forms
  // at each stage. --
  private val q99: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    graft.operators.Similarity.projectedTopK(
      corpus = e, queries = e.filter($"vec_id" < 10),
      idCol = "vec_id", embCol = "embedding",
      dim = 64, reducedDim = 16, k = 5, candidates = 20)
      .select($"q_id", $"vec_id", round($"cos", 6).as("cos"))
  }
  private val q99Sql = {
    val proj =
      """list_transform(range(0, 16), j ->
        |      list_aggregate(list_transform(range(1, len(embedding) + 1),
        |        i -> (CASE WHEN substring(md5(CAST(i - 1 AS VARCHAR) || ':' ||
        |                        CAST(j AS VARCHAR)), 1, 1) >= '8'
        |                   THEN CAST(embedding[i] AS DOUBLE)
        |                   ELSE -CAST(embedding[i] AS DOUBLE) END)
        |             * CAST(0.25 AS DOUBLE)), 'sum'))""".stripMargin
    s"""WITH pr AS (SELECT vec_id, embedding, $proj AS p FROM embeddings),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb, p AS q_p
       |      FROM pr WHERE vec_id < 10),
       |cand AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, c.vec_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${dCos("q.q_p", "c.p")} DESC, c.vec_id) AS rn
       |    FROM q JOIN pr c ON q.q_id <> c.vec_id) WHERE rn <= 20),
       |rr AS (
       |  SELECT cand.q_id, cand.vec_id, ${dCos("q.q_emb", "e.embedding")} AS cos
       |  FROM cand JOIN embeddings e ON cand.vec_id = e.vec_id
       |            JOIN q ON cand.q_id = q.q_id)
       |SELECT q_id, vec_id, round(cos, 6) AS cos FROM (
       |  SELECT q_id, vec_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
       |  FROM rr) WHERE rn <= 5""".stripMargin
  }

  // -- q89: SemDeDup (operators.SemDedup) — semantic dedup over the
  // embedding corpus: IVF-assign to the q33 fixed centroids (narrow
  // fold), within-cluster pairs with cosine >= 0.35 mark the larger id
  // a loser (tau sits inside this corpus's within-cluster score range,
  // p99 ~ 0.34, max 0.49 — the cut is real). Oracle: the q33 window
  // assignment + the same pair join and fold-cosine threshold; sequential
  // fold == VecDot bit-for-bit, so the comparison agrees exactly. --
  private val q89: Q = (s, dir) => {
    import s.implicits._
    val c = emb(s, dir).filter($"vec_id" < 16)
      .select($"vec_id".as("c_id"), $"embedding")
    graft.operators.SemDedup.mark(emb(s, dir), c, "vec_id", "embedding",
      "c_id", tau = 0.35)
      .select($"vec_id", $"cluster".cast("long").as("cluster"), $"kept")
  }
  private val q89Sql =
    s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb
       |           FROM embeddings WHERE vec_id < 16),
       |p AS (SELECT vec_id, c_id, ${dCos("embedding", "c_emb")} AS cos
       |      FROM embeddings CROSS JOIN c),
       |asg AS (SELECT vec_id, c_id AS cluster FROM (
       |  SELECT vec_id, c_id,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, c_id) AS rn
       |  FROM p) WHERE rn = 1),
       |a AS (SELECT asg.vec_id, asg.cluster, e.embedding
       |      FROM asg JOIN embeddings e USING (vec_id)),
       |losers AS (
       |  SELECT DISTINCT y.vec_id FROM a x JOIN a y
       |  ON x.cluster = y.cluster AND x.vec_id < y.vec_id
       |  WHERE ${dCos("x.embedding", "y.embedding")} >= 0.35)
       |SELECT a.vec_id, a.cluster, l.vec_id IS NULL AS kept
       |FROM a LEFT JOIN losers l ON a.vec_id = l.vec_id""".stripMargin

  // -- q109: incremental SEMANTIC dedup (SemDedup.againstCorpus) — the
  // embedding member of the round-6 cross-snapshot family: the shipped
  // corpus persists (cluster, embedding) under the q33 fixed centroids;
  // a batch vector drops when its own cluster holds any corpus vector
  // within cosine >= 0.35 (old data always wins, corpus never
  // re-clusters), survivors twin-drop against each other (q89's mark).
  // Batch = every 10th vector + re-IDed corpus copies (certain stage-1
  // drops at cos 1.0) + re-IDed in-batch copies (certain stage-2
  // prunes). Oracle: q89's window assignment + the same two-stage pair
  // algebra. --
  private val q109: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    val c = e.filter($"vec_id" < 16).select($"vec_id".as("c_id"), $"embedding")
    val corpus = e.filter($"vec_id" % 10 =!= 0)
    val batch = e.filter($"vec_id" % 10 === 0).select($"vec_id", $"embedding")
      .unionByName(e.filter($"vec_id" % 10 =!= 0 && $"vec_id" % 100 === 1)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
      .unionByName(e.filter($"vec_id" % 20 === 0)
        .select(($"vec_id" + 200000).as("vec_id"), $"embedding"))
    val store = graft.operators.SemDedup.semanticStore(
      corpus, c, "vec_id", "embedding", "c_id")
    graft.operators.SemDedup.againstCorpus(
        batch, store, c, "vec_id", "embedding", "c_id", tau = 0.35)
      .select($"vec_id")
  }
  private val q109Sql =
    s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb
       |           FROM embeddings WHERE vec_id < 16),
       |corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
       |batch AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0
       |  UNION ALL SELECT vec_id + 100000, embedding FROM embeddings
       |    WHERE vec_id % 10 <> 0 AND vec_id % 100 = 1
       |  UNION ALL SELECT vec_id + 200000, embedding FROM embeddings
       |    WHERE vec_id % 20 = 0),
       |casg AS (SELECT vec_id, cluster, embedding FROM (
       |  SELECT k.vec_id, c.c_id AS cluster, k.embedding,
       |    row_number() OVER (PARTITION BY k.vec_id
       |      ORDER BY ${dCos("k.embedding", "c.c_emb")} DESC, c.c_id) AS rn
       |  FROM corpus k CROSS JOIN c) WHERE rn = 1),
       |basg AS (SELECT vec_id, cluster, embedding FROM (
       |  SELECT k.vec_id, c.c_id AS cluster, k.embedding,
       |    row_number() OVER (PARTITION BY k.vec_id
       |      ORDER BY ${dCos("k.embedding", "c.c_emb")} DESC, c.c_id) AS rn
       |  FROM batch k CROSS JOIN c) WHERE rn = 1),
       |hit AS (SELECT DISTINCT b.vec_id FROM basg b JOIN casg s ON b.cluster = s.cluster
       |        WHERE ${dCos("b.embedding", "s.embedding")} >= 0.35),
       |surv AS (SELECT vec_id, cluster, embedding FROM basg
       |         WHERE vec_id NOT IN (SELECT vec_id FROM hit)),
       |losers AS (SELECT DISTINCT y.vec_id FROM surv x JOIN surv y
       |           ON x.cluster = y.cluster AND x.vec_id < y.vec_id
       |           WHERE ${dCos("x.embedding", "y.embedding")} >= 0.35)
       |SELECT vec_id FROM surv WHERE vec_id NOT IN (SELECT vec_id FROM losers)""".stripMargin

  // -- q111: prototypicality ranking (SemDedup.prototypicality — the
  // SSL-Prototypes / D4 curation stage): cosine to each vector's OWN
  // assigned centroid (zero-shuffle fold, it IS the assignment score),
  // ranked within the cluster; rank 1 = the redundant near-center mass
  // D4 prunes first, the tail = the cluster's diversity. Oracle: q33's
  // window assignment + a second window rank over the same rounded
  // score (both engines rank the rounded value, vec_id tie-break). --
  private val q111: Q = (s, dir) => {
    import s.implicits._
    val c = emb(s, dir).filter($"vec_id" < 16)
      .select($"vec_id".as("c_id"), $"embedding")
    graft.operators.SemDedup.prototypicality(
        emb(s, dir), c, "vec_id", "embedding", "c_id")
      .select($"vec_id", $"cluster".cast("long").as("cluster"),
        $"proto", $"rk")
  }
  private val q111Sql =
    s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb
       |           FROM embeddings WHERE vec_id < 16),
       |asg AS (SELECT vec_id, cluster, proto FROM (
       |  SELECT k.vec_id, c.c_id AS cluster,
       |    round(${dCos("k.embedding", "c.c_emb")}, 6) AS proto,
       |    row_number() OVER (PARTITION BY k.vec_id
       |      ORDER BY ${dCos("k.embedding", "c.c_emb")} DESC, c.c_id) AS rn
       |  FROM embeddings k CROSS JOIN c) WHERE rn = 1)
       |SELECT vec_id, cluster, proto,
       |  row_number() OVER (PARTITION BY cluster
       |    ORDER BY proto DESC, vec_id) AS rk
       |FROM asg""".stripMargin

  // -- q126: SQ8 ADC top-k (Similarity.sq8AdcTopK) — the search half of
  // q56's int8 quantization: the corpus lives as (m, q8 codes), the
  // float query scores codes asymmetrically (score = m/127 · Σ q8·q),
  // never reconstructing the vector. Same broadcast+heap shape as q30
  // at a quarter of the corpus bytes; q93 shows the IVF composition
  // this slots into at scale. Parity: trunc-cast codes (the q56
  // algebra) and the strict left-fold dot both engines share. --
  private val q126: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    val w = Window.partitionBy($"q_id").orderBy($"score".desc, $"vec_id".asc)
    graft.operators.Similarity.sq8AdcTopK(
        e, e.filter($"vec_id" < 10), "vec_id", "embedding", k = 5)
      .withColumn("rn", row_number().over(w).cast("long"))
      .select($"q_id", $"vec_id", round($"score", 6).as("score"), $"rn")
  }
  private val q126Sql =
    s"""WITH mm AS (
       |  SELECT vec_id, embedding,
       |    list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS m
       |  FROM embeddings),
       |enc AS (
       |  SELECT vec_id, m,
       |    list_transform(embedding, x -> CAST(trunc(CAST(x AS DOUBLE) * 127.0 / m) AS INT)) AS q8
       |  FROM mm),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
       |scored AS (
       |  SELECT q.q_id, e.vec_id, (e.m / 127.0) * ${dDot("e.q8", "q.q_emb")} AS score
       |  FROM q CROSS JOIN enc e WHERE e.vec_id <> q.q_id)
       |SELECT q_id, vec_id, round(score, 6) AS score, rn FROM (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
       |  FROM scored) WHERE rn <= 5""".stripMargin

  // -- q134: ANN recall@k evaluation (Similarity.recallAtK) — the
  // accuracy half of the speed/accuracy trade every quantized index
  // makes: exact cosine top-10 (q30's brute-force heap) as ground
  // truth, SQ8 ADC top-10 (q126's int8 codes) as the approximation,
  // recall@10 = |∩| / 10 per query. Pure integer set intersection over
  // k-bounded lists — both member lists are themselves oracle-pinned
  // (q30/q126), so the only new algebra is the count/ratio. --
  private val q134: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    val q = e.filter($"vec_id" < 10)
    val sim = graft.operators.Similarity
    sim.recallAtK(
        sim.cosineTopK(e, q, "vec_id", "embedding", k = 10),
        sim.sq8AdcTopK(e, q, "vec_id", "embedding", k = 10),
        "vec_id", k = 10)
  }
  private val q134Sql =
    s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_emb
       |           FROM embeddings WHERE vec_id < 10),
       |ex AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id
       |        ORDER BY ${dCos("q_emb", "embedding")} DESC, vec_id) AS rn
       |    FROM q JOIN embeddings ON q_id <> vec_id) WHERE rn <= 10),
       |mm AS (
       |  SELECT vec_id, embedding,
       |    list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS m
       |  FROM embeddings),
       |enc AS (
       |  SELECT vec_id, m,
       |    list_transform(embedding, x -> CAST(trunc(CAST(x AS DOUBLE) * 127.0 / m) AS INT)) AS q8
       |  FROM mm),
       |ap AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q.q_id, e.vec_id, row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY (e.m / 127.0) * ${dDot("e.q8", "q.q_emb")} DESC, e.vec_id) AS rn
       |    FROM q CROSS JOIN enc e WHERE e.vec_id <> q.q_id) WHERE rn <= 10),
       |hits AS (
       |  SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM ex JOIN ap ON ex.q_id = ap.q_id AND ex.vec_id = ap.vec_id
       |  GROUP BY 1)
       |SELECT q.q_id, COALESCE(hits.n_hits, 0) AS n_hits,
       |       round(COALESCE(hits.n_hits, 0) / 10.0, 6) AS recall
       |FROM (SELECT DISTINCT q_id FROM q) q
       |LEFT JOIN hits ON q.q_id = hits.q_id""".stripMargin

  // -- q137: in-engine PCA TRAINING + projection (operators.Pca) — 3
  // power-iteration rounds over the centered corpus (covariance never
  // materializes; each round is one narrow scoring pass + one dim-keyed
  // aggregate), then the corpus projected onto the learned component.
  // Reproducibility is the q120 recipe: per-row dots fold dims
  // ascending, per-dim sums fold rows by vec_id (ordered folds), the
  // norm folds squares in dim order — so the oracle, which unrolls the
  // identical three rounds as CTEs (v0 = 1/√64 = 0.125 exactly), walks
  // a bit-identical v trajectory, and projections x·v − mean·v are
  // bit-identical before the shared 6-dp round. --
  private val q137: Q = (s, dir) => {
    val e = emb(s, dir)
    val pca = graft.operators.Pca
    pca.project(e, "embedding", "vec_id",
      pca.topComponent(e, "embedding", "vec_id", iterations = 3))
  }
  /** The q137 PCA training replay (mean → centered → 3 power-iteration
    * rounds → sign-fixed component + mean·v constant) as a CTE block,
    * shared by q137 (projection) and q138 (stratified sampling over the
    * projection). */
  /** One power-iteration round (c/u/n/v CTEs) over centered table
    * `cent`, CTE names prefixed `pfx` — reads v from `${pfx}v${k-1}`. */
  private def pcaIter(cent: String, pfx: String, k: Int): String = {
    val pv = s"${pfx}v${k - 1}"
    s"""${pfx}c$k AS (SELECT $cent.vec_id,
       |  list_aggregate(list_transform(range(1, 65), j -> $cent.x[j] * $pv.v[j]), 'sum') AS c
       |  FROM $cent CROSS JOIN $pv),
       |${pfx}u$k AS (SELECT p.j,
       |  list_aggregate(list(${pfx}c$k.c * p.xv ORDER BY p.vec_id), 'sum') AS u
       |  FROM (SELECT vec_id, j, x[j] AS xv FROM $cent CROSS JOIN js) p
       |  JOIN ${pfx}c$k USING (vec_id) GROUP BY p.j),
       |${pfx}n$k AS (SELECT list(u ORDER BY j) AS u,
       |  sqrt(list_aggregate(list_transform(list(u ORDER BY j), y -> y * y), 'sum')) AS nm
       |  FROM ${pfx}u$k),
       |${pfx}v$k AS (SELECT list_transform(u, y -> y / nm) AS v FROM ${pfx}n$k)""".stripMargin
  }

  /** A full component block over `cent`: v0 init, `iters` rounds, and
    * the sign-fixed `${pfx}vf`. */
  private def pcaComponent(cent: String, pfx: String, iters: Int = 3): String =
    (s"""${pfx}v0 AS (SELECT list_transform(range(1, 65), j -> CAST(0.125 AS DOUBLE)) AS v)""" +:
      (1 to iters).map(k => pcaIter(cent, pfx, k)) :+
      s"""${pfx}vf AS (SELECT CASE WHEN v[1] < 0 THEN list_transform(v, y -> -y)
         |              ELSE v END AS v FROM ${pfx}v$iters)""".stripMargin)
      .mkString(",\n")

  private val pcaCtes: String = pcaCtesOver("embeddings")

  /** The PCA replay with the training/projection corpus drawn from any
    * table or prior CTE exposing (vec_id, embedding) — q142 trains on
    * pipeline survivors, q137/q138 on the whole table. */
  private def pcaCtesOver(src: String): String = {
    def iter(k: Int): String = pcaIter("cent", "", k)
    s"""e AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x FROM $src),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |js AS (SELECT unnest(range(1, 65)) AS j),
       |pos AS (SELECT vec_id, j, x[j] AS v FROM e CROSS JOIN js),
       |mean AS (SELECT j,
       |  list_aggregate(list(v ORDER BY vec_id), 'sum') / (SELECT n FROM nn) AS m
       |  FROM pos GROUP BY j),
       |ml AS (SELECT list(m ORDER BY j) AS m FROM mean),
       |cent AS (SELECT e.vec_id,
       |  list_transform(range(1, 65), j -> e.x[j] - ml.m[j]) AS x
       |  FROM e CROSS JOIN ml),
       |v0 AS (SELECT list_transform(range(1, 65), j -> CAST(0.125 AS DOUBLE)) AS v),
       |${iter(1)},
       |${iter(2)},
       |${iter(3)},
       |vf AS (SELECT CASE WHEN v[1] < 0 THEN list_transform(v, y -> -y)
       |              ELSE v END AS v FROM v3),
       |c0 AS (SELECT
       |  list_aggregate(list_transform(range(1, 65), j -> ml.m[j] * vf.v[j]), 'sum') AS c0
       |  FROM ml CROSS JOIN vf),
       |pr AS (SELECT e.vec_id, round(
       |  list_aggregate(list_transform(range(1, 65), j -> e.x[j] * vf.v[j]), 'sum')
       |  - c0.c0, 6) AS proj
       |  FROM e CROSS JOIN vf CROSS JOIN c0)""".stripMargin
  }
  private val q137Sql =
    s"""WITH $pcaCtes
       |SELECT vec_id, proj FROM pr""".stripMargin

  // -- q138: embedding-stratified corpus sampling — three operators
  // composed end-to-end: Pca.project (q137's 1-D embedding coordinate),
  // Quality.scoreBuckets (8 equal-mass strata by exact quantile
  // thresholds — q135's machinery on a vector signal), and
  // Sample.bottomK (5 deterministic md5 draws per stratum, the q94
  // heap). The "diverse eval slice" every embedding corpus needs:
  // uniform over embedding space, not over row order. Projections are
  // 6-dp rounded (bit-identical, q137), thresholds are interpolations
  // of identical doubles, draws are md5 arithmetic — all exact. --
  private val q138: Q = (s, dir) => {
    val e = emb(s, dir)
    val pca = graft.operators.Pca
    val proj = pca.project(e, "embedding", "vec_id",
      pca.topComponent(e, "embedding", "vec_id", iterations = 3))
    graft.operators.Sample.bottomK(
      graft.operators.Quality.scoreBuckets(proj, "proj", nBuckets = 8),
      Seq("bucket"), "vec_id", k = 5, salt = "strat")
  }
  private val q138Sql =
    s"""WITH $pcaCtes,
       |th AS (SELECT quantile_cont(proj,
       |         [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS ts FROM pr),
       |bk AS (SELECT pr.vec_id,
       |         1 + len(list_filter(th.ts, t -> pr.proj > t)) AS bucket
       |       FROM pr CROSS JOIN th),
       |h AS (SELECT bucket, vec_id,
       |        TRY_CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR) || ':strat'), 1, 8)
       |          AS BIGINT) AS hv
       |      FROM bk)
       |SELECT CAST(bucket AS BIGINT) AS bucket, vec_id FROM (
       |  SELECT bucket, vec_id,
       |    row_number() OVER (PARTITION BY bucket ORDER BY hv, vec_id) AS rn
       |  FROM h) WHERE rn <= 5""".stripMargin

  // -- q139: SEMANTIC decontamination (Decontam.semanticOverlap) — the
  // embedding-space member of the decontam family (q69 n-grams, q102
  // MinHash, q118 id-space): corpus rows (vec_id % 10 != 0) are flagged
  // when their max cosine against any benchmark embedding (vec_id % 10
  // == 0, the held-out slice) exceeds tau = 0.9 — the paraphrase leak
  // the lexical checks miss. Literal branch at this size: the benchmark
  // rides the plan, zero shuffles. Max is order-independent and cosines
  // are bit-identical strict folds, so parity needs no ordered-fold
  // machinery. Oracle: cross join + max + threshold. --
  private val q139: Q = (s, dir) => {
    val e = emb(s, dir)
    graft.operators.Decontam.semanticOverlap(
      e.filter(col("vec_id") % 10 =!= 0),
      e.filter(col("vec_id") % 10 === 0),
      "vec_id", "embedding", tau = 0.9)
  }
  private[queries] val q139Sql =
    s"""WITH c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 <> 0),
       |b AS (SELECT embedding AS bemb FROM embeddings WHERE vec_id % 10 = 0),
       |sc AS (SELECT c.vec_id, max(${dCos("c.embedding", "b.bemb")}) AS mc
       |       FROM c CROSS JOIN b GROUP BY 1)
       |SELECT vec_id, round(mc, 6) AS max_cos, mc > 0.9 AS contaminated
       |FROM sc""".stripMargin

  // -- q140: IVF-routed SQ8 search (Similarity.ivfSq8TopK) — the last
  // cell of the routing × compression matrix (q59 = IVF×raw, q93 =
  // IVF×PQ, q126 = flat×SQ8): coarse-probe 4 of 16 lists, rank only
  // their members by int8 ADC score. Oracle: the q59 assignment/probe
  // CTEs + the q126 trunc-cast scoring — both already pinned. --
  private val q140: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    graft.operators.Similarity.ivfSq8TopK(
      corpus = e,
      centroids = e.filter($"vec_id" < 16)
        .select($"vec_id".as("c_id"), $"embedding"),
      queries = e.filter($"vec_id" < 10),
      idCol = "vec_id", embCol = "embedding", centroidIdCol = "c_id",
      k = 5, nProbe = 4)
      .select($"q_id", $"vec_id", round($"score", 6).as("score"))
  }
  private val q140Sql =
    s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_emb
       |           FROM embeddings WHERE vec_id < 16),
       |q AS (SELECT vec_id AS q_id, embedding AS q_emb
       |      FROM embeddings WHERE vec_id < 10),
       |assign AS (
       |  SELECT vec_id, embedding, c_id AS list FROM (
       |    SELECT e.vec_id, e.embedding, c.c_id,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${dCos("e.embedding", "c.c_emb")} DESC, c.c_id) AS rn
       |    FROM embeddings e CROSS JOIN c) WHERE rn = 1),
       |enc AS (
       |  SELECT vec_id, list, m,
       |    list_transform(embedding, x -> CAST(trunc(CAST(x AS DOUBLE) * 127.0 / m) AS INT)) AS q8
       |  FROM (SELECT vec_id, list, embedding,
       |          list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS m
       |        FROM assign)),
       |probes AS (
       |  SELECT q_id, q_emb, c_id AS list FROM (
       |    SELECT q.q_id, q.q_emb, c.c_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${dCos("q.q_emb", "c.c_emb")} DESC, c.c_id) AS rn
       |    FROM q CROSS JOIN c) WHERE rn <= 4),
       |cand AS (
       |  SELECT p.q_id, e.vec_id, (e.m / 127.0) * ${dDot("e.q8", "p.q_emb")} AS score
       |  FROM probes p JOIN enc e ON p.list = e.list AND p.q_id <> e.vec_id)
       |SELECT q_id, vec_id, round(score, 6) AS score FROM (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
       |  FROM cand) WHERE rn <= 5""".stripMargin

  // -- q141: 2-component PCA map (Pca.topComponents/projectK) — the
  // deflation extension of q137: after component 1 converges, the
  // centered copy deflates (x̃ ← x̃ − (x̃·v)v, exactly sign-invariant in
  // IEEE arithmetic) and the same 3 power rounds recover component 2;
  // the corpus then projects onto both — the 2-D embedding map every
  // corpus atlas starts from. Oracle: the q137 CTE block + a deflation
  // CTE + the same component block re-run over it (prefix b), all
  // ordered folds, so both trajectories stay bit-identical. --
  private val q141: Q = (s, dir) => {
    val e = emb(s, dir)
    val pca = graft.operators.Pca
    pca.projectK(e, "embedding", "vec_id",
      pca.topComponents(e, "embedding", "vec_id", nComponents = 2,
        iterations = 3))
  }
  private val q141Sql =
    s"""WITH $pcaCtes,
       |cent2 AS (
       |  SELECT vec_id, list_transform(range(1, 65), j -> x[j] - c * v[j]) AS x
       |  FROM (SELECT cent.vec_id, cent.x, vf.v,
       |          list_aggregate(list_transform(range(1, 65), j -> cent.x[j] * vf.v[j]), 'sum') AS c
       |        FROM cent CROSS JOIN vf)),
       |${pcaComponent("cent2", "b")},
       |c01 AS (SELECT
       |  list_aggregate(list_transform(range(1, 65), j -> ml.m[j] * vf.v[j]), 'sum') AS c0
       |  FROM ml CROSS JOIN vf),
       |c02 AS (SELECT
       |  list_aggregate(list_transform(range(1, 65), j -> ml.m[j] * bvf.v[j]), 'sum') AS c0
       |  FROM ml CROSS JOIN bvf)
       |SELECT e.vec_id,
       |  round(list_aggregate(list_transform(range(1, 65), j -> e.x[j] * vf.v[j]), 'sum')
       |        - c01.c0, 6) AS p1,
       |  round(list_aggregate(list_transform(range(1, 65), j -> e.x[j] * bvf.v[j]), 'sum')
       |        - c02.c0, 6) AS p2
       |FROM e CROSS JOIN vf CROSS JOIN bvf CROSS JOIN c01 CROSS JOIN c02""".stripMargin

  // -- q142: the VECTOR curation pipeline (capstone composition — the
  // embedding-side twin of q100's text pipeline): align documents with
  // their embeddings, (1) semantic-decontam against the held-out tenth
  // (q139's literal-branch gate), (2) exact text dedup, lowest id wins
  // (q20's fingerprint), (3) PCA-stratified diverse sample — the PCA
  // trained on the SURVIVORS, not the raw table (q137's trainer over
  // the pipeline output), 8 strata × 5 md5 draws (q138). One
  // declarative plan end-to-end; every stage's algebra is already
  // oracle-pinned alone, this pins their composition. --
  private val q142: Q = (s, dir) => {
    val e = emb(s, dir)
    val d = Tables.load(s, dir, "documents")
    val corpus = d.select(col("doc_id"), col("text"))
      .join(e.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"))
      .filter(col("doc_id") % 10 =!= 0)
    val bench = e.filter(col("vec_id") % 10 === 0)
    import graft.operators.{Decontam, Dedup, Pca, Quality, Sample}
    val keep = Decontam
      .semanticOverlap(corpus, bench, "doc_id", "embedding", tau = 0.9)
      .filter(!col("contaminated")).select(col("doc_id"))
    val clean = corpus.join(keep, Seq("doc_id"), "left_semi")
    // stage boundary (the q108 discipline): PCA training, the bucket
    // quantile pass and the final sample each drive their own action —
    // pin the dedup survivors once so the decontam+dedup chain computes
    // once, not once per downstream action
    val deduped = Dedup.exactByText(clean, "text", "doc_id").localCheckpoint()
    val model = Pca.topComponent(deduped, "embedding", "doc_id",
      iterations = 3)
    val proj = Pca.project(deduped, "embedding", "doc_id", model)
    Sample.bottomK(
      Quality.scoreBuckets(proj, "proj", nBuckets = 8),
      Seq("bucket"), "doc_id", k = 5, salt = "curate")
  }
  private val q142Sql = {
    val dFp = "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    s"""WITH ac AS (
       |  SELECT d.doc_id, d.text, em.embedding
       |  FROM documents d JOIN embeddings em ON em.vec_id = d.doc_id
       |  WHERE d.doc_id % 10 <> 0),
       |bb AS (SELECT embedding AS bemb FROM embeddings WHERE vec_id % 10 = 0),
       |mc AS (SELECT ac.doc_id, max(${dCos("ac.embedding", "bb.bemb")}) AS mc
       |       FROM ac CROSS JOIN bb GROUP BY 1),
       |clean AS (SELECT ac.* FROM ac JOIN mc USING (doc_id)
       |          WHERE NOT (mc.mc > 0.9)),
       |dd AS (SELECT doc_id, embedding FROM (
       |    SELECT clean.*, row_number() OVER (PARTITION BY $dFp
       |        ORDER BY doc_id) AS rn
       |    FROM clean) WHERE rn = 1),
       |srv AS (SELECT doc_id AS vec_id, embedding FROM dd),
       |${pcaCtesOver("srv")},
       |th AS (SELECT quantile_cont(proj,
       |         [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS ts FROM pr),
       |bk AS (SELECT pr.vec_id,
       |         1 + len(list_filter(th.ts, t -> pr.proj > t)) AS bucket
       |       FROM pr CROSS JOIN th),
       |h AS (SELECT bucket, vec_id,
       |        TRY_CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR) || ':curate'), 1, 8)
       |          AS BIGINT) AS hv
       |      FROM bk)
       |SELECT CAST(bucket AS BIGINT) AS bucket, vec_id AS doc_id FROM (
       |  SELECT bucket, vec_id,
       |    row_number() OVER (PARTITION BY bucket ORDER BY hv, vec_id) AS rn
       |  FROM h) WHERE rn <= 5""".stripMargin
  }

  // -- q145: approximate k-NN graph (Similarity.knnGraph) — the
  // corpus×corpus construction: two sign-LSH hash tables over DISJOINT
  // 8-dim coordinate slices generate candidate edges (independent
  // collisions → recall beyond any single table), exact cosine scores
  // them, and the map-side-combined graft_topk heap cuts each node to
  // its 5 best neighbors. Oracle: the same two bucket expressions
  // unnested, distinct id pairs, dCos re-scoring, row_number cut —
  // the heap's (score desc, id asc) tie order is the window's. --
  private val q145: Q = (s, dir) => {
    import s.implicits._
    graft.operators.Similarity.knnGraph(emb(s, dir), "vec_id", "embedding",
      k = 5, bits = 8, tables = 2)
      .select($"q_id".as("src"), $"vec_id".as("dst"),
        round($"cos", 6).as("cos"))
  }
  private val q145Sql =
    s"""WITH sigs AS (
       |  SELECT vec_id, tbl,
       |    array_to_string(list_transform(
       |      list_slice(embedding, 1 + 8 * tbl, 8 + 8 * tbl),
       |      x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
       |  FROM embeddings, (SELECT unnest([0, 1]) AS tbl)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
       |  FROM sigs a JOIN sigs b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |sc AS (
       |  SELECT src, dst, ${dCos("ea.embedding", "eb.embedding")} AS cos
       |  FROM cand JOIN embeddings ea ON src = ea.vec_id
       |            JOIN embeddings eb ON dst = eb.vec_id)
       |SELECT src, dst, round(cos, 6) AS cos FROM (
       |  SELECT src, dst, cos,
       |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
       |  FROM sc) WHERE rn <= 5""".stripMargin

  // -- q149: k-NN graph hubness audit — the ANN failure-mode detector:
  // in high dimensions a few "hub" vectors appear in everyone's
  // neighbor list, degrading both search quality and graph-based dedup.
  // In-degree per node over the q145 graph + the corpus-level degree
  // histogram; a production run alerts on max_in_degree outliers. One
  // extra count shuffle over the (already k-bounded) edge list. --
  private val q149: Q = (s, dir) => {
    import s.implicits._
    val g = graft.operators.Similarity.knnGraph(emb(s, dir),
      "vec_id", "embedding", k = 5, bits = 8, tables = 2)
    g.groupBy($"vec_id".as("dst"))
      .agg(count(lit(1)).as("in_degree"))
      .groupBy($"in_degree")
      .agg(count(lit(1)).as("n_nodes"), min($"dst").as("min_dst"))
  }
  private val q149Sql =
    s"""WITH sigs AS (
       |  SELECT vec_id, tbl,
       |    array_to_string(list_transform(
       |      list_slice(embedding, 1 + 8 * tbl, 8 + 8 * tbl),
       |      x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
       |  FROM embeddings, (SELECT unnest([0, 1]) AS tbl)),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
       |  FROM sigs a JOIN sigs b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |sc AS (
       |  SELECT src, dst, ${dCos("ea.embedding", "eb.embedding")} AS cos
       |  FROM cand JOIN embeddings ea ON src = ea.vec_id
       |            JOIN embeddings eb ON dst = eb.vec_id),
       |g AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |      row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
       |    FROM sc) WHERE rn <= 5),
       |deg AS (SELECT dst, CAST(count(*) AS BIGINT) AS in_degree
       |        FROM g GROUP BY 1)
       |SELECT in_degree, CAST(count(*) AS BIGINT) AS n_nodes,
       |  min(dst) AS min_dst
       |FROM deg GROUP BY 1""".stripMargin

  // -- q150: embedding near-dup CLUSTERS — q32's in-bucket cosine pairs
  // at tau = 0.35 (above the fixture's in-bucket noise floor — its max
  // in-bucket cosine is ~0.43) closed into connected components (Dedup.clusters min-
  // label propagation), the embedding-space twin of the text-side q62:
  // "keep one per cluster" is then a filter. Oracle: the q32 pair SQL +
  // the recursive-CTE transitive closure — an independent fixpoint
  // algorithm computing the same components. --
  private val q150: Q = (s, dir) => {
    import s.implicits._
    val pairs = q32(s, dir).filter($"cos" >= 0.35)
    graft.operators.Dedup.clusters(pairs, "vec_a", "vec_b")
      .select($"node".as("vec_id"), $"cluster")
  }
  private val q150Sql =
    s"""WITH RECURSIVE
       |p0 AS ($q32Sql),
       |pairs AS (SELECT vec_a, vec_b FROM p0 WHERE cos >= 0.35),
       |edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs
       |          UNION SELECT vec_b, vec_a FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |members AS (
       |  SELECT src AS node, dst AS m FROM reach
       |  UNION ALL
       |  SELECT src, src FROM edges)
       |SELECT node AS vec_id, min(m) AS cluster FROM members GROUP BY node""".stripMargin

  // -- q151: incremental k-NN graph append (Similarity.knnGraphAppend)
  // — builds the graph over 80% of the corpus, then merges the held-out
  // 20% batch WITHOUT re-scoring old×old pairs. The oracle is q145's
  // FROM-SCRATCH SQL verbatim: LSH candidate generation is pairwise-
  // independent and top-k(top-k(A) ∪ B) = top-k(A ∪ B) under the total
  // tie order, so the incremental result must hash-match the full
  // rebuild — the strongest possible check on the append path. --
  private val q151: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    val old = e.filter($"vec_id" % 5 =!= 0)
    val batch = e.filter($"vec_id" % 5 === 0)
    val g0 = graft.operators.Similarity.knnGraph(old, "vec_id", "embedding",
      k = 5, bits = 8, tables = 2)
    graft.operators.Similarity.knnGraphAppend(g0, old, batch,
      "vec_id", "embedding", k = 5, bits = 8, tables = 2)
      .select($"q_id".as("src"), $"vec_id".as("dst"),
        round($"cos", 6).as("cos"))
  }
  private val q151Sql = q145Sql

  // -- q161: persistent k-NN graph store lifecycle (writeKnnStore →
  // appendToKnnStore → openKnnStore) — the q151 math pushed through the
  // DISK store pair (bucketed vectors + edges tables, geometry-stamped):
  // build over 80%, commit the 20% batch, read the edges back. Since
  // round 12 this routes through the DEFAULT geometry, i.e. AutoBits:
  // writeKnnStore sizes bits = ceil(log2(n80 / 64)) from the build
  // corpus and STAMPS the resolved value; the append replays the stamp.
  // The oracle computes the same formula from the same 80% count (sf0.01
  // -> 3 bits, sf0.1 -> 5 — the geometry scales with the corpus, which
  // is the whole point), then runs q145's from-scratch construction at
  // that geometry, so the hash match proves the auto-sizing AND the
  // store round-trip (staged edge rewrite included) exact. q145 keeps
  // explicit bits=8 as the fixed-geometry parity pin. Store tables are
  // sf-suffixed and rebuilt per run (the append lifecycle must not see
  // a previous run's already-appended state). --
  private val q161: Q = (s, dir) => {
    import s.implicits._
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    val t = s"graft_knnstore_$sfx"
    Seq(graft.operators.Similarity.knnVectorsTable(t),
      graft.operators.Similarity.knnEdgesTable(t)).foreach { tbl =>
      s.sql(s"DROP TABLE IF EXISTS `$tbl`")
    }
    val e = emb(s, dir)
    graft.operators.Similarity.writeKnnStore(
      e.filter($"vec_id" % 5 =!= 0), "vec_id", "embedding", t, k = 5)
    graft.operators.Similarity.appendToKnnStore(
      e.filter($"vec_id" % 5 === 0), "vec_id", "embedding", t)
    graft.operators.Similarity.openKnnStore(s, t)
      .select($"q_id".as("src"), $"vec_id".as("dst"),
        round($"cos", 6).as("cos"))
  }
  private val q161Sql =
    s"""WITH geo AS (
       |  -- mirror of Scala autoBits incl. BOTH clamps: >= 1 bit, and
       |  -- bits <= dim/tables (16-dim embeddings, 2 tables -> cap 8)
       |  SELECT GREATEST(1, LEAST(
       |      CAST(ceil(log2(count(*) / 64.0)) AS INT), 8)) AS bits
       |  FROM embeddings WHERE vec_id % 5 <> 0),
       |sigs AS (
       |  SELECT vec_id, tbl,
       |    array_to_string(list_transform(
       |      list_slice(embedding, 1 + bits * tbl, bits + bits * tbl),
       |      x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
       |  FROM embeddings, (SELECT unnest([0, 1]) AS tbl), geo),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS src, b.vec_id AS dst
       |  FROM sigs a JOIN sigs b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
       |sc AS (
       |  SELECT src, dst, ${dCos("ea.embedding", "eb.embedding")} AS cos
       |  FROM cand JOIN embeddings ea ON src = ea.vec_id
       |            JOIN embeddings eb ON dst = eb.vec_id)
       |SELECT src, dst, round(cos, 6) AS cos FROM (
       |  SELECT src, dst, cos,
       |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
       |  FROM sc) WHERE rn <= 5""".stripMargin

  // -- q182: margin-based cross-corpus pair mining
  // (Similarity.marginMine) — the bitext-mining criterion (Artetxe &
  // Schwenk 2019 ratio margin, the CCMatrix/LASER alignment recipe):
  // even vec_ids as corpus A, odd as corpus B; cos(a,b) normalized by
  // the mean of each endpoint's k=4 NN cosines, mutual-best pairs kept
  // at margin >= tau. Parity: cosines are the shared strict-left-fold
  // dot; each k-NN mean folds its top-k cosines in (cos asc, id asc)
  // order in BOTH engines, so margins are bit-identical before the
  // shared 6-dp round. --
  private val q182: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    graft.operators.Similarity.marginMine(
        e.filter($"vec_id" % 2 === 0), e.filter($"vec_id" % 2 === 1),
        "vec_id", "embedding", k = 4, tau = 1.05)
      .select($"a_id", $"b_id", round($"margin", 6).as("margin"))
  }
  private val q182Sql =
    s"""WITH a AS (SELECT vec_id AS a_id, embedding AS ea
       |           FROM embeddings WHERE vec_id % 2 = 0),
       |b AS (SELECT vec_id AS b_id, embedding AS eb
       |      FROM embeddings WHERE vec_id % 2 = 1),
       |p AS (SELECT a_id, b_id, ${dCos("ea", "eb")} AS cos
       |      FROM a CROSS JOIN b),
       |ta AS (SELECT a_id, b_id, cos FROM (
       |  SELECT a_id, b_id, cos, row_number() OVER (PARTITION BY a_id
       |      ORDER BY cos DESC, b_id) AS rn FROM p) WHERE rn <= 4),
       |tb AS (SELECT a_id, b_id, cos FROM (
       |  SELECT a_id, b_id, cos, row_number() OVER (PARTITION BY b_id
       |      ORDER BY cos DESC, a_id) AS rn FROM p) WHERE rn <= 4),
       |ma AS (SELECT a_id, list_aggregate(list(cos ORDER BY cos, b_id), 'sum')
       |         / CAST(count(*) AS DOUBLE) AS avg_a FROM ta GROUP BY 1),
       |mb AS (SELECT b_id, list_aggregate(list(cos ORDER BY cos, a_id), 'sum')
       |         / CAST(count(*) AS DOUBLE) AS avg_b FROM tb GROUP BY 1),
       |cand AS (SELECT DISTINCT a_id, b_id, cos FROM (
       |  SELECT * FROM ta UNION ALL SELECT * FROM tb)),
       |m AS (SELECT c.a_id, c.b_id, c.cos / ((ma.avg_a + mb.avg_b) / 2) AS margin
       |      FROM cand c JOIN ma ON c.a_id = ma.a_id
       |                  JOIN mb ON c.b_id = mb.b_id),
       |r AS (SELECT a_id, b_id, margin,
       |        row_number() OVER (PARTITION BY a_id
       |            ORDER BY margin DESC, b_id) AS rf,
       |        row_number() OVER (PARTITION BY b_id
       |            ORDER BY margin DESC, a_id) AS rb
       |      FROM m)
       |SELECT a_id, b_id, round(margin, 6) AS margin FROM r
       |WHERE rf = 1 AND rb = 1 AND margin >= 1.05""".stripMargin

  // -- q183: margin mining at corpus×corpus scale
  // (Similarity.marginMineBucketed) — q182's criterion over sign-LSH
  // candidates instead of all pairs: both sides' two-table signatures
  // (q145's disjoint 8-dim slices) shuffle once on the bucket key, only
  // colliding cross-corpus pairs are scored, and the margin algebra —
  // per-endpoint k-NN means over CANDIDATE neighbors, the documented
  // approximation — runs k-bounded past the candidate frame. Registered
  // at the AutoBits DEFAULT (the q161 lesson: the scale path and the
  // correctness pin must be the same code path — fixture-sized literal
  // bits hit the n²/2^bits wall at x100), so the oracle derives the
  // same ⌈log₂(n/64)⌉ geometry from its own count. Oracle: q145's
  // sig/bucket-join CTEs per side feeding q182's margin CTEs. --
  private val q183: Q = (s, dir) => {
    import s.implicits._
    val e = emb(s, dir)
    graft.operators.Similarity.marginMineBucketed(
        e.filter($"vec_id" % 2 === 0), e.filter($"vec_id" % 2 === 1),
        "vec_id", "embedding", k = 4, tau = 1.05)
      .select($"a_id", $"b_id", round($"margin", 6).as("margin"))
  }
  /** q183's margin CTE chain over a dynamic-bits geometry: `geoFrom` is
    * the FROM clause whose count AutoBits resolved against (the union
    * for marginMineBucketed, the initial write corpus for the store). */
  private def marginBucketedSql(geoFrom: String) = {
    def sig(e: String) =
      "array_to_string(list_transform(" +
        s"list_slice($e, 1 + bits * tbl, bits + bits * tbl), " +
        "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
    s"""WITH geo AS (
       |  -- Scala autoBits incl. clamps (16-dim, 2 tables -> cap 8)
       |  SELECT GREATEST(1, LEAST(
       |      CAST(ceil(log2(count(*) / 64.0)) AS INT), 8)) AS bits
       |  FROM $geoFrom),
       |av AS (SELECT vec_id AS a_id, embedding AS ea
       |       FROM embeddings WHERE vec_id % 2 = 0),
       |bv AS (SELECT vec_id AS b_id, embedding AS eb
       |       FROM embeddings WHERE vec_id % 2 = 1),
       |sa AS (SELECT a_id, tbl, ${sig("ea")} AS bucket
       |       FROM av, (SELECT unnest([0, 1]) AS tbl), geo),
       |sb AS (SELECT b_id, tbl, ${sig("eb")} AS bucket
       |       FROM bv, (SELECT unnest([0, 1]) AS tbl), geo),
       |cand AS (SELECT DISTINCT sa.a_id, sb.b_id FROM sa JOIN sb
       |           ON sa.tbl = sb.tbl AND sa.bucket = sb.bucket
       |          AND sa.a_id <> sb.b_id),
       |p AS (SELECT c.a_id, c.b_id, ${dCos("av.ea", "bv.eb")} AS cos
       |      FROM cand c JOIN av ON c.a_id = av.a_id
       |                  JOIN bv ON c.b_id = bv.b_id),
       |ta AS (SELECT a_id, b_id, cos FROM (
       |  SELECT a_id, b_id, cos, row_number() OVER (PARTITION BY a_id
       |      ORDER BY cos DESC, b_id) AS rn FROM p) WHERE rn <= 4),
       |tb AS (SELECT a_id, b_id, cos FROM (
       |  SELECT a_id, b_id, cos, row_number() OVER (PARTITION BY b_id
       |      ORDER BY cos DESC, a_id) AS rn FROM p) WHERE rn <= 4),
       |ma AS (SELECT a_id, list_aggregate(list(cos ORDER BY cos, b_id), 'sum')
       |         / CAST(count(*) AS DOUBLE) AS avg_a FROM ta GROUP BY 1),
       |mb AS (SELECT b_id, list_aggregate(list(cos ORDER BY cos, a_id), 'sum')
       |         / CAST(count(*) AS DOUBLE) AS avg_b FROM tb GROUP BY 1),
       |c2 AS (SELECT DISTINCT a_id, b_id, cos FROM (
       |  SELECT * FROM ta UNION ALL SELECT * FROM tb)),
       |m AS (SELECT c.a_id, c.b_id, c.cos / ((ma.avg_a + mb.avg_b) / 2) AS margin
       |      FROM c2 c JOIN ma ON c.a_id = ma.a_id
       |                 JOIN mb ON c.b_id = mb.b_id),
       |r AS (SELECT a_id, b_id, margin,
       |        row_number() OVER (PARTITION BY a_id
       |            ORDER BY margin DESC, b_id) AS rf,
       |        row_number() OVER (PARTITION BY b_id
       |            ORDER BY margin DESC, a_id) AS rb
       |      FROM m)
       |SELECT a_id, b_id, round(margin, 6) AS margin FROM r
       |WHERE rf = 1 AND rb = 1 AND margin >= 1.05""".stripMargin
  }
  private val q183Sql = marginBucketedSql("embeddings")

  // -- q185: margin mining at the PERSISTED store
  // (Similarity.writeMarginStore/appendToMarginStore/marginMineStore) —
  // q183's criterion with the shipped side never re-signed or
  // re-shuffled: even vec_ids land as an id-bucketed vectors table plus
  // a (table,bucket)-bucketed signatures table (geometry-stamped), a
  // fifth of them arriving via the append path (idempotence included in
  // what the oracle pins: a duplicate append would change candidate
  // multiplicity and the k-NN means). Probing the odd side then mines
  // EXACTLY what the from-scratch bucketed run mines — the oracle is
  // q183's CTE chain (the q151/q145 store-roundtrip precedent) at the
  // geometry AutoBits stamped from the INITIAL write corpus (appends
  // replay the stamp, so the oracle's geo count excludes the appended
  // fifth — the stamp semantics made hash-observable). --
  private val q185: Q = (s, dir) => {
    import s.implicits._
    val sfx = dir.replaceAll("[^A-Za-z0-9]", "_")
    val t = s"graft_marginstore_$sfx"
    Seq(graft.operators.Similarity.marginVectorsTable(t),
      graft.operators.Similarity.marginSigsTable(t)).foreach { tbl =>
      s.sql(s"DROP TABLE IF EXISTS `$tbl`")
    }
    val e = emb(s, dir)
    val evens = e.filter($"vec_id" % 2 === 0)
    graft.operators.Similarity.writeMarginStore(
      evens.filter($"vec_id" % 10 =!= 0), "vec_id", "embedding",
      t, buckets = 4)
    graft.operators.Similarity.appendToMarginStore(
      evens.filter($"vec_id" % 10 === 0), "vec_id", "embedding", t)
    graft.operators.Similarity.marginMineStore(s, t,
        e.filter($"vec_id" % 2 === 1), "vec_id", "embedding",
        k = 4, tau = 1.05)
      .select($"a_id", $"b_id", round($"margin", 6).as("margin"))
  }

  // -- q187: MODEL-FREE document embeddings (DocEmbed.hashedProjection)
  // — hashed BoW counts over 128 md5 buckets through the q98 sign
  // projection to 16 components: every text corpus gets an embedding
  // column with no external model, unlocking the embedding family on
  // raw text (JL-approximate BoW cosine). Demonstrated as the q30
  // brute-force shape: cosine top-3 over the derived embeddings for the
  // first 10 docs. Counts×(±2⁻²) products are exact and both engines
  // fold in index order, so projections — and therefore cosines — are
  // bit-identical before the shared 6-dp round. --
  private val q187: Q = (s, dir) => {
    import s.implicits._
    val e = graft.operators.DocEmbed.hashedProjection(
      Tables.load(s, dir, "documents"), "text", "doc_id",
      dim = 128, outDim = 16)
    graft.operators.Similarity.cosineTopK(
        corpus = e, queries = e.filter($"doc_id" < 10),
        idCol = "doc_id", embCol = "embedding", k = 3)
      .select($"q_id", $"doc_id", round($"cos", 6).as("cos"))
  }
  /** Shared DocEmbed derivation CTEs (tok → bucket counts → dense
    * vector → projection `pr(doc_id, pe)`) at a given output width;
    * scale must be the exact 1/√outDim power of two. */
  private def docEmbCtes(outDim: Int, scale: String): String = {
    val dTok = "list_filter(string_split_regex(text, '\\s+'), t -> len(t) > 0)"
    val proj =
      s"""list_transform(range(0, $outDim), j ->
         |      list_aggregate(list_transform(range(1, len(fv) + 1),
         |        i -> (CASE WHEN substring(md5(CAST(i - 1 AS VARCHAR) || ':' ||
         |                        CAST(j AS VARCHAR)), 1, 1) >= '8'
         |                   THEN fv[i] ELSE -fv[i] END)
         |         * CAST($scale AS DOUBLE)), 'sum'))""".stripMargin
    s"""tok AS (SELECT doc_id, unnest($dTok) AS t FROM documents),
       |bc AS (SELECT doc_id,
       |         CAST(TRY_CAST('0x' || substring(md5(t), 1, 8) AS BIGINT) % 128 AS INT) AS b,
       |         count(*) AS c
       |       FROM tok GROUP BY 1, 2),
       |dm AS (SELECT doc_id, map(list(b), list(c)) AS m FROM bc GROUP BY 1),
       |fv AS (SELECT doc_id, list_transform(range(0, 128),
       |         i -> CAST(coalesce(map_extract(m, i)[1], 0) AS DOUBLE)) AS fv
       |       FROM dm),
       |pr AS (SELECT doc_id, $proj AS pe FROM fv)""".stripMargin
  }

  private val q187Sql =
    s"""WITH ${docEmbCtes(16, "0.25")},
       |p AS (SELECT q.doc_id AS q_id, c.doc_id,
       |        ${dCos("q.pe", "c.pe")} AS cos
       |      FROM pr q JOIN pr c ON q.doc_id < 10 AND q.doc_id <> c.doc_id)
       |SELECT q_id, doc_id, round(cos, 6) AS cos FROM (
       |  SELECT q_id, doc_id, cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS rn
       |  FROM p) WHERE rn <= 3""".stripMargin

  // -- q188: corpus×corpus TEXT similarity graph with no model —
  // Similarity.knnGraph (SkewAwareBits, two-table sign-LSH) over
  // DocEmbed embeddings at the CORPUS-READY outDim 64 default (the
  // round-13 wall: a 16-wide projection caps the bit budget at 8/table
  // and x100 ran >10 min; 64-wide carries 32 bits of geometry — §6.1):
  // the full bucketed ANN path on raw text, scale path == correctness
  // pin — including the round-12 MEASURED geometry (BoW sign buckets
  // are ~12x skewed vs the uniform formula; the measured sizing halves
  // candidate mass and the build time, §6). Oracle: the shared
  // derivation CTEs at width 64 feeding the occupancy-scan geo CTE
  // (the autoBitsSkewAware loop as min-over-qualifying-b) and q161's
  // dynamic-bits sig/bucket-join/score/top-k chain; hash-exact at both
  // SFs where the measured bits DIFFER (3-vs-10ish) — the oracle
  // tracks the measurement, not a pinned constant. --
  private val q188: Q = (s, dir) => {
    import s.implicits._
    // the derived embedding frame is an ARTIFACT (a production pipeline
    // persists it — the store discipline); checkpoint it so the plan's
    // six consumers (AutoBits count + dim probe, two sig sides, two
    // score re-joins) read it instead of re-running the BoW shuffle +
    // projection kernel each — 6.4 s → 5.0 s steady at sf0.1. The
    // remaining cost is candidate mass: BoW sign buckets are SKEWED
    // (common-word mass pushes most documents to the same sign pattern
    // — measured 4.8 M candidate pairs at sf0.1 vs ~0.4 M if buckets
    // were uniform), the documented dense-neighborhood regime the
    // per-node top-k heap bounds (SURVEY §6).
    val e = graft.operators.DocEmbed.hashedProjection(
      Tables.load(s, dir, "documents"), "text", "doc_id", dim = 128)
      .localCheckpoint()
    // registered at the MEASURED skew-aware geometry (round-12: BoW
    // sign buckets are ~12x skewed vs the uniform formula's assumption;
    // the oracle replicates the measurement — occupancy per candidate
    // bits value, first b meeting the 2x-uniform budget scanning up)
    graft.operators.Similarity.knnGraph(e, "doc_id", "embedding",
        k = 3, bits = graft.operators.Similarity.SkewAwareBits, tables = 2)
      .select($"q_id".as("src"), $"doc_id".as("dst"),
        round($"cos", 6).as("cos"))
  }
  private val q188Sql =
    s"""WITH ${docEmbCtes(64, "0.125")},
       |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pr),
       |fb AS (SELECT GREATEST(1, LEAST(
       |    CAST(ceil(log2(n / 64.0)) AS INT), 32)) AS b0 FROM n0),
       |-- the autoBitsSkewAware scan: for each candidate bits value b
       |-- from the formula start to the dim/tables clamp (32), measure
       |-- the candidate mass sum(cnt*(cnt-1))/2 over both tables'
       |-- buckets; the engine stops at the FIRST b whose mass meets the
       |-- slack*n*targetBucket*tables = 256*n budget (or the clamp),
       |-- i.e. min(b) over the qualifying set
       |cand_b AS (SELECT unnest(range(b0, 33)) AS b FROM fb),
       |occ AS (
       |  SELECT cb.b, t.tbl,
       |    array_to_string(list_transform(
       |      list_slice(pr.pe, 1 + cb.b * t.tbl, cb.b + cb.b * t.tbl),
       |      x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM pr, cand_b cb, (SELECT unnest([0, 1]) AS tbl) t
       |  GROUP BY 1, 2, 3),
       |massq AS (SELECT b, sum(cnt * (cnt - 1)) / 2 AS m FROM occ GROUP BY 1),
       |geo AS (SELECT CAST(min(b) AS INT) AS bits FROM massq, n0
       |        WHERE b = 32 OR m <= 256 * n),
       |sigs AS (SELECT doc_id, tbl,
       |    array_to_string(list_transform(
       |      list_slice(pe, 1 + bits * tbl, bits + bits * tbl),
       |      x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
       |  FROM pr, (SELECT unnest([0, 1]) AS tbl), geo),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM sigs a JOIN sigs b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.doc_id <> b.doc_id),
       |sc AS (
       |  SELECT src, dst, ${dCos("ea.pe", "eb.pe")} AS cos
       |  FROM cand JOIN pr ea ON src = ea.doc_id
       |            JOIN pr eb ON dst = eb.doc_id)
       |SELECT src, dst, round(cos, 6) AS cos FROM (
       |  SELECT src, dst, cos,
       |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
       |  FROM sc) WHERE rn <= 3""".stripMargin

  // -- q189: embedding near-dup pairs at the AUTO-SIZED geometry
  // (Similarity.lshNearDup at its AutoBits default) — the q32 scale
  // path with the round-12 default: bits = ⌈log₂(n/64)⌉ derived from
  // the corpus (single-table, clamped to the 16-dim embedding), so the
  // registered call IS the 100 TB call — no fixture-sized literal. The
  // oracle derives the same geometry from its own count (the q161
  // dynamic-bits discipline), mirrors the signBucket slice, and pairs
  // within buckets exhaustively (every bucket is under maxBucket at
  // the fixture, so the star branch is provably dark here — q32/q150
  // keep the fixed-geometry parity pins, DedupSimilaritySpec pins the
  // star). --
  private val q189: Q = (s, dir) => {
    import s.implicits._
    graft.operators.Similarity.lshNearDup(emb(s, dir), "vec_id", "embedding",
        minCos = 0.3)
      .select($"vec_id_a".as("vec_a"), $"vec_id_b".as("vec_b"),
        round($"cos", 6).as("cos"))
  }
  private val q189Sql =
    s"""WITH geo AS (
       |  -- Scala autoBits, single table: clamp to the full 16 dims
       |  SELECT GREATEST(1, LEAST(
       |      CAST(ceil(log2(count(*) / 64.0)) AS INT), 16)) AS bits
       |  FROM embeddings),
       |e AS (SELECT vec_id, embedding,
       |        array_to_string(list_transform(list_slice(embedding, 1, bits),
       |          x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
       |      FROM embeddings, geo)
       |SELECT vec_a, vec_b, round(cos, 6) AS cos FROM (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    ${dCos("a.embedding", "b.embedding")} AS cos
       |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |WHERE cos >= 0.3""".stripMargin

  // -- q191: CENTERED text k-NN — q188's corpus×corpus text graph with
  // the bucketing hyperplanes re-anchored at the corpus's own
  // per-coordinate mean (Similarity.corpusCenter → knnGraph(center)).
  // Hashed-BoW sign buckets are skewed because every document shares
  // common-token mass — a per-coordinate OFFSET, exactly what centering
  // removes: the same documents spread over balanced buckets, so the
  // measured skew-aware scan settles at FEWER bits (cost) or finds more
  // true neighbors at equal bits (recall). The center is derived from a
  // deterministic 256-doc md5 sample (content-addressed — both engines
  // draw the same docs) and each coordinate's mean is an id-ordered
  // strict fold (the q135 discipline), so the thresholds are
  // bit-identical across engines. Oracle: q188's occupancy-scan CTE
  // chain with every bucket comparison re-anchored at the means CTE —
  // the full measured, centered geometry derivation replayed in SQL. --
  private val q191: Q = (s, dir) => {
    import s.implicits._
    val e = graft.operators.DocEmbed.hashedProjection(
      Tables.load(s, dir, "documents"), "text", "doc_id", dim = 128)
      .localCheckpoint()
    val center = graft.operators.Similarity.corpusCenter(
      e, "doc_id", "embedding", sampleK = 256)
    graft.operators.Similarity.knnGraph(e, "doc_id", "embedding",
        k = 3, bits = graft.operators.Similarity.SkewAwareBits, tables = 2,
        center = center)
      .select($"q_id".as("src"), $"doc_id".as("dst"),
        round($"cos", 6).as("cos"))
  }
  private val q191Sql = {
    // centered bucket over slice [b*tbl+1, b*tbl+b] — positional access
    // (not list_slice) because each bit compares against ITS dimension's
    // mean from the muv CTE
    def csig(pe: String, b: String, tbl: String) =
      s"""array_to_string(list_transform(range(1, $b + 1),
         |      i -> CASE WHEN $pe[$b * $tbl + i] >= mv[$b * $tbl + i]
         |                THEN '1' ELSE '0' END), '')""".stripMargin
    s"""WITH ${docEmbCtes(64, "0.125")},
       |smp AS (SELECT doc_id, pe FROM (
       |  SELECT doc_id, pe, row_number() OVER (
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':'), doc_id) AS rn
       |  FROM pr) WHERE rn <= 256),
       |mu AS (SELECT j, list_aggregate(list(pe[j] ORDER BY doc_id), 'sum')
       |         / CAST(count(*) AS DOUBLE) AS m
       |       FROM smp, (SELECT unnest(range(1, 65)) AS j) GROUP BY 1),
       |muv AS (SELECT list(m ORDER BY j) AS mv FROM mu),
       |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pr),
       |fb AS (SELECT GREATEST(1, LEAST(
       |    CAST(ceil(log2(n / 64.0)) AS INT), 32)) AS b0 FROM n0),
       |cand_b AS (SELECT unnest(range(b0, 33)) AS b FROM fb),
       |occ AS (
       |  SELECT cb.b, t.tbl, ${csig("pr.pe", "cb.b", "t.tbl")} AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM pr, cand_b cb, (SELECT unnest([0, 1]) AS tbl) t, muv
       |  GROUP BY 1, 2, 3),
       |massq AS (SELECT b, sum(cnt * (cnt - 1)) / 2 AS m FROM occ GROUP BY 1),
       |geo AS (SELECT CAST(min(b) AS INT) AS bits FROM massq, n0
       |        WHERE b = 32 OR m <= 256 * n),
       |sigs AS (SELECT doc_id, tbl, ${csig("pe", "bits", "tbl")} AS bucket
       |  FROM pr, (SELECT unnest([0, 1]) AS tbl), geo, muv),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM sigs a JOIN sigs b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.doc_id <> b.doc_id),
       |sc AS (
       |  SELECT src, dst, ${dCos("ea.pe", "eb.pe")} AS cos
       |  FROM cand JOIN pr ea ON src = ea.doc_id
       |            JOIN pr eb ON dst = eb.doc_id)
       |SELECT src, dst, round(cos, 6) AS cos FROM (
       |  SELECT src, dst, cos,
       |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
       |  FROM sc) WHERE rn <= 3""".stripMargin
  }

  // -- q192: centered-EMBEDDING text k-NN — the metric-CONSISTENT
  // centering recipe (all-but-the-top, Mu & Viswanath 2018): subtract
  // the corpus mean from every hashed-BoW embedding ONCE
  // (Vectors.centered — narrow, zero shuffles), then run the standard
  // origin-hyperplane machinery. Unlike q191 (which re-anchors only the
  // BUCKETS and keeps scoring raw cosine), buckets and scores here live
  // in the same centered space, so sign-LSH is again the locality
  // family of the similarity actually scored. Measured (CenterScale,
  // sf0.1): the skew VANISHES — the occupancy scan settles exactly at
  // the uniform formula bits — and recall@3 vs its own exact form is
  // 0.45 at 0.7 M candidates where the raw-cosine pipeline needs 1.16 M
  // for 0.43 — so this registers at the plain AutoBits DEFAULT, the
  // production recipe (no measurement scan needed once centered).
  // Oracle: the sample/means CTEs + per-dim subtraction + q183's
  // dynamic-bits geo CTE + the standard sig/cand/score/top-k chain. --
  private val q192: Q = (s, dir) => {
    import s.implicits._
    val e = graft.operators.DocEmbed.hashedProjection(
      Tables.load(s, dir, "documents"), "text", "doc_id", dim = 128)
      .localCheckpoint()
    val center = graft.operators.Similarity.corpusCenter(
      e, "doc_id", "embedding", sampleK = 256)
    val ce = e.select($"doc_id",
      graft.functions.Vectors.centered($"embedding", center).as("embedding"))
      .localCheckpoint()
    graft.operators.Similarity.knnGraph(ce, "doc_id", "embedding",
        k = 3, tables = 2)
      .select($"q_id".as("src"), $"doc_id".as("dst"),
        round($"cos", 6).as("cos"))
  }
  private val q192Sql =
    s"""WITH ${docEmbCtes(64, "0.125")},
       |smp AS (SELECT doc_id, pe FROM (
       |  SELECT doc_id, pe, row_number() OVER (
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':'), doc_id) AS rn
       |  FROM pr) WHERE rn <= 256),
       |mu AS (SELECT j, list_aggregate(list(pe[j] ORDER BY doc_id), 'sum')
       |         / CAST(count(*) AS DOUBLE) AS m
       |       FROM smp, (SELECT unnest(range(1, 65)) AS j) GROUP BY 1),
       |muv AS (SELECT list(m ORDER BY j) AS mv FROM mu),
       |ce AS (SELECT doc_id,
       |         list_transform(range(1, 65), i -> pe[i] - mv[i]) AS pe
       |       FROM pr, muv),
       |geo AS (SELECT GREATEST(1, LEAST(
       |    CAST(ceil(log2(count(*) / 64.0)) AS INT), 32)) AS bits FROM ce),
       |sigs AS (SELECT doc_id, tbl,
       |    array_to_string(list_transform(
       |      list_slice(pe, 1 + bits * tbl, bits + bits * tbl),
       |      x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
       |  FROM ce, (SELECT unnest([0, 1]) AS tbl), geo),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
       |  FROM sigs a JOIN sigs b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.doc_id <> b.doc_id),
       |sc AS (
       |  SELECT src, dst, ${dCos("ea.pe", "eb.pe")} AS cos
       |  FROM cand JOIN ce ea ON src = ea.doc_id
       |            JOIN ce eb ON dst = eb.doc_id)
       |SELECT src, dst, round(cos, 6) AS cos FROM (
       |  SELECT src, dst, cos,
       |    row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
       |  FROM sc) WHERE rn <= 3""".stripMargin

  // -- q206: DERIVED-embedding near-dup pruning at the round-13
  // DEFAULT (DocEmbed.pruneNearDups) — the whole default path pinned:
  // hashed-BoW projection at width 64, the md5-sampled corpus center
  // (sampleK 65536 covers the fixture, but the oracle replays the
  // sampling CTE verbatim — the q191 discipline), CENTERED sign buckets
  // at the plain AutoBits formula (centering removes the BoW skew, so
  // no measurement pass — the q192 result made the default), RAW-cosine
  // verification at minCos 0.9 (thresholds keep their BoW meaning),
  // connected components, min-id survivor per cluster. Oracle: the
  // projection + center + formula-geometry CTEs feeding q62's
  // recursive-closure clusters and a NOT EXISTS survivor filter — an
  // independent component algorithm over independently derived
  // candidates, so the hash match pins geometry, scoring, AND the
  // cluster algebra of the call every config-driven `embedDedup` run
  // now makes. Every bucket is far under maxBucket at both SFs
  // (formula bits keep ~64 expected occupancy; measured max ≈ 3× that)
  // — the star branch is provably dark here; DedupSimilaritySpec pins
  // the star and the centered-vs-raw recall dominance. --
  private val q206: Q = (s, dir) => {
    import s.implicits._
    graft.operators.DocEmbed.pruneNearDups(
        Tables.load(s, dir, "documents"), "text", "doc_id", minCos = 0.9)
      .select($"doc_id", $"lang", $"source")
  }
  private val q206Sql =
    s"""WITH RECURSIVE ${docEmbCtes(64, "0.125")},
       |smp AS (SELECT doc_id, pe FROM (
       |  SELECT doc_id, pe, row_number() OVER (
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':'), doc_id) AS rn
       |  FROM pr) WHERE rn <= 65536),
       |mu AS (SELECT j, list_aggregate(list(pe[j] ORDER BY doc_id), 'sum')
       |         / CAST(count(*) AS DOUBLE) AS m
       |       FROM smp, (SELECT unnest(range(1, 65)) AS j) GROUP BY 1),
       |muv AS (SELECT list(m ORDER BY j) AS mv FROM mu),
       |geo AS (SELECT GREATEST(1, LEAST(
       |    CAST(ceil(log2(count(*) / 64.0)) AS INT), 64)) AS bits FROM pr),
       |sigs AS (SELECT doc_id,
       |    array_to_string(list_transform(range(1, bits + 1),
       |      i -> CASE WHEN pe[i] >= mv[i] THEN '1' ELSE '0' END), '')
       |      AS bucket
       |  FROM pr, geo, muv),
       |-- MATERIALIZED: DuckDB inlines CTEs into each recursion step of
       |-- reach, which would re-run the whole projection pipeline per
       |-- iteration (measured: >9 min at sf0.1 inlined, ~9 s pinned)
       |pairs AS MATERIALIZED (
       |  SELECT a.doc_id AS da, b.doc_id AS db
       |  FROM sigs a JOIN sigs b
       |    ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  JOIN pr ea ON a.doc_id = ea.doc_id
       |  JOIN pr eb ON b.doc_id = eb.doc_id
       |  WHERE ${dCos("ea.pe", "eb.pe")} >= 0.9),
       |edges AS (SELECT da AS src, db AS dst FROM pairs
       |          UNION SELECT db, da FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |members AS (
       |  SELECT src AS node, dst AS m FROM reach
       |  UNION ALL SELECT src, src FROM edges),
       |clusters AS (SELECT node, min(m) AS cluster FROM members GROUP BY node)
       |SELECT d.doc_id, d.lang, d.source FROM documents d
       |WHERE NOT EXISTS (SELECT 1 FROM clusters c
       |                  WHERE c.node = d.doc_id AND c.cluster <> c.node)""".stripMargin

  // -- q200: vector-corpus data card (CorpusReport.vectorCard) — the
  // embedding-side sibling of the q194 doc card, same (section, key,
  // value) shape so the q195 diff works on it unchanged: vector count /
  // nullness, dimension consistency (dims/min != dims/max = ragged
  // vectors), norm quantiles on 6-dp-rounded norms (the q56 shared
  // round; quantiles via the rank SCAN — norms are continuous, a
  // histogram would be corpus-sized), label composition. No cell sums
  // doubles, so the card hash-reproduces cross-engine. --
  private val q200: Q = (s, dir) =>
    graft.operators.CorpusReport.vectorCard(emb(s, dir), "embedding",
      labelCol = Some("label"))
  private val q200Sql =
    s"""WITH b AS (SELECT embedding,
       |    CASE WHEN embedding IS NULL THEN NULL
       |         ELSE len(embedding) END AS n,
       |    CASE WHEN embedding IS NULL THEN NULL
       |         ELSE round(sqrt(${dDot("embedding", "embedding")}), 6)
       |         END AS nrm
       |  FROM embeddings),
       |s AS (SELECT CAST(count(*) AS DOUBLE) AS n_vecs,
       |        CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END)
       |          AS DOUBLE) AS n_null,
       |        CAST(min(n) AS DOUBLE) AS dim_min,
       |        CAST(max(n) AS DOUBLE) AS dim_max
       |      FROM b),
       |q AS (SELECT quantile_cont(nrm, 0.5) AS p50,
       |             quantile_cont(nrm, 0.9) AS p90 FROM b)
       |SELECT 'corpus' AS section, 'n_vecs' AS key, n_vecs AS value FROM s
       |UNION ALL SELECT 'corpus', 'n_null', n_null FROM s
       |UNION ALL SELECT 'dims', 'min', dim_min FROM s
       |UNION ALL SELECT 'dims', 'max', dim_max FROM s
       |UNION ALL SELECT 'norm', 'p50', p50 FROM q
       |UNION ALL SELECT 'norm', 'p90', p90 FROM q
       |UNION ALL SELECT 'label', coalesce(CAST(label AS VARCHAR), 'null'),
       |  CAST(count(*) AS DOUBLE) FROM embeddings GROUP BY label""".stripMargin

  val queries: Map[String, Q] = Map(
    "q206_centered_embed_dedup" -> q206,
    "q211_mmr_rerank" -> q211,
    "q200_vector_card" -> q200,
    "q192_centered_embed_knn" -> q192,
    "q191_centered_text_knn" -> q191,
    "q189_lsh_neardup_auto" -> q189,
    "q188_text_knn" -> q188,
    "q187_doc_embed_topk" -> q187,
    "q185_margin_store" -> q185,
    "q183_margin_bucketed" -> q183,
    "q182_margin_mine" -> q182,
    "q161_knn_store" -> q161,
    "q151_knn_append" -> q151,
    "q149_knn_hubness" -> q149,
    "q150_embed_clusters" -> q150,
    "q145_knn_graph" -> q145,
    "q142_vector_pipeline" -> q142,
    "q141_pca_map" -> q141,
    "q140_ivf_sq8_topk" -> q140,
    "q139_semantic_decontam" -> q139,
    "q138_stratified_sample" -> q138,
    "q137_pca_project" -> q137,
    "q134_ann_recall" -> q134,
    "q111_prototypicality" -> q111,
    "q30_cosine_topk" -> q30,
    "q31_lsh_buckets" -> q31,
    "q32_embed_neardup" -> q32,
    "q33_ivf_assign" -> q33,
    "q56_embed_quantize" -> q56,
    "q59_ivf_topk" -> q59,
    "q63_topk_agg" -> q63,
    "q73_pq_encode" -> q73,
    "q74_pq_adc_topk" -> q74,
    "q89_semdedup" -> q89,
    "q92_pq_train" -> q92,
    "q93_ivf_pq_topk" -> q93,
    "q98_rand_proj" -> q98,
    "q99_projected_topk" -> q99,
    "q109_semdedup_incremental" -> q109,
    "q126_sq8_adc_topk" -> q126,
  )

  val oracle: Map[String, String] = Map(
    "q206_centered_embed_dedup" -> q206Sql,
    "q211_mmr_rerank" -> q211Sql,
    "q200_vector_card" -> q200Sql,
    "q192_centered_embed_knn" -> q192Sql,
    "q191_centered_text_knn" -> q191Sql,
    "q189_lsh_neardup_auto" -> q189Sql,
    "q188_text_knn" -> q188Sql,
    "q187_doc_embed_topk" -> q187Sql,
    "q185_margin_store" ->
      marginBucketedSql("embeddings WHERE vec_id % 2 = 0 AND vec_id % 10 <> 0"),
    "q183_margin_bucketed" -> q183Sql,
    "q182_margin_mine" -> q182Sql,
    "q161_knn_store" -> q161Sql,
    "q151_knn_append" -> q151Sql,
    "q149_knn_hubness" -> q149Sql,
    "q150_embed_clusters" -> q150Sql,
    "q145_knn_graph" -> q145Sql,
    "q142_vector_pipeline" -> q142Sql,
    "q141_pca_map" -> q141Sql,
    "q140_ivf_sq8_topk" -> q140Sql,
    "q139_semantic_decontam" -> q139Sql,
    "q138_stratified_sample" -> q138Sql,
    "q137_pca_project" -> q137Sql,
    "q134_ann_recall" -> q134Sql,
    "q30_cosine_topk" -> q30Sql,
    "q31_lsh_buckets" -> q31Sql,
    "q32_embed_neardup" -> q32Sql,
    "q33_ivf_assign" -> q33Sql,
    "q56_embed_quantize" -> q56Sql,
    "q59_ivf_topk" -> q59Sql,
    "q63_topk_agg" -> q63Sql,
    "q73_pq_encode" -> q73Sql,
    "q74_pq_adc_topk" -> q74Sql,
    "q89_semdedup" -> q89Sql,
    "q92_pq_train" -> q92Sql,
    "q93_ivf_pq_topk" -> q93Sql,
    "q98_rand_proj" -> q98Sql,
    "q99_projected_topk" -> q99Sql,
    "q109_semdedup_incremental" -> q109Sql,
    "q126_sq8_adc_topk" -> q126Sql,
    "q111_prototypicality" -> q111Sql,
  )
}
