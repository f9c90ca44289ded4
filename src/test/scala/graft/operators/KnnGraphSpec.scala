package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Approximate k-NN graph: per-node cut, exact scores, and monotone
  * recall in the number of hash tables (candidate sets only grow). */
class KnnGraphSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf(), "embeddings")

  test("knnGraph: <= k neighbors per node, no self edges, scores are true cosines") {
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5).cache()
    val maxPer = g.groupBy($"q_id").count().agg(max($"count")).as[Long].head()
    assert(maxPer <= 5)
    assert(g.filter($"q_id" === $"vec_id").isEmpty)
    val chk = g
      .join(emb.select($"vec_id".as("q_id"), $"embedding".as("__ea")), Seq("q_id"))
      .join(emb.select($"vec_id", $"embedding".as("__eb")), Seq("vec_id"))
      .withColumn("__c2", graft.functions.Vectors.cosine($"__ea", $"__eb"))
    assert(chk.filter(abs($"cos" - $"__c2") > 1e-12).isEmpty)
    g.unpersist()
  }

  test("knnGraphAppend == from-scratch rebuild (both append orders)") {
    def full = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5)
    for (r <- Seq(0L, 3L)) {
      val old = emb.filter($"vec_id" % 4 =!= r)
      val batch = emb.filter($"vec_id" % 4 === r)
      val g0 = Similarity.knnGraph(old, "vec_id", "embedding", k = 5)
      val inc = Similarity.knnGraphAppend(g0, old, batch, "vec_id", "embedding", k = 5)
      assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
        s"incremental graph diverged from rebuild for residue $r")
    }
  }

  test("knnGraphAuto sizes bits from the corpus and matches the manual call") {
    val n = emb.count()
    val target = 8
    val wanted = math.max(1,
      math.ceil(math.log(n.toDouble / target) / math.log(2.0)).toInt)
    val auto = Similarity.knnGraphAuto(emb, "vec_id", "embedding", k = 5,
      targetBucket = target)
    val manual = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5,
      bits = math.min(wanted, 32))
    assert(auto.exceptAll(manual).isEmpty && manual.exceptAll(auto).isEmpty)
  }

  test("autoBitsSkewAware: measured sizing caps candidate mass the " +
      "formula understates on a skewed corpus; never below the formula") {
    // the skewed corpus: hashed-BoW document embeddings (SURVEY §6 —
    // common-word mass concentrates sign patterns, ~12x candidate
    // inflation at formula geometry)
    val docs = Tables.load(spark, sf(), "documents")
    val bow = DocEmbed.hashedProjection(docs, "text", "doc_id")
      .localCheckpoint()
    val n = bow.count()
    val dim = bow.select(size($"embedding")).head().getInt(0)
    val tables = 2
    val target = 8
    val formula = Similarity.autoBits(n, dim, tables, target)
    val skewed = Similarity.autoBitsSkewAware(bow, "doc_id", "embedding",
      tables, target, slack = 2.0)
    assert(skewed >= formula, "measured sizing never shrinks the formula")
    def candMass(bits: Int): Long = {
      def sig(t: Int) = graft.functions.Vectors
        .signBucketAt($"embedding", bits, t * bits)
      (0 until tables).map { t =>
        bow.groupBy(sig(t).as("b")).count()
          .agg(sum($"count" * ($"count" - 1L))).as[Long].head() / 2
      }.sum
    }
    val clamp = math.max(1, dim / tables)
    val budget = (2.0 * n * target * tables).toLong
    assert(candMass(skewed) <= budget || skewed == clamp,
      s"measured geometry must meet the budget or hit the clamp: " +
        s"mass=${candMass(skewed)} budget=$budget bits=$skewed clamp=$clamp")
    assert(candMass(formula) > budget,
      "fixture sanity: the formula geometry really is over budget here " +
        "(otherwise this test exercises nothing)")
    // a near-uniform corpus (the embeddings fixture's random-ish signs)
    // should not be inflated far past the formula
    val uni = Similarity.autoBitsSkewAware(emb, "vec_id", "embedding",
      tables, 64, slack = 2.0)
    val uniFormula = Similarity.autoBits(emb.count(),
      emb.select(size($"embedding")).head().getInt(0), tables, 64)
    assert(uni <= uniFormula + 2,
      s"uniform corpus must stay near the formula: $uni vs $uniFormula")
    // the sentinel routes every family door through the measurement:
    // knnGraph(SkewAwareBits) == knnGraph(explicit measured bits)
    val viaSentinel = Similarity.knnGraph(bow, "doc_id", "embedding",
      k = 3, bits = Similarity.SkewAwareBits, tables = tables)
    val viaExplicit = Similarity.knnGraph(bow, "doc_id", "embedding",
      k = 3, bits = Similarity.autoBitsSkewAware(bow, "doc_id",
        "embedding", tables), tables = tables)
    assert(viaSentinel.exceptAll(viaExplicit).isEmpty &&
      viaExplicit.exceptAll(viaSentinel).isEmpty)
  }

  test("knnGraph top-k runs as the heap aggregate, not a window sort") {
    val plan = Similarity.knnGraph(emb, "vec_id", "embedding", k = 5)
      .queryExecution.executedPlan
    val aggs = collectPlan(plan) {
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => a
    }
    assert(aggs.exists(_.aggregateExpressions.exists(
      _.aggregateFunction.isInstanceOf[graft.functions.TopKByScore])),
      "per-node cut must be the graft_topk heap")
    val windows = collectPlan(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, "no window sort in the k-NN graph plan")
  }

  test("knnGraph recall against brute force is monotone in hash tables") {
    def edges(tables: Int): Set[(Long, Long)] =
      Similarity.knnGraph(emb, "vec_id", "embedding", k = 5, tables = tables)
        .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val truth = Similarity.cosineTopK(emb, emb, "vec_id", "embedding", k = 5)
      .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    val r1 = (edges(1) & truth).size
    val r2 = (edges(2) & truth).size
    assert(r2 >= r1, s"recall dropped with a second table: $r1 -> $r2")
    assert(r2 > 0, "graph found none of the true neighbors")
  }
}
