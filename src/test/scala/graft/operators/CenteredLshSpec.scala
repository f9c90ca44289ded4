package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.Vectors
import org.apache.spark.sql.functions._

/** Centered LSH geometry — the skewed-family pair:
  * [[Vectors.centered]] (embedding-side, the metric-consistent recipe)
  * and the `center` bucketing thresholds threaded through
  * [[Similarity.knnGraph]]/stores (bucket-side machinery), plus the
  * [[Similarity.corpusCenter]] deterministic sampled mean both feed
  * on. */
class CenteredLshSpec extends SparkSpec {

  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf(), "embeddings")

  test("Vectors.centered: hand-computed subtraction, exact float widening") {
    val df = Seq((1L, Seq(1.5f, -2.0f, 0.25f))).toDF("id", "v")
    val out = df.select(Vectors.centered($"v", Seq(0.5, -1.0, 0.25)))
      .head().getSeq[Double](0)
    assert(out == Seq(1.0, -1.0, 0.0))
  }

  test("signBucketCenteredAt at a zero center == signBucketAt") {
    val got = emb.select(
      Vectors.signBucketAt($"embedding", 6, 4).as("plain"),
      Vectors.signBucketCenteredAt($"embedding", 6, 4,
        Seq.fill(16)(0.0)).as("centered"))
    assert(got.filter($"plain" =!= $"centered").isEmpty,
      "zero thresholds must reproduce the origin hyperplanes bit-for-bit")
  }

  test("signBucketCenteredAt rejects a too-short center") {
    intercept[IllegalArgumentException] {
      Vectors.signBucketCenteredAt(col("embedding"), 8, 12, Seq.fill(16)(0.0))
    }
  }

  test("corpusCenter: partition-count invariant, sample-bounded, exact") {
    val c1 = Similarity.corpusCenter(emb.repartition(1), "vec_id", "embedding",
      sampleK = 64)
    val c8 = Similarity.corpusCenter(emb.repartition(8), "vec_id", "embedding",
      sampleK = 64)
    assert(c1 == c8, "the sampled mean must be bit-identical at any layout")
    assert(c1.length == 64)
    // independent witness: the same 64 sampled rows, the same id-ordered
    // strict fold, computed via a second code path (collect + fold)
    val rows = emb
      .select($"vec_id", $"embedding".cast("array<double>").as("x"),
        md5(concat($"vec_id".cast("string"), lit(":"))).as("h"))
      .orderBy($"h", $"vec_id").limit(64)
      .select($"vec_id", $"x").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val expect = (0 until 64).map { j =>
      rows.foldLeft(0.0)((acc, r) => acc + r._2(j)) / rows.length
    }
    assert(c1 == expect, "sampled mean must equal the hand-rolled fold")
  }

  test("corpusCenter fails fast on empty and ragged input") {
    intercept[IllegalArgumentException] {
      Similarity.corpusCenter(emb.filter(lit(false)), "vec_id", "embedding")
    }
    val ragged = Seq((1L, Seq(1.0, 2.0)), (2L, Seq(1.0))).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Similarity.corpusCenter(ragged, "id", "v")
    }
  }

  test("knnGraph at a zero center == plain knnGraph") {
    val plain = Similarity.knnGraph(emb, "vec_id", "embedding", k = 4,
      bits = 6, tables = 2)
    val zeroed = Similarity.knnGraph(emb, "vec_id", "embedding", k = 4,
      bits = 6, tables = 2, center = Seq.fill(16)(0.0))
    assert(zeroed.exceptAll(plain).isEmpty && plain.exceptAll(zeroed).isEmpty)
  }

  test("threshold-centered buckets == origin buckets over centered embeddings") {
    // the equivalence the two halves hinge on: sign(x − μ) is the same
    // bit whether the subtraction happens in the threshold or the vector
    val c = Similarity.corpusCenter(emb, "vec_id", "embedding", sampleK = 64)
    val a = emb.select($"vec_id",
      Vectors.signBucketCenteredAt($"embedding", 5, 3, c).as("b"))
    val b = emb.select($"vec_id",
      Vectors.signBucketAt(Vectors.centered($"embedding", c), 5, 3).as("b"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("knnGraphAppend rejects the SkewAwareBits sentinel loudly") {
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3, bits = 4)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnGraphAppend(g, emb, emb.limit(0), "vec_id", "embedding",
        k = 3, bits = Similarity.SkewAwareBits)
    }
    assert(e.getMessage.contains("autoBitsSkewAware"),
      "the rejection must name the resolver to run up front")
  }

  test("centered store: stamp replays bit-exact, append == rebuild") {
    val t = "centered_knnstore_spec"
    Seq(Similarity.knnVectorsTable(t), Similarity.knnEdgesTable(t),
      Similarity.knnEdgesTable(t) + "__rewriting").foreach { tb =>
      spark.sql(s"DROP TABLE IF EXISTS `$tb`")
    }
    // a deliberately nasty center: negative, subnormal, huge, -0.0 —
    // the hex stamp must round-trip every IEEE bit pattern
    val base = Similarity.corpusCenter(emb, "vec_id", "embedding",
      sampleK = 64)
    val c = base.updated(0, -0.0).updated(1, java.lang.Double.MIN_VALUE)
      .updated(2, -1.7e308)
    val old = emb.filter($"vec_id" % 4 =!= 0)
    val batch = emb.filter($"vec_id" % 4 === 0)
    Similarity.writeKnnStore(old, "vec_id", "embedding", t, k = 4,
      bits = 5, center = c)
    Similarity.appendToKnnStore(batch, "vec_id", "embedding", t)
    val stored = Similarity.openKnnStore(spark, t)
      .select($"q_id", $"vec_id", $"cos")
    val full = Similarity.knnGraph(emb, "vec_id", "embedding", k = 4,
      bits = 5, center = c)
    assert(stored.exceptAll(full).isEmpty && full.exceptAll(stored).isEmpty,
      "append must replay the STAMPED center — any drift lands the " +
        "batch beside the stored signatures")
    // and the stamp itself round-trips bit-exact
    val raw = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(
        Similarity.knnVectorsTable(t)))
      .properties(Similarity.KnnGeometryProp)
    val parsed = Similarity.parseCenter(raw.split(";center=")(1))
    assert(parsed.length == c.length &&
      parsed.zip(c).forall { case (p, x) =>
        java.lang.Double.doubleToRawLongBits(p) ==
          java.lang.Double.doubleToRawLongBits(x) },
      "hex stamp must preserve every IEEE bit pattern incl. -0.0/subnormals")
    Seq(Similarity.knnVectorsTable(t), Similarity.knnEdgesTable(t)).foreach {
      tb => spark.sql(s"DROP TABLE IF EXISTS `$tb`")
    }
  }

  test("DocEmbed.centeredProjection == the three-call composition; mean of the centered frame ~ 0") {
    val docs = Tables.load(spark, sf(), "documents")
    val (ce, c) = DocEmbed.centeredProjection(docs, "text", "doc_id",
      dim = 64, outDim = 16, sampleK = 32)
    val e = DocEmbed.hashedProjection(docs, "text", "doc_id",
      dim = 64, outDim = 16)
    val c2 = Similarity.corpusCenter(e, "doc_id", "embedding", sampleK = 32)
    assert(c == c2, "one-call center must equal the composed derivation")
    val byHand = e.select($"doc_id",
      Vectors.centered($"embedding", c2).as("embedding"))
    assert(ce.exceptAll(byHand).isEmpty && byHand.exceptAll(ce).isEmpty)
    // the centered frame's own sampled mean is ~zero (exact up to the
    // one subtraction per coordinate): re-centering is a no-op
    val rc = Similarity.corpusCenter(ce, "doc_id", "embedding", sampleK = 32)
    assert(rc.forall(v => math.abs(v) < 1e-9),
      "centering is idempotent on the sampled mean")
  }

  test("knnStoreCenterDrift: exact zero at write time, positive after a shifted append, plain store rejected") {
    val t = "centered_drift_spec"
    Seq(Similarity.knnVectorsTable(t), Similarity.knnEdgesTable(t),
      Similarity.knnEdgesTable(t) + "__rewriting").foreach { tb =>
      spark.sql(s"DROP TABLE IF EXISTS `$tb`")
    }
    val old = emb.filter($"vec_id" % 4 =!= 0)
    val c = Similarity.corpusCenter(old, "vec_id", "embedding", sampleK = 64)
    Similarity.writeKnnStore(old, "vec_id", "embedding", t, k = 3,
      bits = 5, center = c)
    val (l2a, linfa, norm) = Similarity.knnStoreCenterDrift(spark, t,
      sampleK = 64)
    assert(l2a == 0.0 && linfa == 0.0 && norm > 0.0,
      "same corpus + same sampleK must reproduce the stamp bit-exactly")
    // a uniformly shifted batch moves the sampled mean
    val shifted = emb.filter($"vec_id" % 4 === 0)
      .select(($"vec_id" + 1000000L).as("vec_id"),
        transform($"embedding", x => x + lit(3.0f)).as("embedding"))
    Similarity.appendToKnnStore(shifted, "vec_id", "embedding", t)
    val (l2b, linfb, _) = Similarity.knnStoreCenterDrift(spark, t,
      sampleK = 64)
    assert(l2b > 0.0 && linfb > 0.0,
      "a shifted append must register as center drift")
    Seq(Similarity.knnVectorsTable(t), Similarity.knnEdgesTable(t)).foreach {
      tb => spark.sql(s"DROP TABLE IF EXISTS `$tb`")
    }
    // plain (center-less) store: nothing to drift from — loud rejection
    val tp = "centered_drift_plain"
    Seq(Similarity.knnVectorsTable(tp), Similarity.knnEdgesTable(tp)).foreach {
      tb => spark.sql(s"DROP TABLE IF EXISTS `$tb`")
    }
    Similarity.writeKnnStore(emb, "vec_id", "embedding", tp, k = 3, bits = 4)
    val e = intercept[IllegalArgumentException] {
      Similarity.knnStoreCenterDrift(spark, tp)
    }
    assert(e.getMessage.contains("no center"))
    Seq(Similarity.knnVectorsTable(tp), Similarity.knnEdgesTable(tp)).foreach {
      tb => spark.sql(s"DROP TABLE IF EXISTS `$tb`")
    }
  }

  test("regeomKnnStore migrates a plain store to a centered geometry") {
    val t = "centered_regeom_spec"
    Seq(Similarity.knnVectorsTable(t), Similarity.knnEdgesTable(t),
      Similarity.knnEdgesTable(t) + "__rewriting").foreach { tb =>
      spark.sql(s"DROP TABLE IF EXISTS `$tb`")
    }
    Similarity.writeKnnStore(emb, "vec_id", "embedding", t, k = 3, bits = 4)
    val c = Similarity.corpusCenter(emb, "vec_id", "embedding", sampleK = 64)
    Similarity.regeomKnnStore(spark, t, k = 3, bits = 5, center = c)
    val migrated = Similarity.openKnnStore(spark, t)
      .select($"q_id", $"vec_id", $"cos")
    val scratch = Similarity.knnGraph(emb, "vec_id", "embedding", k = 3,
      bits = 5, center = c)
    assert(migrated.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(migrated).isEmpty,
      "migration must equal a from-scratch build at the new centered geometry")
    Seq(Similarity.knnVectorsTable(t), Similarity.knnEdgesTable(t)).foreach {
      tb => spark.sql(s"DROP TABLE IF EXISTS `$tb`")
    }
  }
}
