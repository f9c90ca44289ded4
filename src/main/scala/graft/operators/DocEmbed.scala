package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-free document embeddings — hashed bag of words through the
  * sign random projection: text → [[FeatureHash.denseBow]] counts over
  * `dim` md5 buckets → [[graft.functions.RandProj]] to an
  * `outDim`-component double vector. No external model, no network:
  * every text corpus gets an `embedding` column that unlocks the whole
  * embedding family ([[Similarity.knnGraph]]/stores, [[SemDedup]],
  * margin mining, IVF search) on raw text, approximating BoW cosine by
  * the JL guarantee (Achlioptas 2003 — the q98 projection). Cosine is
  * scale-invariant under the linear projection, so raw counts project
  * directly (no per-document normalization pass).
  *
  * Scale posture: one corpus shuffle (the denseBow pack, map-side
  * combined, per-group state bounded by `dim`) + one codegen'd kernel
  * call per row; the sign matrix rides the plan as a reference object.
  * Token-less documents embed as the zero vector — their cosine is
  * NaN/null against everything, the same contract as a zero embedding
  * from any encoder; gate empties upstream.
  *
  * Reproducibility: md5 buckets and the md5 sign matrix are
  * content-addressed (engine/rerun/cluster-size stable); count×(±scale)
  * products are exact (integer × power of two), summed in index order
  * by both the kernel and the oracle. */
object DocEmbed {

  /** (idCol, embedding array<double> of `outDim`). `outDim` must be a
    * power of four (the RandProj exact-scale contract) — and it is also
    * the LSH BUDGET of every downstream bucketed consumer: AutoBits
    * clamps bits·tables to the embedding width, so a 16-wide projection
    * caps the geometry at 8 bits/table and past ~2^8·targetBucket docs
    * the bucketed ANN paths hit the n²/2^bits candidate wall (measured:
    * knnGraph over 500 k 16-wide doc embeddings ran >10 min; 64-wide,
    * 78 s — §6.1). The default 64 carries 32 bits of two-table
    * geometry, enough past 10^11 documents; [[autoOutDim]] computes the
    * minimal width for a known corpus size. */
  def hashedProjection(df: DataFrame, textCol: String, idCol: String,
                       dim: Int = 128, outDim: Int = 64): DataFrame = {
    require(dim >= 1, s"DocEmbed: dim must be positive: $dim")
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    FeatureHash.denseBow(df, textCol, idCol, dim)
      .select(col(idCol),
        graft.functions.RandProj.randProj(
          col("features").cast("array<double>"), dim, outDim).as("embedding"))
  }

  /** One-call near-dup pruning in the DERIVED embedding space — the
    * lexical family's semantic-ish sibling with zero model dependency:
    * [[hashedProjection]] embeds every document, [[Similarity.lshNearDup]]
    * pairs the sign-LSH-colliding ones above `minCos` (skew-guarded
    * banding — an over-cap boilerplate bucket emits the min-id star),
    * [[Dedup.clusters]] closes components, and each cluster keeps its
    * minimum id. Catches reworded/reordered near-copies whose shingle
    * Jaccard collapses but whose BoW cosine survives — complementary to
    * [[Dedup.pruneNearDups]] (which sees phrase structure this
    * representation discards). All payload columns survive. The
    * family picker table — this vs shingle MinHash vs model-embedding
    * SemDedup, what each catches at what cost — lives at
    * [[Dedup.pruneNearDups]].
    *
    * CANDIDATE GEOMETRY (round-13 default): buckets are derived in the
    * CENTERED embedding space — [[Similarity.corpusCenter]]'s sampled
    * per-coordinate mean re-anchors every bucketing hyperplane — while
    * the `minCos` verification stays RAW BoW cosine, so thresholds keep
    * their meaning in both modes. Hashed-BoW sign buckets are the known
    * skewed family (common-word mass concentrates sign patterns —
    * measured ~12× candidate inflation at formula geometry, SURVEY §6);
    * centering removes exactly that shared offset, so the occupancy
    * settles AT the uniform formula bits ([[Similarity.AutoBits]], the
    * default here — no measurement pass) with balanced buckets: the
    * builder's frontier sweep (SURVEY §6.1) measured centered geometry
    * dominating raw at both scales — more true neighbors at ~40% less
    * candidate mass. Near-identical pairs (the ≥0.9 dedup regime) land
    * on the same side of almost every hyperplane wherever it is
    * anchored, so the dedup recall the star guard bounds is unaffected
    * (DedupSimilaritySpec measures centered recall ≥ raw against the
    * exact all-pairs truth; q206 pins the full default path incl. the
    * replayed sampled center). `centered = false` restores raw-space
    * buckets — pass [[Similarity.SkewAwareBits]] with it, or the
    * formula bits under-size the skewed occupancy. Explicit bits are
    * for parity pins only. The derived embedding frame is checkpointed:
    * center sampling, sizing, bucket stats, and both pairing branches
    * read it rather than re-running the BoW pack per consumer. */
  def pruneNearDups(df: DataFrame, textCol: String, idCol: String,
                    minCos: Double = 0.9, dim: Int = 128,
                    outDim: Int = 64, bits: Int = Similarity.AutoBits,
                    maxBucket: Int = 1024, centered: Boolean = true,
                    sampleK: Int = 65536): DataFrame = {
    val emb = hashedProjection(df, textCol, idCol, dim, outDim)
      .localCheckpoint()
    val center =
      if (centered) Similarity.corpusCenter(emb, idCol, "embedding", sampleK)
      else Nil
    val pairs = Similarity.lshNearDup(emb, idCol, "embedding",
      bits = bits, minCos = minCos, maxBucket = maxBucket, center = center)
    val losers = Dedup.clusters(pairs, s"${idCol}_a", s"${idCol}_b")
      .where(col("cluster") =!= col("node"))
      .select(col("node").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** [[hashedProjection]] + [[Similarity.corpusCenter]] +
    * [[graft.functions.Vectors.centered]] in ONE call — the
    * metric-consistent centering recipe (all-but-the-top; q192):
    * hashed-BoW projections carry the corpus's common-token offset, so
    * their sign buckets are skewed and their raw cosines compressed;
    * subtracting the per-coordinate mean removes the shared component,
    * the skew-aware occupancy scan settles AT the uniform formula bits
    * (measured, CenterScale/SURVEY §6 — no measurement pass needed in
    * production), and recall per candidate beats the raw pipeline.
    * Returns the centered frame AND the center itself — stamp the
    * latter beside any store built from the frame
    * ([[Similarity.writeKnnStore]]'s `center` slot or your own), and
    * center every future batch with the SAME vector. Downstream cosines
    * are CENTERED cosines — a different (better-contrasted) similarity
    * than [[hashedProjection]]'s raw BoW cosine; thresholds do not
    * carry over between the two. */
  def centeredProjection(df: DataFrame, textCol: String, idCol: String,
                         dim: Int = 128, outDim: Int = 64,
                         sampleK: Int = 65536): (DataFrame, Seq[Double]) = {
    val e = hashedProjection(df, textCol, idCol, dim, outDim)
      .localCheckpoint()
    val center = Similarity.corpusCenter(e, idCol, "embedding", sampleK)
    (e.select(col(idCol),
      graft.functions.Vectors.centered(col("embedding"), center)
        .as("embedding")), center)
  }

  /** Smallest power-of-four embedding width whose bit budget supports
    * the geometry [[Similarity.AutoBits]] wants for an n-document
    * corpus: tables·⌈log₂(n/targetBucket)⌉ ≤ outDim (the q161 sizing
    * discipline applied to the embedding WIDTH — see
    * [[hashedProjection]]). Floors at 16. */
  def autoOutDim(n: Long, tables: Int = 2, targetBucket: Int = 64): Int = {
    require(n >= 1 && tables >= 1 && targetBucket >= 1)
    val bits = math.max(1,
      math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) /
        math.log(2.0)).toInt)
    var w = 16
    while (w < tables * bits) w *= 4
    w
  }
}
