package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Margin-based bitext mining (Similarity.marginMine /
  * marginMineBucketed): hand-computed margins, strict-fold determinism,
  * id-ordered mutual-best ties, the single-bucket == exact differential
  * the scaladoc promises, planted-pair recall at realistic geometry, and
  * the no-cartesian plan pin for the bucketed scale path. */
class MarginMineSpec extends SparkSpec {

  import spark.implicits._

  private def df(rows: Seq[(Long, Seq[Double])]): DataFrame =
    rows.toDF("id", "emb")

  /** Deterministic LCG doubles in [-1, 1] (no Math.random in tests that
    * must reproduce). */
  private def rnd(seed0: Long, n: Int): Array[Double] = {
    var s = seed0
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
  }

  test("marginMine: hand-computed margins on a 2x2 corpus") {
    // cosines: (1,11)=1, (1,12)=0.6, (2,11)=0, (2,12)=0.8
    // avgA(1)=(1+0.6)/2=0.8  avgA(2)=0.4  avgB(11)=0.5  avgB(12)=0.7
    // margin(1,11)=1/0.65  margin(2,12)=0.8/0.55 — both mutual best
    val a = df(Seq(1L -> Seq(1.0, 0.0), 2L -> Seq(0.0, 1.0)))
    val b = df(Seq(11L -> Seq(1.0, 0.0), 12L -> Seq(0.6, 0.8)))
    val got = Similarity.marginMine(a, b, "id", "emb", k = 2, tau = 1.0)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2)).toSeq === Seq((1L, 11L), (2L, 12L)))
    assert(math.abs(got(0)._3 - 1.0 / 0.65) < 1e-9)
    assert(math.abs(got(1)._3 - 0.8 / 0.55) < 1e-9)
    // below-threshold pairs are cut: at tau above both margins, nothing
    assert(Similarity.marginMine(a, b, "id", "emb", k = 2, tau = 1.6).isEmpty)
  }

  test("marginMine: mutual-best margin ties break by id (both directions)") {
    // b1 and b2 are the same vector: margins tie exactly; forward argmax
    // for a1 must pick the smaller b_id, so only (1, 11) survives
    val a = df(Seq(1L -> Seq(1.0, 0.0)))
    val b = df(Seq(12L -> Seq(1.0, 0.0), 11L -> Seq(1.0, 0.0)))
    val got = Similarity.marginMine(a, b, "id", "emb", k = 2, tau = 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 11L)))
    // mirrored: two identical a's, one b — backward argmax picks a_id 1
    val got2 = Similarity.marginMine(b.toDF("id", "emb"), a.toDF("id", "emb"),
        "id", "emb", k = 2, tau = 0.5)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
    assert(got2 === Seq((11L, 1L)))
  }

  /** Plain-Scala reference of the whole margin algebra, mirroring the
    * library's strict-fold orders coordinate by coordinate. */
  private def refMine(a: Seq[(Long, Array[Double])], b: Seq[(Long, Array[Double])],
                      k: Int, tau: Double): Map[(Long, Long), Double] = {
    def dot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < math.min(x.length, y.length)) { s += x(i) * y(i); i += 1 }
      s
    }
    def cos(x: Array[Double], y: Array[Double]): Double =
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    val scored = for ((ia, va) <- a; (ib, vb) <- b if ia != ib)
      yield (ia, ib, cos(va, vb))
    def topBy(key: (Long, Long, Double) => Long, other: (Long, Long, Double) => Long) =
      scored.groupBy(t => key(t._1, t._2, t._3)).map { case (q, ps) =>
        q -> ps.sortBy(t => (-t._3, other(t._1, t._2, t._3))).take(k)
      }
    val topA = topBy((x, _, _) => x, (_, y, _) => y)
    val topB = topBy((_, y, _) => y, (x, _, _) => x)
    def mean(ps: Seq[(Long, Long, Double)], other: (Long, Long, Double) => Long) = {
      val o = ps.sortBy(t => (t._3, other(t._1, t._2, t._3)))
      o.foldLeft(0.0)((acc, t) => acc + t._3) / o.size.toDouble
    }
    val avgA = topA.map { case (q, ps) => q -> mean(ps, (_, y, _) => y) }
    val avgB = topB.map { case (q, ps) => q -> mean(ps, (x, _, _) => x) }
    val cand = (topA.values.flatten ++ topB.values.flatten).toSeq.distinct
    val m = cand.map { case (ia, ib, c) =>
      (ia, ib) -> c / ((avgA(ia) + avgB(ib)) / 2.0)
    }.toMap
    val fwd = m.groupBy(_._1._1).map { case (ia, ps) =>
      ia -> ps.toSeq.sortBy { case ((_, ib), mg) => (-mg, ib) }.head._1 }
    val bwd = m.groupBy(_._1._2).map { case (ib, ps) =>
      ib -> ps.toSeq.sortBy { case ((ia, _), mg) => (-mg, ia) }.head._1 }
    m.filter { case ((ia, ib), mg) =>
      fwd(ia) == (ia, ib) && bwd(ib) == (ia, ib) && mg >= tau }
  }

  test("marginMine == plain-Scala reference on a seeded 30x20 corpus") {
    val va = (0 until 30).map(i => (i * 2L, rnd(1000 + i, 6)))
    val vb = (0 until 20).map(i => (i * 2L + 1, rnd(9000 + i, 6)))
    val want = refMine(va, vb, k = 3, tau = 0.9)
    val got = Similarity.marginMine(
        df(va.map { case (i, v) => i -> v.toSeq }),
        df(vb.map { case (i, v) => i -> v.toSeq }),
        "id", "emb", k = 3, tau = 0.9)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet === want.keySet)
    for ((p, mg) <- want)
      assert(math.abs(got(p) - mg) < 1e-12, s"margin diverged at $p")
  }

  test("property: marginMine == reference across seeded geometries") {
    // the 30x20 differential generalized: corpus sizes, dims, k, tau all
    // vary across deterministic seeds — any strict-fold or argmax
    // divergence shows up as a margin or pair-set mismatch
    for ((seed, na, nb, dim, k, tau) <- Seq(
        (1, 8, 5, 3, 2, 0.8), (2, 15, 25, 4, 5, 1.0), (3, 40, 10, 8, 3, 1.1),
        (4, 12, 12, 5, 1, 0.5), (5, 25, 30, 6, 7, 0.95))) {
      val va = (0 until na).map(i => (i * 2L, rnd(seed * 1000 + i, dim)))
      val vb = (0 until nb).map(i => (i * 2L + 1, rnd(seed * 9000 + i, dim)))
      val want = refMine(va, vb, k = k, tau = tau)
      val got = Similarity.marginMine(
          df(va.map { case (i, v) => i -> v.toSeq }),
          df(vb.map { case (i, v) => i -> v.toSeq }),
          "id", "emb", k = k, tau = tau)
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(got.keySet === want.keySet,
        s"pair set diverged at seed=$seed (na=$na nb=$nb dim=$dim k=$k tau=$tau)")
      for ((p, mg) <- want)
        assert(math.abs(got(p) - mg) < 1e-12, s"margin diverged at $p, seed=$seed")
    }
  }

  test("marginMine is deterministic across runs (bit-identical margins)") {
    val e = Tables.load(spark, sf(), "embeddings")
    def run() = Similarity.marginMine(
        e.filter($"vec_id" % 2 === 0), e.filter($"vec_id" % 2 === 1),
        "vec_id", "embedding", k = 4, tau = 1.0)
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    val r1 = run(); val r2 = run()
    assert(r1.nonEmpty && r1 === r2)
  }

  test("marginMineBucketed == marginMine under single-bucket geometry") {
    // prepend a constant positive coordinate: bits=1/tables=1 reads only
    // it, so every vector lands in bucket "1" and the candidate set is
    // the full cross product — the scaladoc's exact-equivalence claim
    val e = Tables.load(spark, sf(), "embeddings")
      .select($"vec_id", concat(array(lit(1.0f)), $"embedding").as("embedding"))
    val a = e.filter($"vec_id" % 2 === 0)
    val b = e.filter($"vec_id" % 2 === 1)
    val exact = Similarity.marginMine(a, b, "vec_id", "embedding", k = 4, tau = 1.0)
    val bucketed = Similarity.marginMineBucketed(a, b, "vec_id", "embedding",
      k = 4, tau = 1.0, bits = 1, tables = 1)
    assert(exact.count() > 0)
    assert(exact.exceptAll(bucketed).isEmpty && bucketed.exceptAll(exact).isEmpty,
      "single-bucket mined pairs/margins must be bit-identical to exact")
  }

  test("id collisions across sides: both paths agree (self-pairs excluded)") {
    // contract violation (same ids on both sides) must not diverge the
    // two paths: the bucketed candidate join drops a_id == b_id, and
    // marginMine filters the same pairs
    val e = Tables.load(spark, sf(), "embeddings")
      .select($"vec_id", concat(array(lit(1.0f)), $"embedding").as("embedding"))
      .filter($"vec_id" < 60)
    val exact = Similarity.marginMine(e, e, "vec_id", "embedding", k = 3, tau = 0.8)
    val bucketed = Similarity.marginMineBucketed(e, e, "vec_id", "embedding",
      k = 3, tau = 0.8, bits = 1, tables = 1)
    assert(exact.filter($"a_id" === $"b_id").isEmpty)
    assert(exact.exceptAll(bucketed).isEmpty && bucketed.exceptAll(exact).isEmpty)
  }

  test("realistic geometry recovers planted translation pairs") {
    // 24 planted pairs: b_i is a_i scaled coordinate-wise by factors in
    // [0.98, 1.02] (signs preserved, so every table's bucket matches and
    // LSH recall on the planted pairs is exact); random inter-pair
    // cosines stay far below 1, so each planted pair is mutual best
    val dim = 16
    val base = (0 until 24).map { i =>
      rnd(42 + i, dim).map(x => math.signum(x) * (0.1 + 0.9 * math.abs(x)))
    }
    val a = (0 until 24).map(i => i.toLong -> base(i).toSeq)
    val b = (0 until 24).map { i =>
      val f = rnd(7000 + i, dim)
      (100L + i) -> base(i).zip(f).map { case (x, u) => x * (1.0 + 0.02 * u) }.toSeq
    }
    val planted = (0 until 24).map(i => (i.toLong, 100L + i)).toSet
    val exact = Similarity.marginMine(df(a), df(b), "id", "emb", k = 4, tau = 1.2)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val bucketed = Similarity.marginMineBucketed(df(a), df(b), "id", "emb",
        k = 4, tau = 1.2, bits = 4, tables = 2)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(exact === planted, "exact mining must recover exactly the planted pairs")
    // candidate recall on the planted pairs is exact (signs preserved),
    // but the per-endpoint k-NN means are means over CANDIDATE neighbors
    // only — margin distortion, not candidate loss, is the approximation
    // (seeded run: 21/24; the 3 losses each lose an argmax to a pair
    // whose endpoint's candidate mean is deflated)
    assert((bucketed & planted).size >= 20,
      s"bucketed mining lost too many planted pairs: ${(planted -- bucketed).toSeq.sorted}")
  }

  // ---- persistent margin store (repeated probes, shipped side) ----

  test("marginMineStore == from-scratch marginMineBucketed at the stamped geometry") {
    val e = Tables.load(spark, sf(), "embeddings")
    val a = e.filter($"vec_id" % 2 === 0).select($"vec_id", $"embedding")
    val b = e.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding")
    Seq("margin_spec_store_vectors", "margin_spec_store_sigs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    Similarity.writeMarginStore(a, "vec_id", "embedding",
      "margin_spec_store", bits = 8, tables = 2, buckets = 4)
    val viaStore = Similarity.marginMineStore(spark, "margin_spec_store",
      b, "vec_id", "embedding", k = 4, tau = 1.0)
    val scratch = Similarity.marginMineBucketed(a, b, "vec_id", "embedding",
      k = 4, tau = 1.0, bits = 8, tables = 2)
    assert(viaStore.count() > 0)
    assert(viaStore.exceptAll(scratch).isEmpty && scratch.exceptAll(viaStore).isEmpty,
      "store-probed mining must be bit-identical to the from-scratch bucketed run")
  }

  test("margin store: append == rebuild; double-append idempotent") {
    val e = Tables.load(spark, sf(), "embeddings")
    val a1 = e.filter($"vec_id" % 4 === 0).select($"vec_id", $"embedding")
    val a2 = e.filter($"vec_id" % 4 === 2).select($"vec_id", $"embedding")
    val b = e.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding")
    Seq("margin_spec_store2_vectors", "margin_spec_store2_sigs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    Similarity.writeMarginStore(a1, "vec_id", "embedding",
      "margin_spec_store2", bits = 8, tables = 2, buckets = 4)
    Similarity.appendToMarginStore(a2, "vec_id", "embedding", "margin_spec_store2")
    Similarity.appendToMarginStore(a2, "vec_id", "embedding", "margin_spec_store2")
    assert(spark.table("margin_spec_store2_vectors").count() ===
      a1.count() + a2.count(), "double-append must admit nothing new")
    val viaStore = Similarity.marginMineStore(spark, "margin_spec_store2",
      b, "vec_id", "embedding", k = 4, tau = 1.0)
    val scratch = Similarity.marginMineBucketed(a1.unionByName(a2), b,
      "vec_id", "embedding", k = 4, tau = 1.0, bits = 8, tables = 2)
    assert(viaStore.exceptAll(scratch).isEmpty && scratch.exceptAll(viaStore).isEmpty,
      "appended store must mine exactly what a rebuilt store mines")
  }

  test("margin store: sig-committed/vector-missing crash window converges") {
    // the scaladoc's crash discipline made executable: simulate a crash
    // between the sigs append and the vectors append by inserting an
    // orphan sig row directly, then (a) probes during the window drop
    // the orphan's candidates at the scoring join, and (b) a re-run of
    // the append converges (sig not duplicated, vector lands)
    val e = Tables.load(spark, sf(), "embeddings")
    val a = e.filter($"vec_id" % 2 === 0 && $"vec_id" =!= 0)
      .select($"vec_id", $"embedding")
    val orphan = e.filter($"vec_id" === 0).select($"vec_id", $"embedding")
    val b = e.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding")
    Seq("margin_spec_crash_vectors", "margin_spec_crash_sigs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    Similarity.writeMarginStore(a, "vec_id", "embedding",
      "margin_spec_crash", bits = 8, tables = 2, buckets = 4)
    // orphan sig rows: vec_id 0's REAL signatures (so candidates would
    // form), inserted without its vector — the crash window state
    val sigsOf0 = Seq(0, 1).map { t =>
      orphan.select($"vec_id", lit(t).as("__tbl"),
        graft.functions.Vectors.signBucketAt($"embedding", 8, t * 8)
          .as("__bucket"))
    }.reduce(_ unionByName _)
    sigsOf0.write.mode("append").insertInto("margin_spec_crash_sigs")
    val duringWindow = Similarity.marginMineStore(spark, "margin_spec_crash",
      b, "vec_id", "embedding", k = 4, tau = 1.0)
    val withoutOrphan = Similarity.marginMineBucketed(a, b,
      "vec_id", "embedding", k = 4, tau = 1.0, bits = 8, tables = 2)
    assert(duringWindow.exceptAll(withoutOrphan).isEmpty &&
      withoutOrphan.exceptAll(duringWindow).isEmpty,
      "an orphan sig must never mine a pair — the scoring join drops it")
    // retry the interrupted append: converges to the complete store
    Similarity.appendToMarginStore(orphan, "vec_id", "embedding",
      "margin_spec_crash")
    assert(spark.table("margin_spec_crash_sigs")
      .filter($"vec_id" === 0).count() === 2L,
      "the retried append must not duplicate the orphan's sigs")
    val after = Similarity.marginMineStore(spark, "margin_spec_crash",
      b, "vec_id", "embedding", k = 4, tau = 1.0)
    val complete = Similarity.marginMineBucketed(a.unionByName(orphan), b,
      "vec_id", "embedding", k = 4, tau = 1.0, bits = 8, tables = 2)
    assert(after.exceptAll(complete).isEmpty && complete.exceptAll(after).isEmpty,
      "post-retry probes must equal the complete from-scratch store")
  }

  test("margin store: probe fails fast on a missing geometry stamp") {
    val e = Tables.load(spark, sf(), "embeddings").limit(20)
    // an absent table fails at catalog lookup; an UNSTAMPED one must
    // fail at the stamp check, not silently mine nothing
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchTableException] {
      Similarity.marginMineStore(spark, "margin_no_such_store",
        e, "vec_id", "embedding", k = 2, tau = 1.0)
    }
    for (t <- Seq("margin_plain_vectors", "margin_plain_sigs")) {
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    e.select($"vec_id", $"embedding").write.saveAsTable("margin_plain_vectors")
    e.select($"vec_id", lit(0).as("__tbl"), lit("0").as("__bucket"))
      .write.saveAsTable("margin_plain_sigs")
    val ex = intercept[IllegalStateException] {
      Similarity.marginMineStore(spark, "margin_plain",
        e, "vec_id", "embedding", k = 2, tau = 1.0)
    }
    assert(ex.getMessage.contains("stamp"))
  }

  test("margin store: candidate join plans zero exchanges on the store sigs side") {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    val e = Tables.load(spark, sf(), "embeddings")
    val a = e.filter($"vec_id" % 2 === 0).select($"vec_id", $"embedding")
    val b = e.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding").limit(50)
    Seq("margin_spec_store3_vectors", "margin_spec_store3_sigs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    Similarity.writeMarginStore(a, "vec_id", "embedding",
      "margin_spec_store3", bits = 8, tables = 2, buckets = 4)
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(kk => kk -> spark.conf.getOption(kk))
    try {
      saved.foreach { case (kk, _) => spark.conf.set(kk, "-1") }
      val got = Similarity.marginMineStore(spark, "margin_spec_store3",
        b, "vec_id", "embedding", k = 4, tau = 1.0)
      got.collect()
      val joins = collectPlan(got.queryExecution.executedPlan) {
        case j if j.nodeName.contains("SortMergeJoin") &&
          j.toString.contains("margin_spec_store3_sigs") => j
      }
      assert(joins.nonEmpty, "candidate join must plan as SMJ over the bucketed sigs")
      // the sigs scan side must carry no exchange (left child holds the
      // store side: storeSigs is the left frame in marginMineStore)
      val storeSide = joins.flatMap(j => j.children.headOption)
      val exchanges = storeSide.flatMap(_.collect {
        case ex: ShuffleExchangeLike => ex
        case ex: BroadcastExchangeLike => ex
      })
      assert(exchanges.isEmpty,
        s"the shipped corpus's signatures must never re-shuffle: $exchanges")
    } finally saved.foreach {
      case (kk, Some(v)) => spark.conf.set(kk, v)
      case (kk, None) => spark.conf.unset(kk)
    }
  }

  test("marginMineBucketed plan has no cartesian / nested-loop join") {
    val e = Tables.load(spark, sf(), "embeddings")
    val plan = Similarity.marginMineBucketed(
        e.filter($"vec_id" % 2 === 0), e.filter($"vec_id" % 2 === 1),
        "vec_id", "embedding", k = 4, tau = 1.0, bits = 8, tables = 2)
      .queryExecution.executedPlan
    val bad = collectPlan(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, "bucketed margin mining must never cross-join corpora")
  }

  test("marginMine: over-budget b fails fast naming the bucketed path; " +
      "marginMineBucketed accepts the same input") {
    val e = Tables.load(spark, sf(), "embeddings")
    val a = e.filter($"vec_id" % 2 === 0).select($"vec_id", $"embedding")
    val b = e.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.marginMine(a, b, "vec_id", "embedding", k = 4, tau = 1.0,
        maxBRows = 10)
    }
    assert(ex.getMessage.contains("marginMineBucketed"),
      s"budget error must point at the scale path: ${ex.getMessage}")
    // the same frames run fine through the bucketed path (no budget —
    // nothing broadcasts) and through the exact path at an adequate one
    assert(Similarity.marginMineBucketed(a, b, "vec_id", "embedding",
      k = 4, tau = 1.0, bits = 8, tables = 2).count() > 0)
    assert(Similarity.marginMine(a, b, "vec_id", "embedding", k = 4,
      tau = 1.0).count() > 0)
  }

  test("margin store: append resolves the STORED id column " +
      "(differently-named batch id appends cleanly)") {
    val e = Tables.load(spark, sf(), "embeddings")
    val a1 = e.filter($"vec_id" % 4 === 0).select($"vec_id", $"embedding")
    val a2 = e.filter($"vec_id" % 4 === 2)
      .select($"vec_id".as("other_id"), $"embedding".as("vec"))
    val b = e.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding")
    Seq("margin_spec_rename_vectors", "margin_spec_rename_sigs")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    Similarity.writeMarginStore(a1, "vec_id", "embedding",
      "margin_spec_rename", bits = 8, tables = 2, buckets = 4)
    Similarity.appendToMarginStore(a2, "other_id", "vec",
      "margin_spec_rename")
    assert(spark.table("margin_spec_rename_vectors").count() ===
      a1.count() + a2.count())
    val viaStore = Similarity.marginMineStore(spark, "margin_spec_rename",
      b, "vec_id", "embedding", k = 4, tau = 1.0)
    val scratch = Similarity.marginMineBucketed(
      a1.unionByName(a2.toDF("vec_id", "embedding")), b,
      "vec_id", "embedding", k = 4, tau = 1.0, bits = 8, tables = 2)
    assert(viaStore.exceptAll(scratch).isEmpty &&
      scratch.exceptAll(viaStore).isEmpty,
      "a renamed-column append must land in the stored schema exactly")
  }
}
