package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Sign random projection: exact against an independent witness, narrow
  * plan, JL distance preservation good enough to drive ANN, bad outDim
  * rejected. */
class RandProjSpec extends SparkSpec {
  import spark.implicits._

  test("projected values match an independent Java witness exactly") {
    val emb = Tables.load(spark, sf(), "embeddings").limit(3)
    val got = emb.select($"vec_id",
        RandProj.randProj($"embedding", 64, 16).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val raw = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    raw.foreach { case (id, e) =>
      val expect = (0 until 16).map { j =>
        e.indices.foldLeft(0.0) { (s, i) =>
          val d = java.security.MessageDigest.getInstance("MD5")
            .digest(s"$i:$j".getBytes("UTF-8"))
          val v = e(i).toDouble
          s + (if ((d(0) & 0x80) != 0) v else -v) * 0.25
        }
      }
      assert(got(id) == expect, s"vec $id diverged")
    }
  }

  test("JL: projected cosine tracks full-width cosine on the fixtures") {
    val emb = Tables.load(spark, sf(), "embeddings").limit(60)
      .select($"vec_id", $"embedding",
        RandProj.randProj($"embedding", 64, 16).as("p"))
    val rows = emb.as[(Long, Seq[Float], Seq[Double])].collect()
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    // the JL statement proper: norms concentrate — E||p||^2 = ||e||^2,
    // relative sd ~ sqrt(2/outDim) (~0.35 at 16 dims), so 3 sigma is
    // a [0.5, 1.5] ratio band
    def norm(a: Seq[Double]): Double = math.sqrt(a.map(x => x * x).sum)
    rows.foreach { case (id, e, p) =>
      val ratio = norm(p) / norm(e.map(_.toDouble))
      assert(ratio > 0.5 && ratio < 1.5,
        f"vec $id norm ratio $ratio%.3f outside the JL band")
    }
    // and similarities still carry usable signal (noise sd ~ 1/sqrt(16)
    // dominates near-orthogonal pairs, so demand correlation, not equality)
    val pairs = for {
      i <- rows.indices; k <- (i + 1) until math.min(i + 6, rows.length)
    } yield (cos(rows(i)._2.map(_.toDouble), rows(k)._2.map(_.toDouble)),
      cos(rows(i)._3, rows(k)._3))
    val n = pairs.length.toDouble
    val (mx, my) = (pairs.map(_._1).sum / n, pairs.map(_._2).sum / n)
    val cov = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
    val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum)
    val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
    val r = cov / (sx * sy)
    assert(r > 0.25, f"projected similarity decorrelated: r = $r%.3f")
  }

  test("narrow plan; non-power-of-four outDim rejected") {
    val emb = Tables.load(spark, sf(), "embeddings")
    val plan = emb.select(RandProj.randProj($"embedding", 64, 16))
      .queryExecution.executedPlan
    val exchanges = collectPlan(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty, s"projection must be a narrow map:\n$plan")
    val e = intercept[Exception] {
      emb.select(RandProj.randProj($"embedding", 64, 8)).collect()
    }
    assert(e.getMessage.contains("power of four"))
  }
}
