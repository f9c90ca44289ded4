package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import graft.SparkSpec

/** A conditional-put publisher with an injectable claim set — the
  * object-store LogStore shape (S3 If-None-Match / GCS
  * ifGenerationMatch=0): the atomic primitive is "claim this dest name
  * exactly once"; the spec pre-claims a name to force the LOSE path
  * deterministically. Top-level object so the config key resolves it
  * by name through the reflective seam, exactly as a deployment's
  * publisher would load. */
object TestCondPutPublisher extends LogPublisher {
  val claimed: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val calls = new java.util.concurrent.atomic.AtomicInteger()
  def reset(): Unit = { claimed.clear(); calls.set(0) }
  override def publishExclusive(fs: FileSystem, tmp: Path,
                                dest: Path): Boolean = {
    calls.incrementAndGet()
    // the conditional put: exactly one caller ever claims a dest name
    if (!claimed.add(dest.getName)) false
    else { require(fs.rename(tmp, dest), s"materialize failed: $dest"); true }
  }
}

/** The local raw filesystem re-badged under an unknown scheme — lets a
  * spec drive the REAL fail-fast path (no built-in publisher, no
  * config) and then fix it by supplying one, all on local disk. */
class MockSchemeFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mock"
  override def getUri: java.net.URI = java.net.URI.create("mock:///")
}

/** The LogStore seam raced two ways THROUGH THE PUBLIC COMMIT PATH:
  * a configured conditional-put publisher wins a clean commit, and
  * when a competitor claims the version first the commit loop loses,
  * retries, and REBASES — the multi-writer guarantee an object-store
  * deployment buys by supplying a publisher instead of accepting
  * single-writer-only operation. */
class LogPublisherSpec extends SparkSpec {
  import spark.implicits._

  private val ConfKey = "spark.graft.snapshots.logPublisher"

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_pub").toString
    new java.io.File(d).delete()
    d
  }

  private def withPublisher[A](body: => A): A = {
    TestCondPutPublisher.reset()
    spark.conf.set(ConfKey, "graft.sinks.TestCondPutPublisher")
    try body finally spark.conf.unset(ConfKey)
  }

  test("configured publisher carries commits end-to-end (win path)") {
    withPublisher {
      val dir = freshDir()
      assert(Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir) == 1)
      assert(Snapshots.writeAppend(Seq((2L, "b")).toDF("id", "text"), dir) == 2)
      assert(TestCondPutPublisher.calls.get() == 2,
        "every commit must route through the configured seam")
      assert(Snapshots.read(spark, dir).count() == 2)
    }
  }

  test("losing the conditional put retries and REBASES (lose path)") {
    withPublisher {
      val dir = freshDir()
      assert(Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir) == 1)
      val v1 = Snapshots.versions(spark, dir).last
      // the competitor wins the conditional put for v2: the name is
      // pre-claimed at the store, and its entry materializes INSIDE
      // our race window (after we read latest=v1, before we publish)
      // via the deterministic racePoint seam — our publish for
      // v00002.json must LOSE through the seam, re-read, and rebase
      TestCondPutPublisher.claimed.add("v00002.json")
      @volatile var fired = false
      Snapshots.racePoint = _ => if (!fired) {
        fired = true
        java.nio.file.Files.writeString(
          new java.io.File(new java.io.File(dir, "_graft_log"),
            "v00002.json").toPath,
          s"""{"version":2,"op":"append","files":[""" +
            (v1.files :+ "ghost.parquet").map(f => "\"" + f + "\"")
              .mkString(",") + s"""],"schema":${v1.schema.get.json}}""")
      }
      try assert(
        Snapshots.writeAppend(Seq((2L, "b")).toDF("id", "text"), dir) == 3)
      finally Snapshots.racePoint = _ => ()
      assert(fired, "the race window hook must have fired")
      assert(TestCondPutPublisher.calls.get() >= 3,
        "the losing attempt and the winning retry both go through the seam")
      val v3 = Snapshots.versions(spark, dir).last
      assert(v3.files.contains("ghost.parquet"),
        s"competitor's file dropped — lost update through the seam: ${v3.files}")
      assert(v1.files.forall(v3.files.contains) &&
        v3.files.size == v1.files.size + 2)
    }
  }

  test("unknown scheme fail-fast names the publisher config key and the escape") {
    // a real FileSystem with a scheme the built-ins don't know: local
    // raw fs re-badged as mock:// — data lands fine, the COMMIT must
    // fail fast naming both deployment choices
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mock.impl", "graft.sinks.MockSchemeFs")
    val local = java.nio.file.Files.createTempDirectory("graft_mockfs")
    val dir = s"mock://$local/table"
    val e = intercept[IllegalArgumentException](
      Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir))
    assert(e.getMessage.contains("spark.graft.snapshots.logPublisher") &&
      e.getMessage.contains("allowNonAtomicPublish") &&
      e.getMessage.contains("'mock'"), e.getMessage)
    // the same table COMMITS once a publisher is supplied — the seam
    // turns single-writer-only-or-nothing into a deployment choice
    withPublisher {
      assert(Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir) == 1)
      assert(Snapshots.read(spark, dir).count() == 1)
    }
  }

  test("misconfigured publisher class is named in the failure") {
    TestCondPutPublisher.reset()
    spark.conf.set(ConfKey, "java.lang.String")
    try {
      val e = intercept[Exception](
        Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), freshDir()))
      assert(e.getMessage.contains("java.lang.String") &&
        e.getMessage.contains("LogPublisher"), e.getMessage)
    } finally spark.conf.unset(ConfKey)
  }
}
