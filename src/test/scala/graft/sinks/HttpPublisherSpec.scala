package graft.sinks

import graft.SparkSpec

/** Round 18: the shipped conditional-PUT publisher raced both ways
  * against a REAL in-process HTTP server implementing the
  * `If-None-Match: *` contract over the same local directory the
  * table's filesystem reads — the exact two-doors-one-store shape of
  * an S3/GCS/ABFS deployment, so a cloud rollout is config-only. */
class HttpPublisherSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_httpub").toString
    new java.io.File(d).delete()
    d
  }

  /** Minimal conditional-PUT object store: PUT with `If-None-Match: *`
    * creates the object at the URL path iff absent (201), else 412.
    * Atomicity via a lock + createNewFile — one winner per name, like
    * the real stores. */
  private def withServer[A](body: (String, java.util.concurrent.atomic.AtomicInteger) => A): A = {
    val puts = new java.util.concurrent.atomic.AtomicInteger()
    val lock = new Object
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", { exchange =>
      try {
        val path = exchange.getRequestURI.getPath
        if (exchange.getRequestMethod == "PUT" &&
            "*" == exchange.getRequestHeaders.getFirst("If-None-Match") &&
            path.contains("_graft_log")) {
          puts.incrementAndGet()
          val bytes = exchange.getRequestBody.readAllBytes()
          val target = new java.io.File(path)
          val created = lock.synchronized {
            target.getParentFile.mkdirs()
            if (!target.createNewFile()) false
            else {
              java.nio.file.Files.write(target.toPath, bytes)
              true
            }
          }
          exchange.sendResponseHeaders(if (created) 201 else 412, -1)
        } else exchange.sendResponseHeaders(400, -1)
      } finally exchange.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}", puts)
    finally server.stop(0)
  }

  private def withHttpPublisher[A](base: String)(body: => A): A = {
    spark.conf.set("spark.graft.snapshots.logPublisher",
      "graft.sinks.HttpConditionalPublisher")
    spark.conf.set("spark.graft.snapshots.httpPublisher.base", base)
    try body finally {
      spark.conf.unset("spark.graft.snapshots.logPublisher")
      spark.conf.unset("spark.graft.snapshots.httpPublisher.base")
    }
  }

  test("commits publish through conditional PUT end-to-end (win path)") {
    withServer { (base, puts) =>
      withHttpPublisher(base) {
        val dir = freshDir()
        assert(Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir) == 1)
        assert(Snapshots.writeAppend(Seq((2L, "b")).toDF("id", "text"), dir) == 2)
        assert(puts.get() == 2, "every commit must route through the PUT door")
        assert(Snapshots.read(spark, dir).count() == 2)
        assert(Snapshots.versions(spark, dir).map(_.op) ==
          Seq("append", "append"))
      }
    }
  }

  test("a competitor's object wins the PUT precondition; the loser rebases (lose path)") {
    withServer { (base, _) =>
      withHttpPublisher(base) {
        val dir = freshDir()
        assert(Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir) == 1)
        val v1 = Snapshots.versions(spark, dir).last
        @volatile var fired = false
        Snapshots.racePoint = _ => if (!fired) {
          fired = true
          // the competitor materializes v2 at the store INSIDE our race
          // window — our PUT for v00002.json must hit 412, re-read, and
          // rebase onto the competitor's state
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
        val v3 = Snapshots.versions(spark, dir).last
        assert(v3.files.contains("ghost.parquet"),
          s"competitor's file dropped — lost update: ${v3.files}")
        assert(v1.files.forall(v3.files.contains) &&
          v3.files.size == v1.files.size + 2)
      }
    }
  }

  test("a non-2xx/412 answer fails the commit loudly; a missing base names its key") {
    // endpoint down: connection refused surfaces, nothing half-commits
    withHttpPublisher("http://127.0.0.1:1") {
      val dir = freshDir()
      intercept[Exception](
        Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), dir))
      assert(Snapshots.latestVersion(spark, dir).isEmpty)
    }
    // publisher configured but no base: the config key is named
    spark.conf.set("spark.graft.snapshots.logPublisher",
      "graft.sinks.HttpConditionalPublisher")
    try {
      val e = intercept[Exception](
        Snapshots.writeAppend(Seq((1L, "a")).toDF("id", "text"), freshDir()))
      assert(e.getMessage.contains("httpPublisher.base"), e.getMessage)
    } finally spark.conf.unset("spark.graft.snapshots.logPublisher")
  }
}
