package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** REFERENCE conditional-write [[LogPublisher]] (r18) — the in-repo
  * implementation of the pattern the commit fail-fast message asks
  * object-store deployments to supply: publish the prepared log entry
  * with ONE conditional HTTP `PUT` carrying `If-None-Match: *`, the
  * generic create-if-absent precondition every major object store
  * exposes over its REST door (S3 honors exactly this header on PUT;
  * GCS expresses it as `ifGenerationMatch=0`, ABFS as an ETag `*`
  * precondition — both reachable by pointing `base` at a translating
  * gateway or sidecar, which is also where request signing lives).
  *
  * {{{
  *   spark.conf.set("spark.graft.snapshots.logPublisher",
  *     "graft.sinks.HttpConditionalPublisher")
  *   spark.conf.set("spark.graft.snapshots.httpPublisher.base",
  *     "https://bucket.s3.us-east-1.amazonaws.com")
  * }}}
  *
  * The object key is the destination path (`<base> + dest.toUri.path`),
  * so the HTTP endpoint and the table's Hadoop filesystem must be two
  * doors onto the SAME store — the PUT that wins the race materializes
  * exactly the object every later `fs.open` of the log reads. Outcome
  * mapping, per the [[LogPublisher]] contract:
  *
  *  - 2xx → this call created the object: WON;
  *  - 412 Precondition Failed (or 409, GCS's spelling) → the name
  *    already exists: LOST — the commit loop rebases/conflicts;
  *  - anything else (auth, throttle, 5xx) → IOException: the commit
  *    FAILS LOUDLY rather than guessing (a retry re-enters the loop
  *    from a fresh read of latest, so nothing is half-committed).
  *
  * A single PUT is atomic at the store, so no torn entry is ever
  * visible — the same one-shot-exclusive shape as link(2)/HDFS rename,
  * just spelled in HTTP. Raced both ways through the public commit
  * path by HttpPublisherSpec against a real in-process HTTP server. */
class HttpConditionalPublisher extends LogPublisher {

  override def publishExclusive(fs: FileSystem, tmp: Path,
                                dest: Path): Boolean = {
    val base = SparkSession.active.conf
      .getOption(HttpConditionalPublisher.BaseKey)
      .map(_.stripSuffix("/"))
      .getOrElse(throw new IllegalArgumentException(
        s"${HttpConditionalPublisher.BaseKey} must point at the " +
          "store's conditional-PUT endpoint when " +
          "graft.sinks.HttpConditionalPublisher is the configured " +
          "logPublisher"))
    val bytes = {
      val in = fs.open(tmp)
      try in.readAllBytes() finally in.close()
    }
    val uri = java.net.URI.create(base + dest.toUri.getRawPath)
    val req = java.net.http.HttpRequest.newBuilder(uri)
      .header("If-None-Match", "*")
      .header("Content-Type", "application/json")
      .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(bytes))
      .build()
    val resp = HttpConditionalPublisher.client.send(req,
      java.net.http.HttpResponse.BodyHandlers.discarding())
    resp.statusCode() match {
      case c if c / 100 == 2 => true
      case 412 | 409 => false
      case c => throw new java.io.IOException(
        s"conditional PUT $uri returned HTTP $c — cannot tell won from " +
          "lost; failing the commit attempt (re-run re-reads latest)")
    }
  }
}

object HttpConditionalPublisher {
  private[sinks] val BaseKey = "spark.graft.snapshots.httpPublisher.base"
  private[sinks] lazy val client: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(30)).build()
}
