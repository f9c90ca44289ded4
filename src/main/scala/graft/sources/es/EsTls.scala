package graft.sources.es

import java.io.ByteArrayInputStream
import java.nio.file.{Files, Path, Paths}
import java.security.cert.{CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec
import java.security.{KeyFactory, KeyStore, PrivateKey, SecureRandom}
import java.util.Base64
import javax.net.ssl._
import scala.jdk.CollectionConverters._

/** TLS context construction for the live source — the reference's x509
  * surface (dump-es-parquet:71-83): client cert + key for mutual TLS,
  * a CA path for private trust anchors, and a verify-off switch.
  *
  * PEM handling is JDK-only: certificates via `CertificateFactory`
  * (which reads PEM natively) and private keys as PKCS#8
  * (`BEGIN PRIVATE KEY`) tried against RSA then EC.
  */
object EsTls {

  def sslContext(conf: EsHttpConfig): SSLContext = {
    val kms: Array[KeyManager] = (conf.cert, conf.key) match {
      case (Some(c), Some(k)) => keyManagers(Paths.get(c), Paths.get(k))
      case (None, None)       => null
      case _ => throw new IllegalArgumentException(
        "client cert and key must be provided together")
    }
    val tms: Array[TrustManager] =
      if (!conf.verifyCerts) Array(trustAll)
      else conf.caPath.map(p => trustManagers(Paths.get(p))).orNull
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kms, tms, new SecureRandom())
    ctx
  }

  /** Client identity: PEM cert chain + PKCS#8 PEM key -> in-memory keystore. */
  private def keyManagers(certPem: Path, keyPem: Path): Array[KeyManager] = {
    val chain = readCerts(certPem)
    val key = readPkcs8Key(keyPem)
    val ks = KeyStore.getInstance(KeyStore.getDefaultType)
    ks.load(null, null)
    ks.setKeyEntry("client", key, Array.emptyCharArray, chain.toArray)
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    kmf.getKeyManagers
  }

  /** Trust anchors from a PEM file or a directory of PEM files. */
  private def trustManagers(caPath: Path): Array[TrustManager] = {
    val files =
      if (Files.isDirectory(caPath))
        Files.list(caPath).iterator().asScala.filter(Files.isRegularFile(_)).toSeq
      else Seq(caPath)
    val ks = KeyStore.getInstance(KeyStore.getDefaultType)
    ks.load(null, null)
    files.flatMap(readCerts).zipWithIndex.foreach { case (c, i) =>
      ks.setCertificateEntry(s"ca$i", c)
    }
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    tmf.getTrustManagers
  }

  private def readCerts(pem: Path): Seq[X509Certificate] = {
    val cf = CertificateFactory.getInstance("X.509")
    cf.generateCertificates(new ByteArrayInputStream(Files.readAllBytes(pem)))
      .asScala.toSeq.map(_.asInstanceOf[X509Certificate])
  }

  private def readPkcs8Key(pem: Path): PrivateKey = {
    val text = Files.readString(pem)
    val body = text.linesIterator
      .filterNot(l => l.startsWith("-----") || l.isBlank).mkString
    val spec = new PKCS8EncodedKeySpec(Base64.getDecoder.decode(body))
    def tryAlg(alg: String) =
      try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
      catch { case _: Exception => None }
    tryAlg("RSA").orElse(tryAlg("EC")).getOrElse(throw new IllegalArgumentException(
      s"$pem: not a PKCS#8 RSA/EC private key (use 'BEGIN PRIVATE KEY' format)"))
  }

  /** --no-verify-certs: accept any chain AND any hostname (the reference
    * passes verify_certs=False straight to the client, which disables
    * both). Must be an X509ExtendedTrustManager: a plain X509TrustManager
    * gets wrapped by JSSE with endpoint identification still enforced, so
    * the flag's primary use case — self-signed certs whose SAN doesn't
    * match the address — would keep failing on the hostname check. The
    * engine/socket overloads below are the ones the wrapper would have
    * added; leaving them empty skips the identity check too. */
  private def trustAll: X509TrustManager = new X509ExtendedTrustManager {
    override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
    override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
    override def checkClientTrusted(c: Array[X509Certificate], a: String,
                                    s: java.net.Socket): Unit = ()
    override def checkServerTrusted(c: Array[X509Certificate], a: String,
                                    s: java.net.Socket): Unit = ()
    override def checkClientTrusted(c: Array[X509Certificate], a: String,
                                    e: SSLEngine): Unit = ()
    override def checkServerTrusted(c: Array[X509Certificate], a: String,
                                    e: SSLEngine): Unit = ()
    override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
  }
}
