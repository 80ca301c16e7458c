package graft.streaming

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.security.{KeyFactory, KeyStore, PrivateKey}
import java.security.cert.{Certificate, CertificateFactory}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}
import scala.jdk.CollectionConverters._

/** TLS material loading for the SSE endpoint: the reference serves
  * optional TLS from PEM files named by `SSLCertificateFile` /
  * `SSLKeyFile` (evtstrd/config.py:20-28,47-50) via
  * `ssl.create_default_context(CLIENT_AUTH).load_cert_chain(cert, key)`
  * (evtstrd/http_server.py:49-56). The JVM analog: parse the PEM
  * certificate chain + unencrypted PKCS#8 private key into an
  * in-memory keystore backing an SSLContext.
  */
object Tls {

  private def pemBlocks(pem: String, header: String): Seq[Array[Byte]] = {
    val re =
      ("(?s)-----BEGIN " + header + "-----(.*?)-----END " + header + "-----").r
    re.findAllMatchIn(pem)
      .map(m => Base64.getMimeDecoder.decode(m.group(1).trim))
      .toSeq
  }

  /** Unencrypted PKCS#8 key ("BEGIN PRIVATE KEY"); algorithm probed
    * RSA -> EC -> Ed25519 (the PKCS#8 envelope carries the OID, but
    * KeyFactory needs the name up front).
    */
  def loadPrivateKey(keyFile: String): PrivateKey = {
    val pem = Files.readString(Path.of(keyFile))
    val der = pemBlocks(pem, "PRIVATE KEY").headOption.getOrElse(
      throw new IllegalArgumentException(
        s"$keyFile: no PKCS#8 'BEGIN PRIVATE KEY' block " +
          "(encrypted or PKCS#1 keys are not supported)"))
    val spec = new PKCS8EncodedKeySpec(der)
    val attempts = Seq("RSA", "EC", "Ed25519").iterator
      .map { alg =>
        try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
        catch { case _: Exception => None }
      }
    attempts.collectFirst { case Some(k) => k }.getOrElse(
      throw new IllegalArgumentException(
        s"$keyFile: private key is not RSA/EC/Ed25519"))
  }

  def loadCertificates(certFile: String): Array[Certificate] = {
    val pem = Files.readString(Path.of(certFile))
    val cf = CertificateFactory.getInstance("X.509")
    val certs = cf
      .generateCertificates(
        new ByteArrayInputStream(pem.getBytes(StandardCharsets.US_ASCII)))
      .asScala.toArray[Certificate]
    if (certs.isEmpty)
      throw new IllegalArgumentException(s"$certFile: no certificates")
    certs
  }

  /** Server-side context from a PEM cert chain + PKCS#8 key (the
    * `load_cert_chain` analog).
    */
  def serverContext(certFile: String, keyFile: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    ks.setKeyEntry(
      "server", loadPrivateKey(keyFile), Array.emptyCharArray,
      loadCertificates(certFile))
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, Array.emptyCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client context trusting exactly the given PEM certificate(s) —
    * for tests against the self-signed fixture.
    */
  def clientContext(certFile: String): SSLContext = {
    val ks = KeyStore.getInstance("PKCS12")
    ks.load(null, null)
    loadCertificates(certFile).zipWithIndex.foreach { case (c, i) =>
      ks.setCertificateEntry(s"ca$i", c)
    }
    val tmf =
      TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(ks)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }
}
