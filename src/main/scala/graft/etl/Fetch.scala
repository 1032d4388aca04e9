package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import graft.sources.SecretProvider

/** The download half of W13 (`operations.py:649-656`): the reference
  * streams the bulk-export tarball to a local file with the API key as a
  * query parameter resolved from the secret manager. Re-expressed over
  * `java.net.URL` so any scheme the JVM knows works — `https://` against
  * the real endpoint, `file://` in the offline harness (the zero-egress
  * sandbox can exercise everything except the socket). Driver-side by
  * design: ONE export archive lands on shared storage, then
  * [[Pipelines.flatfilePipelineFromTar]] parses it in-engine — the
  * download is not the distributed part and never was.
  */
object Fetch {

  /** `url` + encoded query params — split out pure so the auth-param
    * assembly is testable without any endpoint. */
  def withQuery(url: String, params: Map[String, String]): String =
    if (params.isEmpty) url
    else {
      val enc = (s: String) =>
        java.net.URLEncoder.encode(s, "UTF-8")
      url + "?" + params.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    }

  /** `url` with its query string replaced by a marker — failures must
    * never echo auth params into logs or stack traces. */
  private[etl] def redacted(url: String): String = {
    val cut = url.indexOf('?')
    if (cut < 0) url else url.substring(0, cut) + "?<redacted>"
  }

  /** Stream `url` to `dest` (parents created), overwriting. Returns the
    * destination path. ≙ `requests.get(..., stream=True)` + file write.
    * Connect/read timeouts bound a stalled endpoint (the reference's
    * `requests` default would hang forever too — here it's explicit), and
    * any failure is rethrown with the query string redacted so a 404's
    * `FileNotFoundException(full-url)` cannot leak the `user_key`. */
  def download(url: String, dest: String,
               params: Map[String, String] = Map.empty,
               connectTimeoutMs: Int = 30000,
               readTimeoutMs: Int = 120000): Path = {
    val target = Paths.get(dest)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val full = withQuery(url, params)
    try {
      val conn = java.net.URI.create(full).toURL.openConnection()
      conn.setConnectTimeout(connectTimeoutMs)
      conn.setReadTimeout(readTimeoutMs)
      val in = conn.getInputStream
      try Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    } catch {
      case e: java.io.IOException =>
        throw new java.io.IOException(
          s"download failed: ${redacted(full)} (${e.getClass.getSimpleName})")
    }
    target
  }

  /** The reference's exact auth shape: the `user_key` query parameter
    * resolved through the [[SecretProvider]] seam (C1) — never a
    * hard-coded credential. */
  def downloadAuthed(url: String, dest: String, secrets: SecretProvider,
                     secretName: String,
                     paramName: String = "user_key"): Path =
    download(url, dest, Map(paramName -> secrets.get(secretName)))
}
