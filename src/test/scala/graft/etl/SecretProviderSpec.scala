package graft.etl

import graft.sources._
import org.scalatest.funsuite.AnyFunSuite

/** C1 (connections.py:23-39): the reference reads the LATEST version of a
  * named secret from a versioned secret manager. The file-backed provider
  * makes those semantics executable offline; this spec pins them.
  */
class SecretProviderSpec extends AnyFunSuite {

  private def fresh() =
    FileSecretProvider(s"/tmp/graft-secrets-${System.nanoTime()}")

  test("default read resolves the latest version after rotation") {
    val p = fresh()
    assert(p.addVersion("db_pw", "hunter2") == 1L)
    assert(p.get("db_pw") == "hunter2")
    assert(p.addVersion("db_pw", "correct-horse") == 2L)
    // the reference's /versions/latest path: rotation changes the default
    assert(p.get("db_pw") == "correct-horse")
  }

  test("pinned historical versions stay readable after rotation") {
    val p = fresh()
    p.addVersion("api_key", "v1-payload")
    p.addVersion("api_key", "v2-payload")
    assert(p.getVersion("api_key", 1L) == "v1-payload")
    assert(p.getVersion("api_key", 2L) == "v2-payload")
  }

  test("payload bytes are returned verbatim (no trimming)") {
    val p = fresh()
    p.addVersion("pem", "line1\nline2\n")
    assert(p.get("pem") == "line1\nline2\n")
  }

  test("missing secret and missing version fail loudly") {
    val p = fresh()
    assertThrows[IllegalArgumentException](p.get("nope"))
    p.addVersion("one", "x")
    assertThrows[IllegalArgumentException](p.getVersion("one", 2L))
  }

  test("versions are independent per secret name") {
    val p = fresh()
    p.addVersion("a", "a1")
    p.addVersion("b", "b1")
    p.addVersion("a", "a2")
    assert(p.get("a") == "a2")
    assert(p.get("b") == "b1")
  }
}
