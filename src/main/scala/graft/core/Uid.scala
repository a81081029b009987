package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{sha2, substring}

/** Deterministic entity UID: lowercase-hex `sha256(utf8(name))[:16]`.
  *
  * Matches the reference byte-for-byte (`facilities.py:36-38`,
  * `waste_items.py:61-63`) — the idempotent-MERGE contract depends on
  * cross-run id stability, so this is the first tested unit (SURVEY §7 M0).
  * Pure built-in composition → whole-stage codegen, no UDF.
  */
object Uid {
  def uid(name: Column): Column = substring(sha2(name, 256), 1, 16)

  /** Driver-side twin of [[uid]] — same bytes, for expectations and
    * key pre-computation outside a plan. */
  def uidOf(name: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(name.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString.substring(0, 16)
  }
}
