package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BLAKE2b-256 against published test vectors (RFC 7693 algorithm;
  * vectors from the official BLAKE2 reference implementation).
  */
class Blake2bSpec extends SparkSpec {

  private def hex(s: String): String =
    Blake2b256.hexDigest(org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString

  test("known vectors: empty, 'abc', multi-block input") {
    assert(hex("") ==
      "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8")
    assert(hex("abc") ==
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    // > 128 bytes forces the multi-block compress path
    val long = "a" * 200
    assert(hex(long).length == 64)
    assert(hex(long) == hex(long)) // deterministic
    assert(hex("a" * 128) != hex("a" * 129)) // block boundary distinguishes
  }

  test("SQL surface via extensions; null propagates") {
    val r = spark.sql("SELECT blake2b_256('abc') AS h, blake2b_256(CAST(NULL AS STRING)) AS n").head()
    assert(r.getString(0) == "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    assert(r.isNullAt(1))
  }

  test("binary input hashes the raw bytes") {
    import spark.implicits._
    val viaBinary = Seq("abc").toDF("s")
      .select(org.apache.spark.sql.graft.Bridge.column(
        Blake2b256Expr(org.apache.spark.sql.graft.Bridge.expression(col("s").cast("binary")))))
      .head().getString(0)
    assert(viaBinary == hex("abc"))
  }
}
