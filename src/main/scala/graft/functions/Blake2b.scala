package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BLAKE2b-256 (RFC 7693) — the one hash the reference's test-data
  * generator uses that Spark lacks a built-in for (reference:
  * tests/tests/mix_data_test.rs:91-95 hashes with blake2; SURVEY.md §7.3
  * lists it as the required scalar extension; `sha2` is built-in).
  *
  * Pure-JVM implementation of the sequential, unkeyed 256-bit variant,
  * exposed as a codegen-friendly Catalyst expression (one static call per
  * row — stays inside whole-stage codegen like the other graft kernels).
  */
object Blake2b256 {

  private val IV: Array[Long] = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3))

  @inline private def rotr64(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def g(v: Array[Long], a: Int, b: Int, c: Int, dd: Int, x: Long, y: Long): Unit = {
    v(a) = v(a) + v(b) + x
    v(dd) = rotr64(v(dd) ^ v(a), 32)
    v(c) = v(c) + v(dd)
    v(b) = rotr64(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + y
    v(dd) = rotr64(v(dd) ^ v(a), 16)
    v(c) = v(c) + v(dd)
    v(b) = rotr64(v(b) ^ v(c), 63)
  }

  private def compress(h: Array[Long], block: Array[Byte], off: Int, t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t                    // low word of the offset counter
    // v(13) ^= t_hi — inputs < 2^64 bytes, high word stays 0
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 12) {
      val s = SIGMA(r)
      g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** 32-byte BLAKE2b-256 digest of `input`. */
  def digest(input: Array[Byte]): Array[Byte] = {
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ 32L // digest_length=32, fanout=1, depth=1
    val len = input.length
    if (len > 128) {
      var off = 0
      while (len - off > 128) {
        compress(h, input, off, off + 128L, last = false)
        off += 128
      }
      val lastBlock = new Array[Byte](128)
      System.arraycopy(input, off, lastBlock, 0, len - off)
      compress(h, lastBlock, 0, len.toLong, last = true)
    } else {
      val block = new Array[Byte](128)
      System.arraycopy(input, 0, block, 0, len)
      compress(h, block, 0, len.toLong, last = true)
    }
    val out = new Array[Byte](32)
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 8) { out(i * 8 + j) = ((h(i) >>> (8 * j)) & 0xff).toByte; j += 1 }
      i += 1
    }
    out
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** Lowercase-hex digest of a UTF8String (codegen entry point). */
  def hexDigest(s: UTF8String): UTF8String = {
    val d = digest(s.getBytes)
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  def hexDigestBytes(b: Array[Byte]): UTF8String = {
    val d = digest(b)
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** blake2b_256(expr): lowercase-hex BLAKE2b-256 of a STRING or BINARY. */
case class Blake2b256Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"blake2b_256 requires STRING or BINARY, got ${other.sql}")
  }
  override def nullSafeEval(input: Any): Any = child.dataType match {
    case StringType => Blake2b256.hexDigest(input.asInstanceOf[UTF8String])
    case BinaryType => Blake2b256.hexDigestBytes(input.asInstanceOf[Array[Byte]])
    case _          => throw new IllegalStateException("unreachable")
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Blake2b256.hexDigest($c)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"graft.functions.Blake2b256.hexDigestBytes($c)")
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
