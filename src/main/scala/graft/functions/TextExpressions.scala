package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared text-shingling kernel for the native MinHash expressions.
  *
  * Semantics contract (bit-compatible with the declarative SQL forms and the
  * DuckDB oracle):
  *  - tokens = text split on single spaces, trailing empties kept
  *    (= Spark `split(text, ' ')` / DuckDB `string_split`);
  *  - shingles = word 3-grams joined with ' ' (= `concat_ws`), none for
  *    docs under 3 tokens;
  *  - base hash = first 13 hex chars of md5(shingle) as a 52-bit integer
  *    (= `conv(substr(md5(g),1,13),16,10)`), read directly from the digest
  *    bytes — no hex-string round trip;
  *  - minhash_j = min over shingles of (base·(37+101j) + 1009j) mod 1e9+7,
  *    computed as ((base mod p)·(37+101j) + 1009j) mod p — identical values
  *    (modular arithmetic), but the reduced base < 2^30 keeps products in
  *    exact int64 at ANY signature width, not just j ≤ 19.
  *
  * Why native: the declarative pipeline (split → transform/concat_ws →
  * md5 → conv → aggregate fold) runs in interpreted higher-order-function
  * evaluation — measured ~3.3 s for 5 000 docs / 260 K shingles at sf0.1.
  * This kernel is one tight JIT'd loop per row with a reused MessageDigest
  * and zero intermediate arrays. Same operator, ~20× less CPU — the §2.7
  * "custom Expression beats UDF beats everything" ladder in practice.
  */
object ShingleKernel {

  val MixP = 1000000007L
  def mixA(j: Int): Long = 37L + 101L * j
  def mixB(j: Int): Long = 1009L * j

  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 52-bit base hash of one shingle (first 13 md5 hex nibbles). */
  def baseHash(shingle: String): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // first 12 nibbles = bytes 0..5, 13th nibble = high half of byte 6
    var v = 0L
    var i = 0
    while (i < 6) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(6) & 0xf0L) >>> 4)
  }

  private def shingleLoop(text: UTF8String)(f: Long => Unit): Unit = {
    val toks = text.toString.split(" ", -1)
    if (toks.length >= 3) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - 3) {
        sb.setLength(0)
        sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
        f(baseHash(sb.toString))
        i += 1
      }
    }
  }

  /** k MinHash values; empty array when the doc has no shingles.
    *
    * The base hash is reduced mod P BEFORE mixing: (h·A_j + B_j) mod P ≡
    * ((h mod P)·A_j + B_j) mod P exactly (so every value produced at the
    * historical k ≤ 20 is bit-unchanged), and with h mod P < 2³⁰ the
    * product stays in exact int64 for ANY supported j — the raw 52-bit
    * base overflowed 2⁶³ from j = 20 (A_j ≥ 2057), silently wrapping in
    * the JVM while DuckDB raised, which is why production widths
    * (k = 64-128) were previously out of reach.
    */
  def minhash(text: UTF8String, k: Int): GenericArrayData = {
    val mins = Array.fill(k)(MixP)
    var any = false
    shingleLoop(text) { h =>
      any = true
      val hm = h % MixP
      var j = 0
      while (j < k) {
        val v = (hm * mixA(j) + mixB(j)) % MixP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
    }
    if (!any) new GenericArrayData(Array.empty[Long])
    else new GenericArrayData(mins)
  }

  /** Distinct shingle base hashes, sorted ascending (a canonical set
    * representation both engines can reproduce).
    */
  def shingleHashes(text: UTF8String): GenericArrayData = {
    val set = new java.util.TreeSet[java.lang.Long]()
    shingleLoop(text)(h => { set.add(h); () })
    val out = new Array[Long](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Merge-count of two ASC-sorted distinct long arrays (see
    * [[SortedIntersectCount]]). Called from generated code.
    */
  def sortedIntersectCount(a: org.apache.spark.sql.catalyst.util.ArrayData,
                           b: org.apache.spark.sql.catalyst.util.ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** 60-bit token hash: first 15 md5 hex nibbles of `token + "|99"` —
    * bit-identical to the declarative
    * `conv(substr(md5(concat(t,'|99')),1,15),16,10)` and the oracle's
    * `('0x' || substr(md5(t || '|99'), 1, 15))::BIGINT`.
    */
  def tokenHash99(token: String): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest((token + "|99").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** 16-bit SimHash by token-hash bit voting, one pass per row — the
    * map-only form of the explode→groupBy vote (same votes, same result:
    * split keeps trailing empties exactly like the exploded form).
    */
  def simhash16(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](16)
    var i = 0
    while (i < toks.length) {
      val h = tokenHash99(toks(i))
      var b = 0
      while (b < 16) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Full-width 64-bit token hash: md5(token + "|99") bytes 0..7 read
    * big-endian. [[tokenHash99]] is this value's top 60 bits shifted down
    * (15 nibbles); the wide SimHash needs all 64 so each signature bit has
    * an independent vote source.
    */
  def tokenHash99Wide(token: String): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest((token + "|99").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** 64-bit SimHash by token-hash bit voting — the corpus-scaled width for
    * [[graft.operators.Dedup.simhashNearDupPairs]]: a 16-bit signature's
    * pigeonhole pieces key at most 64/32/32 values, so bucket occupancy
    * grows linearly with corpus size; 4×16-bit pieces key 65 536 values
    * each and keep occupancy bounded at 100 TB. Same voting contract as
    * [[simhash16]], votes drawn from [[tokenHash99Wide]].
    */
  def simhash64(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = tokenHash99Wide(toks(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Largest prime below 2^53 — the rolling-hash modulus. acc < M and
    * base 131 keep every intermediate product < 2^63 (exact int64 in both
    * engines), and a ~9·10^15 key space makes birthday collisions
    * negligible at corpus scale (~10^-4 expected at 10M grams).
    */
  val RollM = 9007199254740881L
  val RollB = 131L

  /** TRUE rolling (Rabin–Karp) hashes of every `stride`-th length-`k`
    * char window: h(i) = Σ c_{i+t}·B^{k-1-t} mod M — O(1) per position
    * (subtract the outgoing char's B^{k-1} term, shift, add the incoming
    * char) instead of O(k), so a corpus-sized scan pays one multiply-add
    * per CHARACTER. The declarative twin (per-window fold) and the DuckDB
    * oracle (`list_reduce` over `ord(text[j]) % 128`) compute the same
    * value in O(k) per window — bit-identical results, kernel-only speed.
    * Char codes are masked to 7 bits: x < M < 2^53 times B=131 stays
    * under 2^61 and c·B^{k-1} under 2^60, so every intermediate is exact
    * int64 in BOTH engines with no wide-mul tricks (and the mask is the
    * identity on this ASCII corpus — the same cross-engine contract as
    * the md5 token hashing).
    */
  def rollingHashes(text: UTF8String, k: Int, stride: Int): GenericArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // B^(k-1) mod M for the outgoing-char subtraction
    var powK = 1L
    var t = 0
    while (t < k - 1) { powK = (powK * RollB) % RollM; t += 1 }
    val out = new Array[Long]((n - k) / stride + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * RollB + (s.charAt(i) & 0x7f)) % RollM; i += 1 }
    out(0) = h
    var pos = 1
    var oi = 1
    while (pos + k <= n) {
      val outgoing = ((s.charAt(pos - 1) & 0x7f).toLong * powK) % RollM
      h = ((h - outgoing + RollM) % RollM * RollB + (s.charAt(pos + k - 1) & 0x7f)) % RollM
      if (pos % stride == 0) { out(oi) = h; oi += 1 }
      pos += 1
    }
    new GenericArrayData(out)
  }
}

/** graft_shingles(text): table-generating function — the Generator rung of
  * the §2.7 extension ladder (scalar Expression → typed Aggregator →
  * Generator). Emits one (pos, shingle) row per word-3-gram, the same
  * shingling contract as [[ShingleKernel]], usable from SQL via
  * `LATERAL VIEW graft_shingles(text)`. Generators sit behind GenerateExec
  * (eval per input row, output streamed) — CodegenFallback here affects
  * only the generator expression itself, exactly like Spark's own
  * non-explode generators (e.g. json_tuple, stack).
  */
case class ShingleGenerator(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

  override def elementSchema: StructType = StructType(
    StructField("pos", IntegerType, nullable = false) ::
    StructField("shingle", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires STRING input, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val toks = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < 3) Iterator.empty
      else (0 to toks.length - 3).iterator.map { i =>
        org.apache.spark.sql.catalyst.InternalRow(
          i, UTF8String.fromString(s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}"))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** graft_chunks(text, w, s): table-generating form of the token-window
  * chunker — one (win_id, win_tokens, chunk) row per window of `w`
  * whitespace tokens at stride `s`, the same window-count contract as
  * `TextOps.chunkWindows` (1 + ceil(max(0, n−w)/s) windows, the tail
  * window possibly short, a short doc yielding exactly one window).
  * `LATERAL VIEW graft_chunks(text, 32, 24)` gives SQL users the
  * long-document splitter without the DataFrame API.
  */
case class ChunkGenerator(child: Expression, w: Int, s: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  require(w >= 1 && s >= 1, s"graft_chunks requires window >= 1 and stride >= 1, got ($w, $s)")

  override def elementSchema: StructType = StructType(
    StructField("win_id", IntegerType, nullable = false) ::
    StructField("win_tokens", IntegerType, nullable = false) ::
    StructField("chunk", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_chunks requires STRING input, got $other")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val t = child.eval(input)
    if (t == null) Iterator.empty
    else {
      val toks = t.asInstanceOf[UTF8String].toString.split(" ", -1)
      val n = toks.length
      val nWins = 1 + math.max(0, (n - w + s - 1) / s)
      (0 until nWins).iterator.map { i =>
        val from = i * s
        val until = math.min(n, from + w)
        org.apache.spark.sql.catalyst.InternalRow(
          i, until - from,
          UTF8String.fromString(toks.slice(from, until).mkString(" ")))
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

abstract class ShingleExpression extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a STRING argument")
}

/** minhash_sig(text, k): k-element MinHash signature over word 3-grams. */
case class MinHashSig(child: Expression, k: Int) extends ShingleExpression {
  // mixA(1023) ≈ 2^16.7 against a 2^30-reduced base keeps every product
  // < 2^47; the cap is a sanity bound far above production widths (64-128),
  // enforced here rather than only documented (round-11 ADVICE).
  require(k >= 1 && k <= 1024, s"minhash_sig supports 1 <= k <= 1024, got $k")
  override def nullSafeEval(input: Any): Any =
    ShingleKernel.minhash(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.minhash($c, $k)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** shingle_hashes(text): sorted distinct 52-bit hashes of word 3-grams. */
case class ShingleHashes(child: Expression) extends ShingleExpression {
  override def nullSafeEval(input: Any): Any =
    ShingleKernel.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.shingleHashes($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** sorted_intersect_count(a, b): |a ∩ b| for two ASC-sorted distinct
  * BIGINT arrays in one allocation-free merge pass — the verification
  * kernel for the dedup joins. `array_intersect` hash-builds a set per
  * invocation; on a candidate-pair stream (hundreds of thousands of pairs
  * × ~100-element sets at sf0.1, corpus-proportional at scale) the merge
  * is the difference between verification being memory-bound and
  * allocation-bound. Inputs must be sorted distinct — exactly
  * [[ShingleHashes]]' canonical form — and the count then equals
  * `size(array_intersect(a, b))` for any such inputs
  * (SortedIntersectSpec property-sweeps the equivalence).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments")
  }
  override def nullSafeEval(l: Any, r: Any): Any =
    ShingleKernel.sortedIntersectCount(
      l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ShingleKernel.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** simhash16(text): 16-bit SimHash from token-hash bit voting, map-only. */
case class SimHash16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a STRING argument")
  override def nullSafeEval(input: Any): Any =
    ShingleKernel.simhash16(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.simhash16($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** simhash64(text): 64-bit SimHash — the corpus-scaled signature width for
  * the near-dup pair join (see [[ShingleKernel.simhash64]]).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a STRING argument")
  override def nullSafeEval(input: Any): Any =
    ShingleKernel.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** rolling_hashes(text, k, stride): Rabin–Karp hashes of every stride-th
  * k-char window — the exact-substring-dedup scan kernel (one multiply-add
  * per character regardless of k; see [[ShingleKernel.rollingHashes]]).
  */
case class RollingHashes(child: Expression, k: Int, stride: Int) extends UnaryExpression {
  require(k > 0 && stride > 0, "rolling_hashes requires k > 0 and stride > 0")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a STRING argument")
  override def nullSafeEval(input: Any): Any =
    ShingleKernel.rollingHashes(input.asInstanceOf[UTF8String], k, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.rollingHashes($c, $k, $stride)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Deterministic greedy longest-match SUBWORD tokenizer — the honest
  * token-counting basis for export budgets (round 15): whitespace token
  * counts under-price CJK/code/agglutinative text badly, and every budget
  * face (packBudget, shardTokenBudget, temperature masses) was counting
  * whitespace tokens. The vocab is FROZEN here as the single source of
  * truth — [[graft.operators.TextOps]] renders the same array into the
  * DuckDB oracle's VALUES list, and greedy longest-match is replayable in
  * SQL as a recursive walk (max matching vocab length at each position,
  * else consume one character as one unknown token). Whitespace separates
  * words and is never a token; vocab entries contain no spaces, so a
  * match can never cross a word boundary and per-word SQL replay equals
  * the single-pass kernel. ASCII-oriented (the corpus); astral-plane
  * code points would count per UTF-16 unit here vs per character in
  * DuckDB — a documented non-goal for the synthetic corpus.
  */
/** A RESOLVED subword vocabulary (round-16: the vocab is a PARAMETER, not
  * a frozen constant — honest production token budgets price against the
  * real tokenizer's merges table, broadcast with the expression). Entries
  * must be non-empty, space-free (so a greedy match can never cross a
  * word boundary — the property that makes per-word SQL replay equal the
  * single-pass kernel) and ASCII-leading (the per-first-char dispatch
  * table; the corpus contract, enforced loudly). Resolution stays
  * O(candidates sharing the first char) per position — candidates are
  * pre-grouped by first char and sorted longest-first, so a 10k-entry
  * vocab costs the same per position as a 60-entry one except where
  * candidates genuinely collide (SubwordVocabSpec prices a 10k vocab).
  */
final class SubwordVocab(val vocab: Array[String]) extends Serializable {
  require(vocab.nonEmpty, "empty subword vocab")
  vocab.foreach { v =>
    require(v.nonEmpty && !v.contains(' '),
      s"subword vocab entry '$v' must be non-empty and space-free")
    require(v.forall(_ < 128),
      s"subword vocab entry '$v' must be ASCII (two-char dispatch table)")
  }

  // TWO-LEVEL dispatch: candidates grouped by their first TWO chars,
  // longest first. A 10k-entry vocab over 26 letters has ~400 candidates
  // per first char but only ~15 per (c0, c1) pair — the bucket walk stays
  // near-constant as the vocab grows. Length-1 entries need no bucket at
  // all: a single-char match consumes one char as one token, exactly what
  // the unknown-char fallback does, so they cannot change a count.
  @transient private lazy val byPair: Array[Array[String]] = {
    val m = new Array[Array[String]](128 * 128)
    vocab.filter(_.length >= 2)
      .groupBy(v => v.charAt(0).toInt * 128 + v.charAt(1).toInt)
      .foreach { case (k, vs) =>
        m(k) = vs.distinct.sortBy(v => (-v.length, v))
      }
    m
  }

  def count(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = text.toString
    val n = s.length
    var i = 0
    var cnt = 0L
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ') i += 1
      else {
        var step = 1
        if (c < 128 && i + 1 < n) {
          val c1 = s.charAt(i + 1)
          if (c1 < 128) {
            val cands = byPair(c.toInt * 128 + c1.toInt)
            if (cands != null) {
              var j = 0
              var done = false
              while (j < cands.length && !done) {
                val v = cands(j)
                if (i + v.length <= n && s.startsWith(v, i)) { step = v.length; done = true }
                j += 1
              }
            }
          }
        }
        cnt += 1
        i += step
      }
    }
    cnt
  }
}

object SubwordKernel {
  /** The DEFAULT (frozen) vocab, no spaces, lowercase ASCII — common
    * English affixes + frequent digraphs, deliberately WITHOUT single
    * letters so the unknown-character fallback path is exercised on every
    * rare word. Faces that want a corpus-sized vocab pass their own
    * [[SubwordVocab]] (see `graft.operators.TextOps.corpusSubwordVocab`).
    */
  val vocab: Array[String] = Array(
    "tion", "ment", "ness", "able", "ther", "with", "ight", "ound",
    "ing", "ent", "ant", "ous", "ion", "pro", "pre", "com", "con",
    "ver", "for", "est", "ate", "ive", "ere", "and", "the",
    "er", "ed", "ly", "es", "re", "un", "in", "on", "at", "or", "an",
    "en", "th", "he", "nd", "st", "ar", "al", "it", "is", "te", "se",
    "le", "ra", "ri", "ro", "de", "co", "ce", "ne", "me", "ta", "ur",
    "ou", "ea", "ti", "ni", "us")

  val default: SubwordVocab = new SubwordVocab(vocab)

  def subwordCount(text: org.apache.spark.unsafe.types.UTF8String): Long =
    default.count(text)
}

/** subword_tokens(text): greedy longest-match subword count — one pass,
  * codegen'd. `vocabOpt = None` uses the frozen default (a static call,
  * no reference indirection in the generated code); a parameterized vocab
  * rides into codegen as a reference object — the broadcast-merges-table
  * shape: one resolved [[SubwordVocab]] per plan, shared by every task.
  */
case class SubwordTokenCount(child: Expression,
                             vocabOpt: Option[SubwordVocab] = None)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a STRING argument")
  override def nullSafeEval(input: Any): Any =
    vocabOpt.getOrElse(SubwordKernel.default).count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    vocabOpt match {
      case None =>
        defineCodeGen(ctx, ev, c => s"graft.functions.SubwordKernel.subwordCount($c)")
      case Some(v) =>
        val ref = ctx.addReferenceObj("subwordVocab", v,
          classOf[SubwordVocab].getName)
        defineCodeGen(ctx, ev, c => s"$ref.count($c)")
    }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** A RESOLVED BPE merges table — BYTE-seeded (round 18): the walk runs on
  * the GPT-2/Llama alphabet, the text's UTF-8 BYTES, not Java chars. Real
  * pipelines budget in BPE tokens over a byte vocabulary, where a ranked
  * (left, right) → rank merges table — not greedy length — decides the
  * segmentation; char-seeded masses diverge from real budgets on exactly
  * the multibyte text the reference exercises (CJK literal,
  * tests/tests/sample_data_test.rs:87) — BpeSpec pins the divergence
  * ("日本" is 2 chars but 6 byte-tokens under an empty table).
  *
  * ENCODE WALK (replayed by the DuckDB oracle's recursive CTE): start
  * from single BYTES; repeatedly merge the LEFTMOST occurrence of the
  * LOWEST-RANKED adjacent token pair present in the table; stop when no
  * adjacent pair is mergeable. 0x20 separates words and is never a token
  * — UTF-8 never uses 0x20 inside a multibyte sequence, so byte-splitting
  * equals word-splitting. An EMPTY table is legal (round-17 advice): no
  * merges, every byte is its own token.
  *
  * TOKEN IDS (GPT-2-style byte vocab): id 0–255 = the raw byte; id
  * 256 + k = the token merge k produces (first producer wins on the —
  * theoretical — duplicate result, same first-wins rule as rank).
  * [[encode]] emits the id array a trainer consumes; [[count]] is its
  * length.
  *
  * Byte↔char bridge: tokens live as ISO-8859-1 strings (one char per
  * byte, bijective), so the walk's string machinery IS byte machinery,
  * and `pairs` are likewise latin-1-coded byte strings
  * ([[graft.operators.TextOps.corpusBpeMerges]] derives them from binary
  * grams). On pure-ASCII text this coincides with the round-17
  * char-seeded behavior — which keeps the DuckDB oracle's codepoint-based
  * replay exact on the ASCII test corpus — while multibyte text gets the
  * honest byte segmentation.
  *
  * Deployment shape: one resolved object per plan (a codegen reference
  * object — the broadcast-merges-table shape); rank lookup is one hash
  * probe per adjacent pair per iteration, O(word² · log-ish) per word on
  * words of ordinary length.
  */
final class BpeMerges(val pairs: Array[(String, String)]) extends Serializable {
  pairs.foreach { case (l, r) =>
    require(l.nonEmpty && r.nonEmpty && !l.contains(' ') && !r.contains(' '),
      s"BPE merge ('$l','$r') must be non-empty and space-free")
    // NUL is the rank-key separator below; a pair containing it could
    // alias another pair's key (and would make this source binary again
    // if ever embedded literally)
    require(!l.contains('\u0000') && !r.contains('\u0000'),
      "BPE merge tokens must not contain NUL")
  }

  // rank = first index of the pair (duplicates keep the best rank)
  @transient private lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      m.putIfAbsent(pairs(i)._1 + "\u0000" + pairs(i)._2, Integer.valueOf(i))
      i += 1
    }
    m
  }

  // id of the byte string merge i PRODUCES = 256 + i (first producer wins)
  @transient private lazy val idOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](pairs.length * 2)
    var i = 0
    while (i < pairs.length) {
      m.putIfAbsent(pairs(i)._1 + pairs(i)._2, Integer.valueOf(256 + i))
      i += 1
    }
    m
  }

  // the byte↔char bridge: one latin-1 char per UTF-8 byte, bijective
  private def latin1(text: org.apache.spark.unsafe.types.UTF8String): String =
    new String(text.getBytes, java.nio.charset.StandardCharsets.ISO_8859_1)

  def count(text: org.apache.spark.unsafe.types.UTF8String): Long = {
    val s = latin1(text)
    val n = s.length
    var total = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) total += mergeWord(s, start, i)._2
        start = i + 1
      }
      i += 1
    }
    total
  }

  /** GPT-2-style token ids for the whole text, word by word in order. */
  def encode(text: org.apache.spark.unsafe.types.UTF8String): GenericArrayData = {
    val s = latin1(text)
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    out.sizeHint(n)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val (toks, m) = mergeWord(s, start, i)
          var k = 0
          while (k < m) {
            val t = toks(k)
            // a 1-char token is a raw byte; anything longer was produced
            // by a merge, so idOf is total over fixpoint tokens
            if (t.length == 1) out += t.charAt(0).toInt
            else out += idOf.get(t).intValue()
            k += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.result())
  }

  /** The merge fixpoint of one word: (token buffer, live token count). */
  private def mergeWord(s: String, lo: Int, hi: Int): (Array[String], Int) = {
    val len = hi - lo
    val toks = new Array[String](len)
    var k = 0
    while (k < len) { toks(k) = String.valueOf(s.charAt(lo + k)); k += 1 }
    if (len == 1) return (toks, 1)
    var m = len
    var merged = true
    while (merged && m > 1) {
      var bestRank = Int.MaxValue
      var bestI = -1
      var j = 0
      while (j < m - 1) {
        val r = rank.get(toks(j) + "\u0000" + toks(j + 1))
        // strict < keeps the LEFTMOST occurrence of the best rank
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); bestI = j }
        j += 1
      }
      if (bestI < 0) merged = false
      else {
        toks(bestI) = toks(bestI) + toks(bestI + 1)
        var t = bestI + 1
        while (t < m - 1) { toks(t) = toks(t + 1); t += 1 }
        m -= 1
      }
    }
    (toks, m)
  }
}

/** bpe_tokens(text): merge-order BPE token count against a resolved
  * [[BpeMerges]] table — codegen'd via a reference object, same shape as
  * the parameterized [[SubwordTokenCount]].
  */
case class BpeTokenCount(child: Expression, merges: BpeMerges) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a STRING argument")
  override def nullSafeEval(input: Any): Any =
    merges.count(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, classOf[BpeMerges].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** bpe_encode(text): the byte-level BPE token-ID array (GPT-2-style byte
  * vocab: 0–255 raw bytes, 256+k = merge k's result) — the payload a
  * trainer actually consumes; [[BpeTokenCount]] is its length. Same
  * reference-object codegen shape as the count.
  */
case class BpeEncodeIds(child: Expression, merges: BpeMerges) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires a STRING argument")
  override def nullSafeEval(input: Any): Any =
    merges.encode(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, classOf[BpeMerges].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {
  def minhashSig(text: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(text), k))

  def shingleHashes(text: Column): Column =
    Bridge.column(ShingleHashes(Bridge.expression(text)))

  def simhash16(text: Column): Column =
    Bridge.column(SimHash16(Bridge.expression(text)))

  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(text)))

  def rollingHashes(text: Column, k: Int, stride: Int): Column =
    Bridge.column(RollingHashes(Bridge.expression(text), k, stride))

  def sortedIntersectCount(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  def subwordTokens(text: Column): Column =
    Bridge.column(SubwordTokenCount(Bridge.expression(text)))

  /** Subword count against an EXPLICIT vocab (the parameterized form —
    * pass the production tokenizer's merges/vocab table).
    */
  def subwordTokens(text: Column, vocab: Seq[String]): Column =
    Bridge.column(SubwordTokenCount(Bridge.expression(text),
      Some(new SubwordVocab(vocab.toArray))))

  /** Merge-order BPE token count against an explicit ranked merges table
    * (round 17 — the segmentation real token budgets use).
    */
  def bpeTokens(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(text),
      new BpeMerges(merges.toArray)))

  /** Byte-level BPE token-id arrays against an explicit ranked merges
    * table (round 18 — the encoded payload, not just its mass).
    */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeEncodeIds(Bridge.expression(text),
      new BpeMerges(merges.toArray)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    Bridge.registerFunction(spark, "subword_tokens", args => SubwordTokenCount(args.head))
    Bridge.registerFunction(spark, "shingle_hashes", args => ShingleHashes(args.head))
    Bridge.registerFunction(spark, "simhash16", args => SimHash16(args.head))
    Bridge.registerFunction(spark, "simhash64", args => SimHash64(args.head))
    Bridge.registerFunction(spark, "graft_shingles", args => ShingleGenerator(args.head))
    Bridge.registerFunction(spark, "graft_chunks", { args =>
      def lit(e: Expression, name: String): Int = {
        require(e.foldable, s"graft_chunks $name must be a literal integer")
        e.eval(null) match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_chunks $name must be an integer literal, got $other")
        }
      }
      ChunkGenerator(args(0), lit(args(1), "window"), lit(args(2), "stride"))
    })
    Bridge.registerFunction(spark, "sorted_intersect_count",
      args => SortedIntersectCount(args(0), args(1)))
  }
}
