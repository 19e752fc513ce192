package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Near-duplicate fingerprints as native codegen'd expressions: MinHash
  * signatures over word n-gram shingles and 31-bit SimHash — each ONE pass
  * over the document bytes per row, no token-array materialization, no
  * UDF boxing. This is the shape that matters at corpus scale: the
  * expensive part of MinHash-LSH dedup is signature computation over 100 TB
  * of text, and it runs here as a map-only whole-stage-codegen operator.
  *
  * Number discipline (so a DuckDB oracle replays bit-for-bit):
  *  - token = maximal run of non-whitespace bytes (ASCII \s set — matches
  *    both engines' `\s+` split on space-separated corpora);
  *  - shingle hash = the [[RollingHash]] polynomial fold over the tokens
  *    joined by a single 0x20, mod 2^31−1 — pure integer math;
  *  - permutation j: `(a_j·h + b_j) mod P` with
  *    `a_j = ((j+1)·2654435761) mod P` (Knuth multiplicative constant —
  *    small multipliers like `2j+1` nearly preserve hash ordering and make
  *    every permutation pick the same min shingle) and
  *    `b_j = (j·40503·65537 + 12345) mod P`;
  *  - SimHash bit i = sign of Σ_tokens (±1 by bit i of the token hash).
  */
object TextHashes {

  final val P = 2147483647L // 2^31 − 1, same modulus as RollingHash

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == '\f'

  /** Token spans [start, end) of non-whitespace byte runs. */
  private def tokenSpans(bytes: Array[Byte]): Array[Int] = {
    val spans = new scala.collection.mutable.ArrayBuffer[Int](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && isWs(bytes(i))) i += 1
      if (i < n) {
        spans += i
        while (i < n && !isWs(bytes(i))) i += 1
        spans += i
      }
    }
    spans.toArray
  }

  /** Fold a token's Unicode CODE POINTS (not raw bytes) into the rolling
    * hash — the SQL oracles replay token hashes with `ord(text[c])`, so
    * the byte fold diverged on any non-ASCII token (latent while the
    * fixtures were ASCII; the ADVICE r5 winnow lesson applied to the
    * whole family). Token spans are byte offsets from [[tokenSpans]] —
    * safe, since UTF-8 continuation bytes are never ASCII whitespace —
    * and the span's code points are decoded inline (truncated/invalid
    * sequences fall back to the single byte, bounded by the span).
    */
  private def foldToken(h0: Long, bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = h0
    var i = from
    while (i < until) {
      val b0 = bytes(i) & 0xff
      var cp = b0
      var len = 1
      if (b0 >= 0xc0 && b0 < 0xe0 && i + 1 < until) {
        cp = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); len = 2
      } else if (b0 >= 0xe0 && b0 < 0xf0 && i + 2 < until) {
        cp = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) |
          (bytes(i + 2) & 0x3f); len = 3
      } else if (b0 >= 0xf0 && i + 3 < until) {
        cp = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f); len = 4
      }
      h = (h * 31L + cp) % P
      i += len
    }
    h
  }

  /** MinHash signature: k minima of permuted n-gram shingle hashes.
    * Documents with fewer than n tokens get the sentinel signature
    * (all values = P), keeping the result non-null and total.
    */
  def minhash(s: UTF8String, n: Int, k: Int): ArrayData = {
    val bytes = s.getBytes
    val spans = tokenSpans(bytes)
    val nTok = spans.length / 2
    val mins = Array.fill[Long](k)(P)
    var i = 0
    while (i + n <= nTok) {
      var h = 0L
      var t = 0
      while (t < n) {
        if (t > 0) h = (h * 31L + ' '.toLong) % P
        h = foldToken(h, bytes, spans(2 * (i + t)), spans(2 * (i + t) + 1))
        t += 1
      }
      var j = 0
      while (j < k) {
        val a = ((j + 1L) * 2654435761L) % P
        val b = (j.toLong * 40503L * 65537L + 12345L) % P
        val p = (a * h + b) % P
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 31-bit SimHash over word n-gram shingle hashes (with multiplicity).
    * Shingle features, not unigrams: on a small shared vocabulary every
    * document votes the same way on unigram hashes and the fingerprint
    * space collapses (measured: 6.5M "near-dup" pairs among 5k synthetic
    * docs); n-gram features keep unrelated documents ~15 bits apart while
    * true near-dups stay within a few bits.
    */
  def simhash(s: UTF8String, n: Int): Long = {
    val bytes = s.getBytes
    val spans = tokenSpans(bytes)
    val nTok = spans.length / 2
    val votes = new Array[Int](31)
    var i = 0
    while (i + n <= nTok) {
      var h = 0L
      var t = 0
      while (t < n) {
        if (t > 0) h = (h * 31L + ' '.toLong) % P
        h = foldToken(h, bytes, spans(2 * (i + t)), spans(2 * (i + t) + 1))
        t += 1
      }
      var b = 0
      while (b < 31) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 31) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Winnowing fingerprints (the MOSS algorithm, Schleimer/Wilkerson/
    * Aiken 2003): rolling k-gram hashes over Unicode CODE POINTS, then
    * the minimum of every window of w consecutive gram hashes. The
    * guarantee: any shared substring of length ≥ k + w − 1 code points
    * contributes at least one IDENTICAL fingerprint to both documents —
    * substring-level duplicate detection (plagiarized middles, quoted
    * blocks) where shingle Jaccard only sees whole-document similarity.
    * Code points (not UTF-8 bytes) are the hash alphabet so the SQL
    * oracle's character indexing (`ord(text[c])`) replays it exactly on
    * non-ASCII text too. One O(n) pass per row (rolling update +
    * monotonic-deque window min), map-only under whole-stage codegen;
    * returns the SORTED distinct fingerprint set (the value set is
    * tie-rule-independent, so a SQL oracle replays it with plain window
    * minima).
    */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val cps = codePoints(s)
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    var pow = 1L
    var t = 0
    while (t < k - 1) { pow = (pow * 31L) % P; t += 1 }
    val h = new Array[Long](m)
    var cur = 0L
    var i = 0
    while (i < k) { cur = (cur * 31L + cps(i)) % P; i += 1 }
    h(0) = cur
    i = 1
    while (i < m) {
      val drop = (cps(i - 1).toLong * pow) % P
      cur = (((cur - drop + P) % P) * 31L + cps(i + k - 1)) % P
      h(i) = cur
      i += 1
    }
    val fps = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var mn = h(0); i = 1
      while (i < m) { if (h(i) < mn) mn = h(i); i += 1 }
      fps.add(mn)
    } else {
      // monotonic deque of indices, increasing h values
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // [head, tail)
      i = 0
      while (i < m) {
        while (tail > head && h(deque(tail - 1)) >= h(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) fps.add(h(deque(head)))
        i += 1
      }
    }
    val out = new Array[Long](fps.size)
    val it = fps.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Unicode code points of a UTF8String (surrogate pairs decoded) —
    * the alphabet winnow() hashes over, matching SQL `ord(text[c])`.
    */
  private def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var i = 0
    var j = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      out(j) = cp
      j += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** Column APIs. */
  def min_hash_signature(text: Column, n: Int, k: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(text), n, k))

  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))

  def sim_hash(text: Column, n: Int = 3): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(text), n))

  private[functions] def checkString(dt: DataType, who: String): TypeCheckResult =
    if (dt == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$who requires a string argument, got $dt")
}

case class MinHashSignature(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1 && k >= 1 && k <= 128, s"bad minhash params n=$n k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "min_hash_signature"

  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkString(child.dataType, prettyName)

  protected override def nullSafeEval(input: Any): Any =
    TextHashes.minhash(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.minhash($c, $n, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  require(k >= 2 && w >= 1, s"bad winnow params k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkString(child.dataType, prettyName)

  protected override def nullSafeEval(input: Any): Any =
    TextHashes.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.winnow($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

case class SimHash(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"bad simhash shingle size n=$n")

  override def dataType: DataType = LongType
  override def prettyName: String = "sim_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    TextHashes.checkString(child.dataType, prettyName)

  protected override def nullSafeEval(input: Any): Any =
    TextHashes.simhash(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}
