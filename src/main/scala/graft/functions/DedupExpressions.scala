package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the dedup hot path.
  *
  * The higher-order-function formulation (transform/aggregate/zip_with)
  * is interpreted row-by-row with per-step array allocation — at 128
  * permutations × |shingles| that dominated the whole MinHash stage
  * (~50 ms/doc). These expressions do the same math as one tight JVM
  * loop over the words array: ~µs/doc, no intermediate allocation.
  * CodegenFallback only severs the codegen *span*; the per-row work
  * itself is primitive-typed native code.
  */
object DedupHashing {
  /** Deterministic permutation parameters, 2^30-bounded. */
  def perms(n: Int): (Array[Long], Array[Long]) = {
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s >>> 34 }
    val a = Array.fill(n)(next() | 1L)
    val b = Array.fill(n)(next())
    (a, b)
  }

  /** Lower 64 bits of an md5 digest read little-endian — bit-identical
    * to DuckDB's `md5_number_lower`, the shared hash space that makes
    * every md5-derived operator oracle-reproducible (SURVEY.md §4). */
  @inline def md5Lower64(d: Array[Byte]): Long = {
    var h = 0L
    var j = 15
    while (j >= 8) { h = (h << 8) | (d(j) & 0xFFL); j -= 1 }
    h
  }
}

/** words array<string> → array<long> of LSH band bucket keys: word
  * 3-gram shingling, `numHashes` MinHash permutations, `bands` bands.
  * Null (→ filtered) for docs with fewer than 3 words.
  *
  * Every hash is in DuckDB's md5_number_lower space so an oracle can
  * rebuild the banding bit-exactly: the shingle base hash is
  * md5-lower-64 masked to 31 bits (a·h+b then stays in long), and the
  * band bucket key is md5-lower-64 of the band's signature slice
  * rendered as "s0 s1 s2 s3 <bandIdx>" (decimal ASCII — DuckDB
  * string_agg of BIGINTs reproduces it verbatim). */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression with CodegenFallback {
  import DedupHashing._

  private val (pa, pb) = perms(numHashes)
  private val rows = numHashes / bands

  override def dataType: DataType = ArrayType(LongType)

  // returns null for docs with <3 words regardless of input nullability
  override def nullable: Boolean = true

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  private val space = " ".getBytes

  override def nullSafeEval(v: Any): Any = {
    val ws = v.asInstanceOf[ArrayData]
    val n = ws.numElements()
    if (n < 3) return null
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i <= n - 3) {
      md.reset()
      md.update(ws.getUTF8String(i).getBytes); md.update(space)
      md.update(ws.getUTF8String(i + 1).getBytes); md.update(space)
      md.update(ws.getUTF8String(i + 2).getBytes)
      val h = md5Lower64(md.digest()) & 0x7FFFFFFFL
      var j = 0
      while (j < numHashes) {
        val x = pa(j) * h + pb(j)
        if (x < sig(j)) sig(j) = x
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    val sb = new java.lang.StringBuilder(96)
    var b = 0
    while (b < bands) {
      sb.setLength(0)
      var j = b * rows
      while (j < (b + 1) * rows) { sb.append(sig(j)); sb.append(' '); j += 1 }
      sb.append(b)
      md.reset()
      md.update(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out(b) = md5Lower64(md.digest())
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** words array<string> → 64-bit SimHash (per-bit ±1 votes over word
  * hashes, sign → bit), one native pass. Word hashes are md5-lower-64
  * (= DuckDB `md5_number_lower`), so an oracle can rebuild the exact
  * signature — and because the 4-band pigeonhole blocking downstream is
  * complete for Hamming ≤ 3, the whole operator is SQL-checkable as a
  * brute-force pairwise popcount. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val ws = v.asInstanceOf[ArrayData]
    val n = ws.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(ws.getUTF8String(i).getBytes)
      val h = DedupHashing.md5Lower64(md.digest())
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** words array<string> → SORTED DISTINCT array<long> of word n-gram
  * hashes (space-joined, n=1 → the word set itself), one native pass.
  * The hash is the lower 64 bits of md5(ngram) read little-endian —
  * bit-identical to DuckDB's `md5_number_lower`, so an oracle hashing
  * the same n-grams gets the same set (collisions included) and
  * therefore the same Jaccard. Long sets keep the pair-verify merge
  * and the self-join shuffle several-fold lighter than string sets.
  * Returns null below n words. */
case class NGramHashSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType)

  // returns null for docs with <n words regardless of input nullability
  override def nullable: Boolean = true

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  private val space = " ".getBytes

  override def nullSafeEval(v: Any): Any = {
    val ws = v.asInstanceOf[ArrayData]
    val nw = ws.numElements()
    if (nw < n) return null
    val hs = new Array[Long](nw - n + 1)
    var i = 0
    while (i <= nw - n) {
      md.reset()
      var g = 0
      while (g < n) {
        if (g > 0) md.update(space)
        md.update(ws.getUTF8String(i + g).getBytes)
        g += 1
      }
      hs(i) = DedupHashing.md5Lower64(md.digest())
      i += 1
    }
    java.util.Arrays.sort(hs)
    var uniq = 1
    i = 1
    while (i < hs.length) { if (hs(i) != hs(i - 1)) uniq += 1; i += 1 }
    val out = new Array[Long](uniq)
    out(0) = hs(0)
    var k = 1
    i = 1
    while (i < hs.length) {
      if (hs(i) != hs(i - 1)) { out(k) = hs(i); k += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** words array<string> → array<long> of PER-POSITION word n-gram hashes
  * (element i = the gram starting at word i) in the md5_number_lower
  * space — the positional twin of NGramHashSet for span-level surgery,
  * where WHERE a shared gram sits decides which words get trimmed.
  * Same per-gram hashing, no sort/dedup. Null for docs with <n words. */
case class NGramHashList(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType)

  // returns null for docs with <n words regardless of input nullability
  override def nullable: Boolean = true

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")
  private val space = " ".getBytes

  override def nullSafeEval(v: Any): Any = {
    val ws = v.asInstanceOf[ArrayData]
    val nw = ws.numElements()
    if (nw < n) return null
    val hs = new Array[Long](nw - n + 1)
    var i = 0
    while (i <= nw - n) {
      md.reset()
      var g = 0
      while (g < n) {
        if (g > 0) md.update(space)
        md.update(ws.getUTF8String(i + g).getBytes)
        g += 1
      }
      hs(i) = DedupHashing.md5Lower64(md.digest())
      i += 1
    }
    new GenericArrayData(hs)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Intersection size of two pre-sorted long arrays via linear merge. */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Intersection size of two pre-sorted string arrays via linear merge —
  * no per-row hash-set allocation (array_intersect builds one per call,
  * which dominated the blocked-Jaccard verify stage). Inputs MUST be
  * sorted ascending (sort once per doc, merge per pair). */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (na, nb) = (a.numElements(), b.numElements())
    var i = 0; var j = 0; var n = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { n += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Multiset count of array elements that belong to a small baked-in
  * vocabulary (stopword profiles, function-word lists). The
  * `size(filter(ws, w -> array_contains(vocab, w)))` higher-order form
  * is interpreted with per-element closure dispatch; this is one hash
  * lookup per token. */
case class VocabHitCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  @transient private lazy val set = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    vocab.foreach(v => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(v: Any): Any = {
    val ws = v.asInstanceOf[ArrayData]
    val n = ws.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (set.contains(ws.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object DedupExpressions {
  def minhashBands(words: Column, numHashes: Int, bands: Int): Column =
    ExprBridge.column(MinHashBands(ExprBridge.expression(words), numHashes, bands))

  def simhash64(words: Column): Column =
    ExprBridge.column(SimHash64(ExprBridge.expression(words)))

  def sortedIntersectSize(a: Column, b: Column): Column =
    ExprBridge.column(SortedIntersectSize(ExprBridge.expression(a), ExprBridge.expression(b)))

  def ngramHashSet(words: Column, n: Int): Column =
    ExprBridge.column(NGramHashSet(ExprBridge.expression(words), n))

  def ngramHashList(words: Column, n: Int): Column =
    ExprBridge.column(NGramHashList(ExprBridge.expression(words), n))

  def sortedLongIntersectSize(a: Column, b: Column): Column =
    ExprBridge.column(SortedLongIntersectSize(ExprBridge.expression(a), ExprBridge.expression(b)))

  def vocabHitCount(words: Column, vocab: Seq[String]): Column =
    ExprBridge.column(VocabHitCount(ExprBridge.expression(words), vocab))
}
