package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document text-signature expressions.
  *
  * The HOF formulations (`transform(sequence(...))` + `array_distinct`
  * + `array_sort`, or explode-by-seed aggregation) evaluate interpreted
  * lambdas with per-element boxing: measured ~1 ms/doc for bigram
  * shingling at sf0.1 — 5-6 s of the MinHash and Jaccard dedup queries
  * was spent re-tokenizing. These expressions compute each signature in
  * one pass of plain JVM code, once per document (CodegenFallback is
  * fine: rows = documents, the per-row dispatch is noise; the inner
  * loops are compiled Java).
  *
  * Exact-match contracts with the DuckDB oracle SQL (and the HOF forms,
  * which the test suite checks for equivalence):
  *  - bigrams/trigrams: distinct, sorted by binary UTF8 order
  *    (ASCII ⇒ identical to DuckDB list_sort order).
  *  - md5 hex lowercase ≡ Spark `md5()` ≡ DuckDB `md5()`.
  *  - SimHash32: bit j = sign of Σ cnt·(2·nibbleBit−1), nibble j/4 of
  *    the token's md5 hex, bit (3−j%4) — the exact arithmetic of the
  *    oracle's strpos/shift formula.
  */
object TextSignatures {

  private def md5Hex(md: MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** Sorted distinct word bigrams ("tok_i tok_i+1") of a space-joined text. */
  case class WordBigrams(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
      val set = new java.util.TreeSet[UTF8String]()
      var i = 0
      while (i < toks.length - 1) {
        set.add(UTF8String.fromString(toks(i) + " " + toks(i + 1)))
        i += 1
      }
      new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Sorted distinct char trigrams; degenerate texts (len<3) yield the
    * whole text, matching `range(1, greatest(len-1, 2))` in the oracle. */
  case class CharTrigrams(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val n = math.max(s.length - 2, 1)
      val set = new java.util.TreeSet[UTF8String]()
      var i = 0
      while (i < n) {
        set.add(UTF8String.fromString(s.substring(i, math.min(i + 3, s.length))))
        i += 1
      }
      new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** All `seeds` min-hashes of a shingle array in one pass:
    * min over shingles of md5("k:" + shingle), per seed k. */
  case class MinHashSig(child: Expression, seeds: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = new Array[String](seeds)
      val md = MessageDigest.getInstance("MD5")
      var i = 0
      while (i < arr.numElements()) {
        val sh = arr.getUTF8String(i).toString
        var k = 0
        while (k < seeds) {
          val h = md5Hex(md, k + ":" + sh)
          if (mins(k) == null || h.compareTo(mins(k)) < 0) mins(k) = h
          k += 1
        }
        i += 1
      }
      new GenericArrayData(mins.map(m =>
        UTF8String.fromString(if (m == null) "" else m): AnyRef))
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Sorted distinct FNV-1a-64 hashes of the word bigrams. Same set
    * algebra as [[WordBigrams]] but each shingle is an 8-byte primitive:
    * the Jaccard merge walk becomes long comparisons with zero
    * allocation (a UTF8String walk allocates per element access —
    * measured ~7 μs/pair vs ~0.7 μs hashed on 100-shingle docs).
    * Set SIZES and intersection COUNTS equal the string form except on
    * 64-bit collisions (P ≈ n²/2⁶⁴ — negligible), so Jaccard scores and
    * the DuckDB string-set oracle agree. */
  case class WordBigramHashes(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < 2) return new GenericArrayData(Array.emptyLongArray)
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < toks.length - 1) {
        var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
        var p = 0
        val s = toks(i) + " " + toks(i + 1)
        while (p < s.length) { h ^= s.charAt(p); h *= 0x100000001b3L; p += 1 }
        set.add(h)
        i += 1
      }
      val arr = new Array[Long](set.size)
      val it = set.iterator(); var k = 0
      while (it.hasNext) { arr(k) = it.next(); k += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** 32-bit term-frequency-weighted SimHash of a space-joined text. */
  case class SimHash32(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
      val counts = new java.util.HashMap[String, Int]()
      toks.foreach(t => counts.merge(t, 1, Integer.sum))
      val votes = new Array[Long](32)
      val md = MessageDigest.getInstance("MD5")
      counts.forEach { (tok, cnt) =>
        val hex = md5Hex(md, tok)
        var j = 0
        while (j < 32) {
          val nibble = Character.digit(hex.charAt(j / 4), 16)
          val bit = (nibble >> (3 - j % 4)) & 1
          votes(j) += cnt.toLong * (bit * 2 - 1)
          j += 1
        }
      }
      var sh = 0L
      var j = 0
      while (j < 32) { if (votes(j) > 0) sh |= 1L << j; j += 1 }
      sh
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  def wordBigrams(text: Column): Column =
    ColumnBridge.column(WordBigrams(ColumnBridge.expression(text)))
  def wordBigramHashes(text: Column): Column =
    ColumnBridge.column(WordBigramHashes(ColumnBridge.expression(text)))
  def charTrigrams(text: Column): Column =
    ColumnBridge.column(CharTrigrams(ColumnBridge.expression(text)))
  def minHashSig(shingles: Column, seeds: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), seeds))
  def simHash32(text: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(text)))
}
