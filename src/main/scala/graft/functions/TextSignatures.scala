package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
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
    * min over shingles of md5("k:" + shingle), per seed k.
    *
    * Works on raw 16-byte digests: hex('0'-'9','a'-'f') is monotone in
    * the byte value, so lexicographic hex order == unsigned byte order —
    * the min runs on byte arrays and only the final `seeds` winners are
    * hex-encoded. Per (seed, shingle) there is no string concat, no
    * getBytes, no hex conversion: just two MessageDigest.update calls
    * (precomputed "k:" prefix + shingle bytes) and a digest. */
  case class MinHashSig(child: Expression, seeds: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val seedPrefixes: Array[Array[Byte]] =
      Array.tabulate(seeds)(k =>
        (k + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = new Array[Array[Byte]](seeds)
      val md = MessageDigest.getInstance("MD5")
      var i = 0
      while (i < arr.numElements()) {
        val shBytes = arr.getUTF8String(i).getBytes
        var k = 0
        while (k < seeds) {
          md.update(seedPrefixes(k))
          md.update(shBytes)
          val h = md.digest()
          if (mins(k) == null || unsignedLt(h, mins(k))) mins(k) = h
          k += 1
        }
        i += 1
      }
      new GenericArrayData(mins.map { m =>
        if (m == null) UTF8String.EMPTY_UTF8
        else {
          val sb = new java.lang.StringBuilder(32)
          var b = 0
          while (b < m.length) {
            sb.append(Character.forDigit((m(b) >> 4) & 0xf, 16))
            sb.append(Character.forDigit(m(b) & 0xf, 16))
            b += 1
          }
          UTF8String.fromString(sb.toString)
        }: AnyRef
      })
    }
    private def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
      var i = 0
      while (i < a.length) {
        val cmp = (a(i) & 0xff) - (b(i) & 0xff)
        if (cmp != 0) return cmp < 0
        i += 1
      }
      false
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

  /** ORDERED, non-distinct word n-gram FNV-1a-64 hashes: slot i
    * (0-based) is the gram starting at token i+1 — the positioned form
    * [[WordNgramHashes]] discards, for span-resolving ops
    * (exact-substring dedup) where a gram's OFFSET is the payload.
    * Same one-pass-per-document cost model; the contract
    * sort(distinct(this)) == WordNgramHashes is property-tested. */
  case class WordNgramPosHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
      val out = new Array[Long](toks.length - n + 1)
      var i = 0
      while (i <= toks.length - n) {
        var h = 0xcbf29ce484222325L
        var k = 0
        while (k < n) {
          if (k > 0) { h ^= ' '; h *= 0x100000001b3L }
          val s = toks(i + k)
          var p = 0
          while (p < s.length) { h ^= s.charAt(p); h *= 0x100000001b3L; p += 1 }
          k += 1
        }
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Sorted distinct FNV-1a-64 hashes of word n-grams — the general-n
    * form of [[WordBigramHashes]] (same set algebra, same collision
    * argument). Used by decontamination, where the overlap unit is a
    * longer n-gram (5 here) than near-dup shingling uses. */
  case class WordNgramHashes(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
      if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
      val set = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i <= toks.length - n) {
        var h = 0xcbf29ce484222325L
        var k = 0
        while (k < n) {
          if (k > 0) { h ^= ' '; h *= 0x100000001b3L }
          val s = toks(i + k)
          var p = 0
          while (p < s.length) { h ^= s.charAt(p); h *= 0x100000001b3L; p += 1 }
          k += 1
        }
        set.add(h)
        i += 1
      }
      val arr = new Array[Long](set.size)
      val it = set.iterator(); var j = 0
      while (it.hasNext) { arr(j) = it.next(); j += 1 }
      new GenericArrayData(arr)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Unicode NFC normalization (java.text.Normalizer). Canonical
    * composition is the precondition for every content-identity op on
    * multilingual text — "café" in NFC and NFD hash differently, so
    * exact dedup, fingerprints, and decontamination silently miss
    * equal documents unless the corpus is normalized first. Spark has
    * no built-in; this is the same CodegenFallback unary shape as the
    * signature family. The fast path skips the (allocating) normalize
    * call when `Normalizer.isNormalized` already holds — true for
    * ASCII-dominant corpora, so the common case is a scan-speed no-op. */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
      else UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Apply one BPE merge (A, B) → "A_B" to a space-tokenized text:
    * greedy left-to-right non-overlapping pair replacement — the merge
    * step of byte-pair-encoding tokenizer training. Equivalent to the
    * sequential fold `acc, t → if last(acc)=A ∧ t=B then merge else
    * append` (the form the DuckDB oracle runs via list_reduce); the
    * imperative walk here is the fast path — no per-step string scans.
    * '_' is safe as the join glue for this corpus ([a-z0-9] vocab). */
  case class BpeMergeApply(text: Expression, a: Expression, b: Expression)
      extends TernaryExpression with CodegenFallback {
    override def first: Expression = text
    override def second: Expression = a
    override def third: Expression = b
    override def dataType: DataType = StringType
    override def nullSafeEval(tIn: Any, aIn: Any, bIn: Any): Any = {
      val toks = tIn.asInstanceOf[UTF8String].toString.split(" ", -1)
      val av = aIn.asInstanceOf[UTF8String].toString
      val bv = bIn.asInstanceOf[UTF8String].toString
      val merged = av + "_" + bv
      val out = new StringBuilder(toks.length * 8)
      var i = 0
      while (i < toks.length) {
        if (out.nonEmpty) out.append(' ')
        if (i < toks.length - 1 && toks(i) == av && toks(i + 1) == bv) {
          out.append(merged); i += 2
        } else { out.append(toks(i)); i += 1 }
      }
      UTF8String.fromString(out.toString)
    }
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): Expression =
      copy(text = f, a = s, b = t)
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

  /** 64-bit SimHash: same vote arithmetic as [[SimHash32]] but over 64
    * bit positions (hex chars 0-15 of the md5, 4 bits per char): bit
    * j's vote uses nibble j/4, bit (3 - j%4). The
    * wider signature exists for the 16-bit-chunk multi-index
    * (Graft.simhash64NearDups): 4 chunks × 65536 values keeps blocking
    * buckets duplicate-dominated at corpus sizes where the byte index
    * saturates. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
      val counts = new java.util.HashMap[String, Int]()
      toks.foreach(t => counts.merge(t, 1, Integer.sum))
      val votes = new Array[Long](64)
      val md = MessageDigest.getInstance("MD5")
      counts.forEach { (tok, cnt) =>
        val hex = md5Hex(md, tok)
        var j = 0
        while (j < 64) {
          val nibble = Character.digit(hex.charAt(j / 4), 16)
          val bit = (nibble >> (3 - j % 4)) & 1
          votes(j) += cnt.toLong * (bit * 2 - 1)
          j += 1
        }
      }
      var sh = 0L
      var j = 0
      while (j < 64) { if (votes(j) > 0) sh |= 1L << j; j += 1 }
      sh
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** 8-bucket hashing-trick term-frequency vector of a space-split text:
    * bucket d counts tokens whose md5-first-4-hex-chars ≡ d (mod 8) —
    * the exact arithmetic of the explode/groupBy formulation
    * (`conv(substring(md5(tok),1,4),16,10) % 8`) and its DuckDB oracle,
    * in one pass per document. Replaces a token explode (~50× row blowup)
    * + hash aggregate + shuffle with map-side-only work: the V1 embed
    * stage (reference: `embedding_engine.py:15-22`) becomes shuffle-FREE,
    * which at 100 TB means the embedding pass is pure scan throughput. */
  case class HashEmbed8(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
      val counts = new Array[Double](8)
      val md = MessageDigest.getInstance("MD5")
      var i = 0
      while (i < toks.length) {
        val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 4 hex chars == first 2 bytes; % 8 == low 3 bits of byte 1
        counts((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 8) += 1.0
        i += 1
      }
      new GenericArrayData(counts)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Content-defined chunk boundary positions (1-based, ascending):
    * position i ∈ [8, len] is a boundary when md5 of the trailing
    * 8-char gram text[i−7..i] has low nibble 0 (≡ the SQL recipe
    * `('0x' || substr(md5(substr(text, i−7, 8)), 1, 2)) % 16 = 0` —
    * the first hex-pair is digest byte 0, its % 16 is the low
    * nibble). One pass per document instead of a ×len position
    * explode: the boundary rate is 1/16, so the explode materialized
    * 16× more rows than boundaries and then shuffled them into a
    * per-doc window; this expression emits the ~len/16-element array
    * map-side and the chunk-length census needs no per-doc shuffle at
    * all. Returns an empty array for texts shorter than the gram.
    * Positions and grams are CODEPOINT-indexed (r9 advice): the
    * consumers slice chunks with Spark `substring`/`length` and the
    * oracle with DuckDB `substr`/`length`, both codepoint-based, so a
    * UTF-16 index would shift every boundary after a non-BMP char. */
  case class CdcBoundaries(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
      val md = MessageDigest.getInstance("MD5")
      val out = new scala.collection.mutable.ArrayBuffer[Any](cps.length / 12 + 4)
      var i = 8
      while (i <= cps.length) {
        val d = md.digest(new String(cps, i - 8, 8)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if ((d(0) & 0x0f) == 0) out += i.toLong
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  }

  /** Consistent-hash ring successor: first ring position ≥ h (binary
    * search over the DRIVER-SORTED (pos, shard) ring), wrapping to
    * index 0. Equivalent to `array_min(filter(ring, pos ≥ h))` with
    * global-min wrap over a struct(pos, sh) literal array — but that
    * HOF runs an interpreted lambda with per-element boxing per row
    * (144 comparisons × 2 rings: measured ~1 s at sf0.1); this is a
    * ~7-step binary search of a primitive long array. `positions`
    * MUST be sorted ascending with `shards` aligned; ties on pos
    * resolve to the lowest index = the smallest shard id, matching
    * the struct-min tie-break. */
  case class RingSuccessor(child: Expression,
      positions: Array[Long], shards: Array[Long])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val h = input.asInstanceOf[Long]
      var lo = 0
      var hi = positions.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (positions(mid) >= h) hi = mid else lo = mid + 1
      }
      shards(if (lo == positions.length) 0 else lo)
    }
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
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
  def simHash64(text: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(text)))
  def hashEmbed8(text: Column): Column =
    ColumnBridge.column(HashEmbed8(ColumnBridge.expression(text)))
  def cdcBoundaries(text: Column): Column =
    ColumnBridge.column(CdcBoundaries(ColumnBridge.expression(text)))
  def ringSuccessor(hash: Column, ring: Seq[(Long, Long)]): Column = {
    val sorted = ring.sortBy(identity).toArray
    ColumnBridge.column(RingSuccessor(ColumnBridge.expression(hash),
      sorted.map(_._1), sorted.map(_._2)))
  }
  def wordNgramHashes(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramHashes(ColumnBridge.expression(text), n))
  def wordNgramPosHashes(text: Column, n: Int): Column =
    ColumnBridge.column(WordNgramPosHashes(ColumnBridge.expression(text), n))
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
  def bpeMergeApply(text: Column, a: Column, b: Column): Column =
    ColumnBridge.column(BpeMergeApply(ColumnBridge.expression(text),
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
