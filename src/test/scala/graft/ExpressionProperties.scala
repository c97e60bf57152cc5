package graft

import graft.functions.{DotProductD, SortedIntersectCount, SortedIntersectCountLong}
import graft.functions.TextSignatures
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties over the custom expressions' eval functions
  * (no SparkSession: pure interpreter-path checks against Scala
  * reference semantics; plan-level equivalence lives in the specs). */
object ExpressionProperties extends Properties("graft.expressions") {

  private val lit = Literal(1) // placeholder child, never evaluated
  private def longs(a: Seq[Long]) = new GenericArrayData(a.toArray)
  private def doubles(a: Seq[Double]) = new GenericArrayData(a.toArray)
  private def strings(a: Seq[String]) =
    new GenericArrayData(a.map(UTF8String.fromString(_): AnyRef).toArray)

  private val longSet = Gen.listOf(Gen.choose(-1000L, 1000L)).map(_.distinct.sorted)
  private val vec = Gen.listOfN(8, Gen.choose(-100.0, 100.0))
  private val text = Gen.listOf(Gen.oneOf("the", "a", "spark", "join", "sort", "key"))
    .map(_.mkString(" "))

  property("sortedIntersectCountLong == Set.intersect.size") =
    Prop.forAll(longSet, longSet) { (a, b) =>
      SortedIntersectCountLong(lit, lit)
        .nullSafeEval(longs(a), longs(b)) == a.toSet.intersect(b.toSet).size
    }

  property("sortedIntersectCount (strings) == Set.intersect.size") =
    Prop.forAll(Gen.listOf(Gen.identifier).map(_.distinct.sorted)) { a =>
      val half = a.filter(_.hashCode % 2 == 0)
      SortedIntersectCount(lit, lit)
        .nullSafeEval(strings(a), strings(half)) == half.toSet.intersect(a.toSet).size
    }

  property("dot == sequential fold, symmetric") = Prop.forAll(vec, vec) { (a, b) =>
    val d = DotProductD(lit, lit)
    val fold = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
    d.nullSafeEval(doubles(a), doubles(b)) == fold &&
      d.nullSafeEval(doubles(a), doubles(b)) == d.nullSafeEval(doubles(b), doubles(a))
  }

  property("wordBigrams == reference set semantics") = Prop.forAll(text) { t =>
    val toks = t.split(" ", -1)
    val expected = toks.sliding(2).filter(_.length == 2)
      .map(_.mkString(" ")).toSeq.distinct.sorted
    val got = TextSignatures.WordBigrams(lit)
      .nullSafeEval(UTF8String.fromString(t)).asInstanceOf[ArrayData]
    (0 until got.numElements()).map(got.getUTF8String(_).toString) == expected
  }

  property("wordBigramHashes size == wordBigrams size (no collisions at this scale)") =
    Prop.forAll(text) { t =>
      val s = TextSignatures.WordBigrams(lit)
        .nullSafeEval(UTF8String.fromString(t)).asInstanceOf[ArrayData]
      val h = TextSignatures.WordBigramHashes(lit)
        .nullSafeEval(UTF8String.fromString(t)).asInstanceOf[ArrayData]
      s.numElements() == h.numElements()
    }

  property("wordNgramHashes(n=2) == wordBigramHashes") = Prop.forAll(text) { t =>
    val a = TextSignatures.WordNgramHashes(lit, 2)
      .nullSafeEval(UTF8String.fromString(t)).asInstanceOf[ArrayData]
    val b = TextSignatures.WordBigramHashes(lit)
      .nullSafeEval(UTF8String.fromString(t)).asInstanceOf[ArrayData]
    (0 until a.numElements()).map(a.getLong) == (0 until b.numElements()).map(b.getLong)
  }

  property("wordNgramHashes counts sliding distinct n-grams") =
    Prop.forAll(text, Gen.choose(2, 6)) { (t, n) =>
      val toks = t.split(" ", -1)
      val expected = toks.sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toSet.size
      TextSignatures.WordNgramHashes(lit, n)
        .nullSafeEval(UTF8String.fromString(t))
        .asInstanceOf[ArrayData].numElements() == expected
    }

  property("wordNgramPosHashes: slot i = hash of gram at token i+1; sort∘distinct == wordNgramHashes") =
    Prop.forAll(text, Gen.choose(2, 6)) { (t, n) =>
      val toks = t.split(" ", -1)
      val pos = TextSignatures.WordNgramPosHashes(lit, n)
        .nullSafeEval(UTF8String.fromString(t)).asInstanceOf[ArrayData]
      val posSeq = (0 until pos.numElements()).map(pos.getLong)
      val set = TextSignatures.WordNgramHashes(lit, n)
        .nullSafeEval(UTF8String.fromString(t)).asInstanceOf[ArrayData]
      val setSeq = (0 until set.numElements()).map(set.getLong)
      // length = sliding-window count; order = token order (two texts
      // sharing a gram at different offsets hash identically, which is
      // exactly what span seeding needs); collapsing to a sorted set
      // reproduces the distinct form bit-for-bit
      posSeq.length == math.max(0, toks.length - n + 1) &&
        posSeq.distinct.sorted == setSeq
    }

  property("simhash is permutation-invariant (bag semantics)") = Prop.forAll(text) { t =>
    val toks = t.split(" ", -1)
    val shuffled = scala.util.Random.shuffle(toks.toList).mkString(" ")
    val e = TextSignatures.SimHash32(lit)
    e.nullSafeEval(UTF8String.fromString(t)) ==
      e.nullSafeEval(UTF8String.fromString(shuffled))
  }

  property("hashEmbed8 == md5-bucket histogram of the token bag") =
    Prop.forAll(text) { t =>
      val md = java.security.MessageDigest.getInstance("MD5")
      def bucket(tok: String): Int = {
        val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
        Integer.parseInt(hex.take(4), 16) % 8
      }
      val expected = Array.fill(8)(0.0)
      t.split(" ", -1).foreach(tok => expected(bucket(tok)) += 1.0)
      val got = TextSignatures.HashEmbed8(lit)
        .nullSafeEval(UTF8String.fromString(t)).asInstanceOf[ArrayData]
      (0 until 8).map(got.getDouble) == expected.toSeq
    }

  property("minhash signature entries are min over per-seed hashes") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.identifier).map(_.distinct)) { shingles =>
      val got = TextSignatures.MinHashSig(lit, 4)
        .nullSafeEval(strings(shingles)).asInstanceOf[ArrayData]
      val md = java.security.MessageDigest.getInstance("MD5")
      def md5hex(s: String) =
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 4).forall { k =>
        got.getUTF8String(k).toString == shingles.map(sh => md5hex(s"$k:$sh")).min
      }
    }

  private val bpeToks = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
  private def bpeApply(t: String, a: String, b: String): String =
    TextSignatures.BpeMergeApply(lit, lit, lit)
      .nullSafeEval(UTF8String.fromString(t),
        UTF8String.fromString(a), UTF8String.fromString(b)).toString

  property("bpe merge walk == sequential fold (any text, any pair incl. a==b)") =
    Prop.forAll(bpeToks, Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")) { (t, a, b) =>
      def fold(s: String): String = s.split(" ", -1).toList match {
        case h :: rest => rest.foldLeft(h) { (acc, tok) =>
          val last = acc.split(" ", -1).last
          if (last == a && tok == b) acc.dropRight(last.length) + a + "_" + b
          else acc + " " + tok
        }
        case Nil => ""
      }
      bpeApply(t, a, b) == fold(t)
    }

  property("bpe merge leaves no adjacent (a,b) pair behind") =
    Prop.forAll(bpeToks, Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")) { (t, a, b) =>
      val out = bpeApply(t, a, b).split(" ", -1)
      !out.sliding(2).exists {
        case Array(x, y) => x == a && y == b
        case _           => false
      }
    }

  private val accented = Gen.listOf(Gen.oneOf(
    "é", "ï", "plain", "a", "ô")).map(_.mkString(" "))

  property("nfc normalize == java.text.Normalizer and is idempotent") =
    Prop.forAll(accented) { t =>
      val got = TextSignatures.NfcNormalize(lit)
        .nullSafeEval(UTF8String.fromString(t)).toString
      val ref = java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFC)
      val twice = TextSignatures.NfcNormalize(lit)
        .nullSafeEval(UTF8String.fromString(got)).toString
      got == ref && twice == got
    }
}
