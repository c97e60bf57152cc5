package graft

import graft.operators.PrepOps
import org.apache.spark.sql.functions._

/** Chunking / packing semantics beyond the oracle hash-match. */
class PrepOpsSpec extends SparkSpec {

  test("chunks cover every token with the declared overlap") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 80).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = PrepOps.chunkDocuments(docs)
      .select($"doc_id", $"chunk_idx", $"chunk_text")
      .collect().sortBy(_.getInt(1))
    // 80 tokens, stride 24 -> 4 windows starting at 1, 25, 49, 73
    assert(chunks.length == 4)
    val texts = chunks.map(_.getString(2).split(" "))
    assert(texts(0).head == "t1" && texts(0).last == "t32")
    assert(texts(1).head == "t25") // 8-token overlap with window 0
    assert(texts(3).head == "t73" && texts(3).last == "t80") // short tail
    // union of windows covers all 80 tokens
    assert(texts.flatten.toSet.size == 80)
  }

  test("chunk invariants hold across random document lengths") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val sizes = Seq(1, 2, 23, 24, 25, 31, 32, 33) ++ Seq.fill(8)(rnd.nextInt(300) + 1)
    val docs = sizes.zipWithIndex
      .map { case (n, id) => (id.toLong, (1 to n).map(i => s"w$i").mkString(" ")) }
      .toDF("doc_id", "text")
    val chunks = PrepOps.chunkDocuments(docs).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(1))).toMap
    sizes.zipWithIndex.foreach { case (n, id) =>
      val cs = chunks(id.toLong)
      assert(cs.length == (n + 23) / 24, s"n=$n")         // ceil(n/stride) windows
      assert(cs.map(_.getInt(1)).toSeq == (0 until cs.length)) // contiguous idx
      val toks = cs.flatMap(_.getString(3).split(" ").filter(_.nonEmpty))
      assert(toks.toSet.size == n, s"n=$n")                // full coverage
      // declared length == min(chunkLen, remaining) == actual word count
      cs.foreach { c =>
        val i = c.getInt(1)
        assert(c.getInt(2) == math.min(32, n - i * 24), s"n=$n i=$i")
        assert(c.getString(3).split(" ").count(_.nonEmpty) == c.getInt(2), s"n=$n i=$i")
      }
    }
  }

  test("packing partitions each stratum's token mass exactly") {
    val batches = PrepOps.queries("pack_sequences")(spark, sf).collect()
    val byLang = batches.groupBy(_.getString(0))
    val totals = Tables.documents(spark, sf)
      .groupBy(col("lang"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (lang, rows) =>
      // batch ids contiguous from 0; token mass conserved
      assert(rows.map(_.getLong(1)).sorted.toSeq == (0L until rows.length).toSeq)
      assert(rows.map(_.getLong(3)).sum == totals(lang))
      // every batch but the stratum's last one fills past the budget line:
      // its last doc's cum crosses into the next 4096 block by construction
      val nonLast = rows.sortBy(_.getLong(1)).dropRight(1)
      val cums = nonLast.map(_.getLong(3)).scanLeft(0L)(_ + _).drop(1)
      cums.zipWithIndex.foreach { case (c, i) =>
        assert(c > 4096L * (i + 1) - 4096 && c <= 4096L * (i + 1))
      }
    }
  }

  test("chunk maxP: doc score equals the max over its chunks' scores") {
    import spark.implicits._
    import graft.functions.VectorFns.{dot, l2Norm}
    val got = operators.PrepOps.queries("retrieval_chunk_maxp")(spark, sf).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
    }
    // recompute one (qid, doc) pair brute-force over all its chunks
    val pick = got.head
    val chunks = operators.PrepOps.chunkDocuments(
        Tables.documents(spark, sf).filter($"doc_id" === pick.getLong(2)))
      .select(graft.functions.TextSignatures.hashEmbed8($"chunk_text").as("cv"))
    val qv = Seq(1 -> "spark hash join", 2 -> "table scan fast", 3 -> "sort merge batch")
      .toDF("qid", "qtext")
      .filter($"qid" === pick.getInt(0))
      .select(graft.functions.TextSignatures.hashEmbed8($"qtext").as("qv"))
    val best = chunks.crossJoin(qv)
      .select(floor(dot($"qv", $"cv") / (l2Norm($"qv") * l2Norm($"cv")) * 1e9 + 0.5)
        .cast("long").as("c"))
      .agg(max($"c")).head().getLong(0)
    assert(best == pick.getLong(3))
  }
}
