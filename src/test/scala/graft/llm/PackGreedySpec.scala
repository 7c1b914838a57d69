package graft.llm

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class PackGreedySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(13)
  // lengths 1..70 against target 48: multi-doc fills AND overlong singletons
  private val corpus: Seq[(Long, String)] = (0L until 150L)
    .map(i => i -> Seq.fill(1 + rnd.nextInt(70))("w" + rnd.nextInt(9)).mkString(" "))
  private def df = corpus.toDF("doc_id", "text")
  private val target = 48

  private lazy val out = Packing.packGreedy(df, "doc_id", "text", target, shards = 3)
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("law: equals the sequential next-fit simulation over the shardShuffle order") {
    val ord = Packing.shardShuffle(df, "doc_id", shards = 3).collect().map { r =>
      (r.getLong(r.fieldIndex("shard")), r.getLong(r.fieldIndex("pos")),
        r.getLong(r.fieldIndex("doc_id")),
        TextOps.tokensJvm(r.getString(r.fieldIndex("text"))).length.toLong)
    }
    val expected = ord.groupBy(_._1).toSeq.flatMap { case (sh, rows) =>
      var seq = -1L
      var fill = 0L
      rows.sortBy(_._2).map { case (_, _, id, n) =>
        if (seq < 0 || fill + n > target) { seq += 1; fill = 0L }
        val off = fill
        fill += n
        (sh, seq, id, off, n)
      }
    }.toSet
    assert(out.toSet === expected)
  }

  test("laws: full coverage, contiguous offsets, budget respected, seq ids consecutive") {
    assert(out.length === 150 && out.map(_._3).toSet === (0L until 150L).toSet)
    out.groupBy(t => (t._1, t._2)).foreach { case ((sh, sq), ds) =>
      val sorted = ds.sortBy(_._4)
      assert(sorted.head._4 === 0L, s"seq $sh/$sq does not start at offset 0")
      sorted.iterator.sliding(2).withPartial(false).foreach { w =>
        assert(w(1)._4 === w(0)._4 + w(0)._5, s"gap inside seq $sh/$sq")
      }
      assert(ds.map(_._5).sum <= target || ds.length == 1,
        s"multi-doc sequence $sh/$sq over budget")
    }
    out.groupBy(_._1).foreach { case (sh, ds) =>
      val seqs = ds.map(_._2).distinct.sorted
      assert(seqs === (0L until seqs.length).toSeq, s"shard $sh seq ids not consecutive")
    }
    // the fixture actually exercised the overlong-singleton path
    assert(out.exists(t => t._5 > target))
  }

  test("law: deterministic across runs; salt changes the layout") {
    val again = Packing.packGreedy(df, "doc_id", "text", target, shards = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.toSet === out.toSet)
    val other = Packing.packGreedy(df, "doc_id", "text", target, shards = 3, salt = "other")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(other.toSet !== out.toSet)
  }
}
