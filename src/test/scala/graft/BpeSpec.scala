package graft

import graft.functions.{bpe, BpeTable, BpeUtil, BpeVocab}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Pins the real merge-table BPE kernel: the merge-loop contract
  * (lowest-rank pair, leftmost occurrence, one merge per iteration),
  * the id assignment, and codegen/interpreted agreement. Value-level
  * corpus grading is tx11/tx12's DuckDB oracle (an independent
  * recursive-CTE restatement of the same loop).
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def toks(word: String): Seq[Int] =
    BpeVocab.table.tokenizeWord(word).toSeq

  private def strings(word: String): Seq[String] = {
    val id2tok = BpeVocab.Tokens.toMap
    toks(word).map(id2tok)
  }

  test("known tokenizations (hand-derived from the merge table)") {
    // whole-word merges land one token
    assert(strings("the") == Seq("the"))
    assert(strings("window") == Seq("window"))
    assert(strings("query") == Seq("query"))
    // deliberate interference leaves partial tokenizations:
    // (u,m) rank 26 fires before (col,um) can ever see an 'um'
    assert(strings("column") == Seq("c", "o", "l", "um", "n"))
    // (s,t)@10 beats (s,p)@89: spark -> s|par|k, never sp|ar|k
    assert(strings("spark") == Seq("s", "par", "k"))
    assert(strings("customer") == Seq("c", "u", "st", "om", "er"))
    assert(strings("fast") == Seq("f", "a", "st"))
  }

  test("rank priority: the lowest-rank applicable merge fires first") {
    // "then": (t,h)@0 then (th,e)@1 then pair (the,n) unknown -> 2 toks
    assert(strings("then") == Seq("the", "n"))
    // "inin": (i,n)@2 leftmost, then again -> [in, in]
    assert(strings("inin") == Seq("in", "in"))
  }

  test("id assignment: letters 0..25, merge outputs 26+rank, unknown -1") {
    assert(toks("a") == Seq(0))
    assert(toks("z") == Seq(25))
    assert(toks("th") == Seq(26)) // rank-0 merge output
    assert(BpeVocab.table.tokenizeWord("x1y").toSeq == Seq(23, -1, 24))
    assert(BpeVocab.TokenIds.size == 126) // 26 letters + 100 merges
  }

  test("count kernel equals id-array length on edge cases") {
    val cases = Seq("", " ", "  ", "the", "the the", "a  b",
      "spark window column", "zzz qqq", "x1y !?")
    for (c <- cases) {
      val n = BpeUtil.count(UTF8String.fromString(c), BpeVocab.table)
      val ids = BpeUtil.tokenIds(UTF8String.fromString(c), BpeVocab.table)
      assert(n == ids.numElements(), s"count/ids disagree on '$c'")
    }
    assert(BpeUtil.count(UTF8String.fromString(""), BpeVocab.table) == 0L)
    assert(BpeUtil.count(UTF8String.fromString("  "), BpeVocab.table) == 0L)
  }

  test("codegen path agrees with direct evaluation over the corpus") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val viaDf = docs
      .select($"doc_id", bpe.bpe_count($"text").as("n"),
        bpe.bpe_token_ids($"text").as("ids"), $"text")
      .collect()
    // fresh table (empty memo) so the cache can't mask a compute bug
    val fresh = new BpeTable(BpeVocab.Merges)
    viaDf.foreach { r =>
      val direct = r.getString(3).split(" ", -1).filter(_.nonEmpty)
        .flatMap(fresh.tokenizeWord).toSeq
      assert(r.getLong(1) == direct.length, s"doc ${r.getLong(0)} count")
      assert(r.getSeq[Int](2) == direct, s"doc ${r.getLong(0)} ids")
    }
  }

  test("packing on real counts: seq_id derives from the true prefix sum") {
    val df = Seq(("s1", 1L, "the the the"), ("s1", 2L, "window"),
      ("s1", 3L, "column column")).toDF("source", "doc_id", "text")
      .select($"source", $"doc_id",
        graft.ops.TextAnalysis.bpeCount($"text").as("bpe"))
    val packed = graft.ops.TextAnalysis
      .packSequences(df, "source", "doc_id", "bpe", 5L)
      .select($"doc_id", $"seq_id").as[(Long, Long)].collect().toMap
    // counts: 3, 1, 10 -> cum 3, 4, 14 -> starts 0, 3, 4 -> seq 0, 0, 0
    assert(packed == Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
    val packed2 = graft.ops.TextAnalysis
      .packSequences(df, "source", "doc_id", "bpe", 4L)
      .select($"doc_id", $"seq_id").as[(Long, Long)].collect().toMap
    // ctx 4: starts 0, 3, 4 -> seq 0, 0, 1
    assert(packed2 == Map(1L -> 0L, 2L -> 0L, 3L -> 1L))
  }

  test("decode is the space-free inverse; strict null on any bad id") {
    // direct round trip over the corpus (codegen path)
    val rows = Tables.documents(spark, sfDir).limit(200)
      .select($"text",
        bpe.bpe_decode(bpe.bpe_token_ids($"text")).as("dec"))
      .collect()
    rows.foreach { r =>
      val t = r.getString(0)
      if (t.forall(c => c == ' ' || (c >= 'a' && c <= 'z')))
        assert(r.getString(1) == t.replace(" ", ""), s"round trip of '$t'")
      else assert(r.isNullAt(1), s"unknown chars must null-decode: '$t'")
    }
    // strictness: one bad id anywhere nulls the row — never a shrunk text
    val bad = Seq(Array(0, -1, 2), Array(9999), Array(-1)).toDF("ids")
      .select(bpe.bpe_decode($"ids").as("d")).collect()
    assert(bad.forall(_.isNullAt(0)))
    // empty decodes to empty, not null
    assert(Seq(Array.empty[Int]).toDF("ids")
      .select(bpe.bpe_decode($"ids")).head().getString(0) == "")
  }
}
