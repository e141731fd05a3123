package graft

import graft.operators.TextAnalysis

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference single-node BPE (Sennrich et al. 2016 alg. 1): word-count
    * dict, symbol lists, argmax pair by (count desc, wrapped-pair asc),
    * greedy left-to-right within-word merge. Deliberately independent of
    * the Spark implementation (lists + loops, no string replace).
    */
  private def referenceBpe(words: Map[String, Long],
                           m: Int): Seq[(Int, String, Long)] = {
    var vocab = words.map { case (w, c) => w.map(_.toString).toList -> c }.toSeq
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    for (r <- 1 to m) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.nonEmpty) {
        val best = counts.toSeq.minBy { case ((l, r2), c) =>
          (-c, s"<$l><$r2>")
        }
        val ((l, r2), c) = best
        out += ((r, s"<$l><$r2>", c))
        vocab = vocab.map { case (syms, cnt) =>
          val merged = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r2) {
              merged += (l + r2); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toList -> cnt
        }
      }
    }
    out.toSeq
  }

  test("bpeMerges matches the reference algorithm on real docs (differential)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = TextAnalysis.bpeMerges(docs, 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
    val words = TextAnalysis.bpeWordTable(docs).collect()
      .map(r => r.getString(0).stripPrefix("<").stripSuffix(">")
        .split("><").mkString -> r.getLong(1)).toMap
    val want = referenceBpe(words, 10)
    assert(got == want, s"\ngot:  $got\nwant: $want")
  }

  test("greedy within-word application: runs and alternations merge left-to-right") {
    // 'xyxyxy' * 3 + 'aaa' * 2: merge (x,y) must take positions 0-1, 2-3,
    // 4-5 (alternation keeps all three), merge (a,a) must take 0-1 only
    // (overlap drops the middle)
    val docs = Seq((1L, "xyxyxy xyxyxy xyxyxy aaa aaa"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    // round 1: (x,y) count 9 wins over (y,x) count 6 and (a,a) count 4
    assert(got(0) == ((1, "<x><y>", 9L)))
    // round 2: after merging, (xy,xy) appears 6 times ((a,a) still 4)
    assert(got(1) == ((2, "<xy><xy>", 6L)))
    // round 3: (a,a) 4 — the overlapping middle pair was NOT double-counted
    // at application time: 'aaa' still contributes pairs (a,a),(a,a)
    assert(got(2)._2 == "<a><a>" && got(2)._3 == 4L)
  }

  test("bpeSegmentCounts: zero-exchange segmentation, merges compress tokens") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = TextAnalysis.bpeSegmentCounts(docs, 5)
    val rows = q.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2)))
    // at least one subword per token; merges only ever reduce the count
    rows.foreach { case (id, nTok, nSub) =>
      assert(nSub >= nTok, s"doc $id: $nSub subwords < $nTok tokens")
    }
    val charTotal = docs.select(
      aggregate(transform(tokens(normalizeText(col("text"))),
        t => length(t).cast("long")), lit(0L), (a, x) => a + x).as("s"))
      .agg(sum(col("s"))).head().getLong(0)
    val subTotal = rows.map(_._3).sum
    assert(subTotal < charTotal,
      s"no merge ever applied: $subTotal !< $charTotal")
    // the segmentation pass itself is one fused projection — training ran
    // eagerly at plan-construction time, so the RETURNED plan has no
    // exchange at all
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("property: distributed trainer == reference on random corpora") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // small alphabet forces merge collisions, runs, and ties — the cases
    // where greedy order and tie-breaking actually decide the output
    val word = for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val corpus = for {
      k <- Gen.choose(5, 20)
      ws <- Gen.listOfN(k, word)
    } yield ws
    (1 to 8).foreach { i =>
      val ws = corpus.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val docs = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
      val got = TextAnalysis.bpeMerges(docs, 5).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val counts = ws.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
      val want = referenceBpe(counts, 5)
      assert(got == want, s"seed $i corpus $ws\ngot:  $got\nwant: $want")
    }
  }

  test("bpeMerges is deterministic and vocabulary-bounded (no corpus re-read)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextAnalysis.bpeMerges(docs, 5).collect().toSeq
    val b = TextAnalysis.bpeMerges(docs, 5).collect().toSeq
    assert(a == b)
    assert(a.size == 5)
  }
}
