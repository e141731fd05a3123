package graft

import org.apache.spark.sql.functions._
import graft.operators.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("manifest: checksum is order-independent and flips on any content change") {
    val base = Seq(
      (1L, "alpha beta", "en", "s1", 10L),
      (2L, "gamma delta", "en", "s1", 11L),
      (3L, "epsilon", "en", "s2", 7L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m1 = CorpusOps.manifest(base).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m1("s1")._1 == 2L && m1("s1")._2 == 4L)
    assert(m1("s2")._1 == 1L && m1("s2")._2 == 1L)
    // row order / partitioning can't move the checksum
    val m2 = CorpusOps.manifest(base.orderBy($"doc_id".desc).repartition(7))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m2("s1") == m1("s1")._3 && m2("s2") == m1("s2")._3)
    // a one-character edit flips the source's checksum, others untouched
    val edited = base.withColumn("text",
      when($"doc_id" === 2L, lit("gamma deltb")).otherwise($"text"))
    val m3 = CorpusOps.manifest(edited).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m3("s1") != m1("s1")._3 && m3("s2") == m1("s2")._3)
    // identical text in two docs still contributes two distinct terms
    val dup = base.withColumn("text",
      when($"doc_id" === 2L, lit("alpha beta")).otherwise($"text"))
    val m4 = CorpusOps.manifest(dup).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(m4("s1") != 0L)
  }

  test("interleave: round-robin spread, no same-source neighbors until exhaustion") {
    val docs = ((1L to 6L).map(i => (i, "a")) ++ (11L to 16L).map(i => (i, "b")) ++
      (21L to 23L).map(i => (i, "c")))
      .map { case (id, s) => (id, "text", "en", s, 4L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = CorpusOps.interleave(docs)
      .orderBy($"interleave_key")
      .select($"source", $"interleave_key").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // keys are unique and the first 9 (3 full rounds of 3 sources) strictly
    // alternate a, b, c
    assert(got.map(_._2).distinct.length == got.length)
    assert(got.take(9).map(_._1).toSeq ==
      Seq("a", "b", "c", "a", "b", "c", "a", "b", "c"), got.toSeq)
    // after source c (3 docs) exhausts, only a/b continue — with gaps in
    // the key, never reuse
    assert(got.drop(9).map(_._1).forall(s => s == "a" || s == "b"))
    // key arithmetic: doc r of source i at (r-1)*3 + (i-1)
    assert(got.count(_._2 % 3 == 0) == 6) // source a emitted 6 keys ≡ 0 mod 3
  }

  test("compaction: file count from the listing, content identical, no shuffle") {
    import org.apache.hadoop.fs.{FileSystem, Path}
    val in = CorpusOps.smallFileDocs(spark, sf)
    val fs = FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def parquetFiles(p: String): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(new Path(p)).filter(f =>
        f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(in)
    assert(before.length == 64, s"fixture not fragmented: ${before.length}")
    val total = before.map(_.getLen).sum
    // quarter-of-total target -> ceil(total / target) = 4 output files
    val quarter = (total + 3) / 4
    CorpusOps.compactDir(spark, in, quarter)
    val afterQuarter = parquetFiles(s"$in-compact").length
    assert(afterQuarter == 4, s"expected 4 compacted files, got $afterQuarter")
    // target >= total -> everything packs into one file
    val out = CorpusOps.compactDir(spark, in, total)
    assert(parquetFiles(s"$in-compact").length == 1)
    // relational content is untouched
    val orig = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    val comp = out.select($"doc_id", $"text", $"lang", $"source", $"n_chars")
    assert(comp.exceptAll(orig).isEmpty && orig.exceptAll(comp).isEmpty)
    // the rewrite plan merges partitions without an exchange
    val plan = spark.read.parquet(in).coalesce(2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1000))
  }

  test("hexThreshold: boundary rates and the 0.05 cell") {
    assert(CorpusOps.hexThreshold(1.0) == "g")
    assert(CorpusOps.hexThreshold(1.5) == "g")
    assert(CorpusOps.hexThreshold(0.0) == "00000000")
    assert(CorpusOps.hexThreshold(-0.1) == "00000000")
    assert(CorpusOps.hexThreshold(0.05) == "0ccccccc")
    assert(CorpusOps.hexThreshold(0.5) == "80000000")
  }

  test("splitAssignments: deterministic, hash-stable, rate-accurate") {
    val docs = spark.range(10000).select($"id".as("doc_id"))
    val a = CorpusOps.splitAssignments(docs, 0.05).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = CorpusOps.splitAssignments(docs, 0.05).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val evalFrac = a.count(_._2 == "eval").toDouble / a.size
    assert(evalFrac > 0.03 && evalFrac < 0.07, s"eval fraction $evalFrac")
    // membership is a pure function of doc_id: a subset of the corpus gets
    // identical assignments (no rank/partition dependence)
    val sub = CorpusOps.splitAssignments(docs.filter($"doc_id" < 100), 0.05)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub.forall { case (id, s) => a(id) == s })
  }

  test("leakageSafeSplit: families never straddle; singletons match the naive split") {
    // labels with three multi-doc families (reps 0, 7, 20) and singletons
    val labels = Seq(
      (0L, 0L), (1L, 0L), (2L, 0L),
      (7L, 7L), (9L, 7L),
      (20L, 20L), (21L, 20L), (25L, 20L)
    ).toDF("doc_id", "cluster_id")
      .union(spark.range(100, 600).select($"id".as("doc_id"), $"id".as("cluster_id")))
    val got = CorpusOps.leakageSafeSplit(labels, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // every member of a family carries its family's single split
    val byFam = got.groupBy(_._2).map { case (c, rows) => c -> rows.map(_._3).distinct }
    assert(byFam.values.forall(_.length == 1), s"straddling families: $byFam")
    // a family's split is the rep's hash decision: doc 25 follows cluster 20,
    // NOT its own doc-id hash — pin by comparing against the naive split of
    // the cluster ids themselves (same salt, same cell)
    val naive = CorpusOps.splitAssignments(
        labels.select($"cluster_id".as("doc_id")).distinct(), 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.forall { case (_, c, s) => naive(c) == s })
    // singleton clusters (cluster_id == doc_id) reproduce splitAssignments
    // bit-for-bit — the leakage guard only changes multi-doc families
    val single = got.filter { case (d, c, _) => d == c }.map(t => t._1 -> t._3).toMap
    val plain = CorpusOps.splitAssignments(
        labels.filter($"doc_id" === $"cluster_id").select($"doc_id"), 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(single == plain)
    // and the guard is not vacuous on this fixture: at least one family
    // member's naive doc-id split would have disagreed with its family split
    val naiveAll = CorpusOps.splitAssignments(labels.select($"doc_id"), 0.3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.exists { case (d, c, s) => d != c && naiveAll(d) != s })
  }

  test("mixCorpus: per-source keep rates follow the weight map; no shuffle") {
    val docs = spark.range(20000).select($"id".as("doc_id"),
      concat(lit("src"), ($"id" % 5).cast("string")).as("source"))
    val q = CorpusOps.mixCorpus(docs)
    val kept = q.groupBy($"source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val perSource = 4000.0
    // src0 weight 1.0: keeps everything, exactly
    assert(kept("src0") == 4000L)
    // src2 weight 0.1, src4 unlisted -> default 0.5 (tolerances ~4 sigma)
    assert(math.abs(kept("src2") / perSource - 0.1) < 0.03, s"src2=${kept("src2")}")
    assert(math.abs(kept.getOrElse("src4", 0L) / perSource - 0.5) < 0.04, s"src4=${kept.getOrElse("src4", 0L)}")
    // pure per-row predicate: the whole plan is scan+filter+project
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "mixCorpus must not shuffle")
  }

  test("quotaSample: exact top-N per source, ties by doc_id") {
    import graft.operators.TextAnalysis
    // quality varies with token count (id % 23 repeats force cross-source
    // quality ties, exercising the doc_id tie-break)
    val docs = spark.range(300).select(
      $"id".as("doc_id"),
      concat_ws(" ", array_repeat(lit("alpha"), ($"id" % 23).cast("int") + 1)).as("text"),
      concat(lit("src"), ($"id" % 4).cast("string")).as("source"))
    val quota = 5
    // reference: one global ranking per source over the SAME quality values
    val scored = TextAnalysis.withQuality(docs)
      .select($"doc_id", $"source", $"quality").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val expected = scored.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.toSeq.sortBy { case (id, _, qual) => (-qual, id) }.take(quota)
        .zipWithIndex.map { case ((id, src, qual), i) => (id, src, qual, i + 1L) }
    }.toSet
    val got = CorpusOps.quotaSample(docs, quota).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("decontaminate flags exactly the train docs sharing an eval 8-gram") {
    // pick a real eval id and a real train id under the default salt
    val ids = spark.range(0, 200).select($"id".as("doc_id"))
    val split = CorpusOps.splitAssignments(ids, 0.05).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val evalId = split.collectFirst { case (id, "eval") => id }.get
    val trainIds = split.collect { case (id, "train") => id }.toSeq.sorted
    val shared = "one two three four five six seven eight nine ten" // 10 tokens
    val docs = Seq(
      (evalId, shared),
      (trainIds(0), shared + " extra tail tokens here"),
      (trainIds(1), "completely different words with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val out = CorpusOps.decontaminate(docs, 8, 0.05)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 10 shared tokens -> 3 distinct shared 8-grams; the clean doc is absent
    assert(out == Map(trainIds(0) -> 3L), s"got $out")
  }

  test("decontaminate probes eval grams via broadcast (train text never shuffles)") {
    val docs = Tables.load(spark, sf, "documents")
    val q = CorpusOps.decontaminate(docs, 8, 0.05)
    q.collect()
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"), "eval-gram probe must broadcast")
    assert(!p.contains("SortMergeJoin"), "train side must not sort-merge its grams")
  }

  test("packShards matches a locally computed global prefix sum, any bucketing") {
    val docs = spark.range(0, 1000).select($"id".as("doc_id"),
      // deterministic variable-length texts: (id % 17) + 1 words
      array_join(transform(sequence(lit(0), $"id" % 17), i => concat(lit("w"), i)), " ").as("text"))
    val rows = docs.select($"doc_id", ($"doc_id" % 17 + 1).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var cum = 0L
    val expected = rows.map { case (id, n) =>
      val shard = math.floor(cum.toDouble / 50.0).toLong; cum += n; (id, n, shard)
    }.toSet
    for (parts <- Seq(1, 7, 32)) {
      val got = CorpusOps.packShards(docs, 50L, parts).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected, s"numParts=$parts")
    }
  }

  test("packShards: doc-level windows are partitioned; offsets join broadcasts") {
    val docs = Tables.load(spark, sf, "documents")
    val q = CorpusOps.packShards(docs, 1000L, 32)
    q.collect()
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the doc-level running sum must be a window PARTITIONED by the range
    // bucket (1/N of the corpus per reducer); the only unpartitioned
    // window in the plan runs over the N per-bucket totals, and those
    // offsets come back via broadcast, never a shuffled join
    val windowLines = p.linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.exists(_.contains(", [pid#")),
      s"expected a pid-partitioned window, got:\n${windowLines.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"), "offset join must broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("corpusStats: one exchange, per-source partials only") {
    val docs = Tables.load(spark, sf, "documents")
    val (n, stats) = PlanMetrics.measure(CorpusOps.corpusStats(docs))
    val sources = docs.select($"source").distinct().count()
    assert(n == sources)
    assert(stats.exchanges == 1, s"stats=$stats")
    // the exchange carries per-(partition, source) partials, not rows
    assert(stats.recordsWritten < docs.count(), s"stats=$stats")
    // counts are consistent: n_docs sums to the corpus, n_en <= n_docs
    val agg = CorpusOps.corpusStats(docs)
      .agg(sum($"n_docs"), max($"n_en" <= $"n_docs"))
      .as[(Long, Boolean)].head()
    assert(agg._1 == docs.count() && agg._2)
  }

  test("corpusStatsScalable: grid median within 1/grid of the exact median") {
    val docs = Tables.load(spark, sf, "documents")
    val exact = CorpusOps.corpusStats(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("p50_quality")).toMap
    val rows = CorpusOps.corpusStatsScalable(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val g = r.getAs[Double]("p50q_grid")
      // lower cell edge of the median bucket: within one lattice step
      // below the interpolated exact median
      assert(g <= exact(s) + 1e-9 && g >= exact(s) - 1.0 / 10000 - 1e-9,
        s"source=$s grid=$g exact=${exact(s)}")
    }
    // and the non-median columns agree with the exact datasheet
    val base = CorpusOps.corpusStats(docs)
      .select($"source", $"n_docs", $"total_tokens", $"n_en")
    val scal = CorpusOps.corpusStatsScalable(docs)
      .select($"source", $"n_docs", $"total_tokens", $"n_en")
    assert(base.exceptAll(scal).isEmpty && scal.exceptAll(base).isEmpty)
  }

  test("assemble composes curate, quota and split consistently") {
    val docs = Tables.load(spark, sf, "documents")
    val out = CorpusOps.assemble(docs).collect()
    assert(out.nonEmpty)
    // quota respected per source
    val bySource = out.groupBy(_.getAs[String]("source"))
    assert(bySource.values.forall(_.length <= 25))
    // members are exactly a subset of the standalone curation survivors
    val curated = operators.Curation.curate(docs)
      .select($"doc_id").as[Long].collect().toSet
    assert(out.map(_.getAs[Long]("doc_id")).forall(curated.contains))
    // the split label agrees with the standalone assignment operator
    val ids = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val standalone = CorpusOps.splitAssignments(docs, 0.05)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.forall { case (id, s) => standalone(id) == s })
  }

  test("assemble: two wide exchanges and a pushed-down group limit") {
    val df = CorpusOps.assemble(Tables.load(spark, sf, "documents"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 2, s"expected 2 exchanges (dedup + window), got $exchanges:\n$p")
    assert(p.contains("WindowGroupLimit"), s"rank-limit pushdown lost:\n$p")
    assert(!p.contains("Exchange SinglePartition"), "no single-reducer stage")
  }

  test("chunkMap: slices tile every chunk and reassemble every document") {
    val docs = Tables.load(spark, sf, "documents")
    val c = 512L
    val rows = CorpusOps.chunkMap(docs, c, 32).collect()
    // per chunk: offsets start at 0, slices are contiguous, and every
    // chunk except the last carries exactly `c` tokens
    val byChunk = rows.groupBy(_.getAs[Long]("chunk_id"))
    val lastChunk = byChunk.keys.max
    byChunk.foreach { case (cid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("off_in_chunk"))
      assert(sorted.head.getAs[Long]("off_in_chunk") == 0L, s"chunk $cid")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("off_in_chunk") + a.getAs[Long]("n_toks")
            == b.getAs[Long]("off_in_chunk"), s"gap in chunk $cid")
        case _ =>
      }
      val tot = rs.map(_.getAs[Long]("n_toks")).sum
      if (cid != lastChunk) assert(tot == c, s"chunk $cid carries $tot")
      else assert(tot <= c)
    }
    // per document: slices cover [0, n_tok) without overlap, in chunk order
    val nTok = docs.select($"doc_id",
        graft.functions.GraftFunctions.bpeishTokenCount($"text").as("n"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (did, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("tok_from"))
      assert(sorted.head.getAs[Long]("tok_from") == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("tok_from") + a.getAs[Long]("n_toks")
            == b.getAs[Long]("tok_from"), s"doc $did slices not contiguous")
        case _ =>
      }
      assert(sorted.map(_.getAs[Long]("n_toks")).sum == nTok(did))
    }
  }

  test("mixCorpusTemperature: smallest domain keeps all; rates follow √ mass") {
    val docs = Tables.load(spark, sf, "documents")
    val kept = CorpusOps.mixCorpusTemperature(docs).collect()
    val keptBySrc = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val tokBySrc = docs.groupBy($"source")
      .agg(sum(graft.functions.GraftFunctions.bpeishTokenCount($"text")).as("t"))
      .as[(String, Long)].collect().toMap
    val nBySrc = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    val minSrc = tokBySrc.minBy(_._2)._1
    // rate 1 for the lightest domain: every one of its documents survives
    assert(keptBySrc(minSrc) == nBySrc(minSrc))
    // everything kept is a real document and the result is deterministic
    assert(kept.length == CorpusOps.mixCorpusTemperature(docs).count())
    // the heaviest domain is actually thinned (rate < 1 and the md5 cells
    // at these counts cannot all fall under the threshold)
    val maxSrc = tokBySrc.maxBy(_._2)._1
    assert(keptBySrc.getOrElse(maxSrc, 0) < nBySrc(maxSrc),
      s"heaviest domain $maxSrc not thinned")
  }

  test("shuffleShards: a reproducible permutation with dense per-shard positions") {
    val docs = Tables.load(spark, sf, "documents")
    val out = CorpusOps.shuffleShards(docs, 8).collect()
    assert(out.length == docs.count())
    assert(out.map(_.getAs[Long]("doc_id")).toSet.size == out.length)
    out.groupBy(_.getAs[Long]("shard")).foreach { case (sh, rs) =>
      assert(sh >= 0 && sh < 8)
      // positions are dense 1..|shard|
      assert(rs.map(_.getAs[Long]("pos")).sorted.toSeq
        == (1L to rs.length.toLong).toSeq, s"shard $sh positions not dense")
    }
    // deterministic: a second run is the identical permutation; a new
    // salt is a different one
    val again = CorpusOps.shuffleShards(docs, 8).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      == again.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
    val epoch2 = CorpusOps.shuffleShards(docs, 8, "epoch2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(epoch2.toSeq != out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq)
  }

  test("epochSample: whole copies exact, fractional tail deterministic, epochs dense") {
    val docs = (0L until 40L).map(i => (i, s"src${i % 4}", s"text $i"))
      .toDF("doc_id", "source", "text").withColumn("lang", lit("en"))
    val factors = Seq("src0" -> 2.5, "src1" -> 2.0, "src2" -> 0.4)
    val out = CorpusOps.epochSample(docs, factors, 1.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    // src1 (f=2.0): exactly 2 copies per doc, no fractional arm
    assert(bySrc("src1") == 20)
    // src3 (default 1.0): exactly 1 copy per doc
    assert(bySrc("src3") == 10)
    // src0 (f=2.5): between 2 and 3 copies per doc; src2 (0.4): 0 or 1
    val perDoc = out.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).sorted.toSeq)
    perDoc.foreach { case ((_, src), epochs) =>
      assert(epochs == (0L until epochs.length.toLong), s"epochs not dense: $epochs")
      src match {
        case "src0" => assert(epochs.length == 2 || epochs.length == 3)
        case "src1" => assert(epochs.length == 2)
        case "src2" => assert(epochs.length == 1) // 0-copy docs never appear
        case _      => assert(epochs.length == 1)
      }
    }
    assert(bySrc.getOrElse("src2", 0) < 10) // 0.4 downsample drops some docs
    // determinism: a second run is row-identical
    val again = CorpusOps.epochSample(docs, factors, 1.0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sorted.sameElements(again.sorted))
  }

  test("contaminationReport: distinct leak counting and worst-offender ranking") {
    // find deterministic eval/train ids under the same md5 cell the
    // operator uses (salt "split", rate 0.5)
    def cell(id: Long): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s"split:$id".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 8)
    val thr = CorpusOps.hexThreshold(0.5)
    val ids = (0L until 40L)
    val evalId = ids.find(cell(_) < thr).get
    val trainIds = ids.filter(cell(_) >= thr).take(3)
    val (t1, t2, t3) = (trainIds(0), trainIds(1), trainIds(2))
    // eval doc: 6 tokens -> 3 distinct 4-grams; t1 copies the whole text
    // (3 shared grams), t2 shares only the first 4-gram window, t3 clean
    val evalText = "aaa bbb ccc ddd eee fff"
    val docs = Seq(
      (evalId, evalText),
      (t1, evalText),
      (t2, "aaa bbb ccc ddd zzz yyy"),
      (t3, "one two three four five six")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val got = CorpusOps.contaminationReport(docs, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 1, s"only the eval doc reports: ${got.toSeq}")
    val (d, nShared, topDoc, topShared) = got(0)
    assert(d == evalId)
    assert(nShared == 3, s"3 distinct grams leak (t1's 3 ∪ t2's 1): $nShared")
    assert(topDoc == t1 && topShared == 3, s"worst offender: $topDoc/$topShared")
  }

  test("sourceDrift: corpus-like source scores near zero, shifted source higher") {
    // s_bulk dominates the corpus, so its distribution ≈ the corpus
    // distribution (KL near 0); s_shift uses disjoint vocabulary — its
    // bigram buckets barely overlap the corpus mass, so KL must be
    // clearly larger. Smoothed KL over a shared support is ≥ 0 up to
    // micro-nat quantization.
    val bulk = (0L until 30L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again", "s_bulk"))
    val shift = (100L until 105L).map(i =>
      (i, "zeta omega phi chi psi rho sigma tau upsilon nu", "s_shift"))
    val docs = (bulk ++ shift).toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
    val got = CorpusOps.sourceDrift(docs, 1024)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set("s_bulk", "s_shift"))
    got.values.foreach { case (_, _, kl) => assert(kl >= -0.001, s"negative KL: $got") }
    assert(got("s_shift")._3 > got("s_bulk")._3 + 0.1,
      s"shifted source must show drift: $got")
    // n_feats = bigram occurrences = (tokens - 1) per doc
    assert(got("s_bulk")._1 == 30L * 9 && got("s_shift")._1 == 5L * 9)
  }

  test("dsirWeights: target-like docs outrank off-target, exact feature counts") {
    // target slice (en) is dominated by the "neural network" bigram; doc 3
    // (de) shares it, doc 4 (de) shares nothing with the target slice, so
    // the importance ranking must put 3 above 4. Single-token doc 5 has no
    // bigram features and drops out, like the oracle's empty unnest.
    val docs = Seq(
      (1L, "neural network training data", "en"),
      (2L, "neural network scaling laws", "en"),
      (3L, "neural network auf deutsch", "de"),
      (4L, "ganz anderes thema hier", "de"),
      (5L, "solo", "de")
    ).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
    val got = CorpusOps.dsirWeights(docs, "en", 1024)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // n_feats = token count - 1 (bigram occurrences)
    assert(got.view.mapValues(_._1).toMap ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(!got.contains(5L))
    assert(got(3L)._3 > got(4L)._3,
      s"target-overlapping doc must outrank: ${got(3L)} vs ${got(4L)}")
    // log-weight column is the micro total, rounded once
    got.values.foreach { case (_, micro, lw) =>
      assert(math.abs(micro / 1e6 - lw) <= 5e-5) }
  }

  test("snapshotDiff: added/removed/changed/unchanged classified exactly") {
    val v1 = Seq((1L, "alpha"), (2L, "bravo"), (3L, "charlie"))
      .toDF("doc_id", "text")
    val v2 = Seq((2L, "bravo"), (3L, "charlie EDITED"), (4L, "delta"))
      .toDF("doc_id", "text")
    val got = CorpusOps.snapshotDiff(v1, v2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      "removed" -> ((1L, 1L, 1L)),
      "unchanged" -> ((1L, 2L, 2L)),
      "changed" -> ((1L, 3L, 3L)),
      "added" -> ((1L, 4L, 4L))))
  }

  test("snapshotDiff fixture: statuses partition the id space; text never shuffles") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = CorpusOps.snapshotDiffFixture(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(got.keySet == Set("added", "removed", "changed", "unchanged"))
    // every doc in v1 ∪ v2 is classified exactly once: v1 ∪ v2 = docs
    // minus ids dropped from BOTH versions (% 11 == 3 AND % 13 == 5)
    val droppedBoth = docs.filter($"doc_id" % 11 === 3 && $"doc_id" % 13 === 5).count()
    assert(got.values.sum == n - droppedBoth)
    // only 16-byte fingerprints cross the wire: the md5 is computed in a
    // scan-fused projection BELOW the join exchange (Project [doc_id,
    // md5(...)]), and the join shuffles on doc_id
    val q = CorpusOps.snapshotDiffFixture(docs)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("Exchange hashpartitioning(doc_id"), p.take(2000))
    assert("""Project \[doc_id#\d+L, md5""".r.findFirstIn(p).isDefined,
      "fingerprint not scan-fused below the exchange")
  }

  test("filterFunnel: each rule charges the FIRST failure; fractions sum to 1") {
    val docs = Seq(
      (1L, "one two three"),                        // 3 tokens -> too_short
      (2L, ("tok " * 100).trim),                    // 100 tokens, but dup -> short? no: 100 tokens -> too_long fires before repetitive
      (3L, Seq.tabulate(30)(i => "superlonginternaltoken" + i).mkString(" ")), // mean len > 5
      (4L, Seq.tabulate(30)(i => "w" + i).mkString(" !!!! ???? ;;;; ")),       // low alpha
      // 30 tokens, 5 distinct; 5-char words keep mean word len at the
      // rule-3 boundary (not over) and alpha density over 4/5 -> repetitive
      (5L, (Seq.tabulate(5)(i => "dupe" + i) ++
        Seq.fill(25)("dupe0")).mkString(" ")),
      (6L, Seq.tabulate(30)(i => "tok" + i).mkString(" "))  // pass
    ).toDF("doc_id", "text")
    val got = CorpusOps.filterFunnel(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList.sortBy(_._1)
    val stages = got.map(s => s._1 -> s._2).toMap
    assert(stages("1_too_short") == 1L)
    assert(stages("2_too_long") == 1L)
    assert(stages("3_mean_word_len") == 1L)
    assert(stages.getOrElse("4_low_alpha", 0L) == 1L,
      s"low_alpha missing: $got")
    assert(stages("5_repetitive") == 1L)
    assert(stages("6_pass") == 1L)
    // fractions are rounded to 4 decimals per stage: sum within 6 ulps
    assert(math.abs(got.map(_._3).sum - 1.0) < 6 * 5e-5)
  }

  test("filterFunnel: one scan, no wide exchange before the stage aggregate") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = CorpusOps.filterFunnel(docs).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // stage agg (≤6 groups) + the 1-row total: every exchange moves
    // aggregated rows, never documents
    assert(exchanges.forall(_.child.output.map(_.name).forall(n =>
      !Set("text", "tk").contains(n))), plan.toString)
  }

  test("incrementalCuration: diff -> funnel -> v1-dedup, each gate observable") {
    // 5-char words: mean word len exactly 5 (rule-3 boundary) and alpha
    // density 150/179 > 4/5 — the same calibration as the funnel fixture
    def passing(seed: Int) =
      Seq.tabulate(30)(i => s"w$seed${100 + i}").mkString(" ")
    // ids chosen against the fixture residues: 3 (%11==3) is v1-absent ->
    // `added`; 2 (%17==2) gets the rev2 rewrite -> `changed`; 5 (%13==5)
    // is v2-absent; 14 is v1-absent but its text byte-equals doc 1's v1
    // text -> killed by the v1-fingerprint dedup; 25 is v1-absent but too
    // short -> killed by the funnel; 1 is unchanged -> not a candidate
    val docs = Seq(
      (1L, passing(1)), (2L, passing(2)), (3L, passing(3)),
      (5L, passing(5)), (14L, passing(1)), (25L, "too short text")
    ).toDF("doc_id", "text")
    val got = CorpusOps.incrementalCuration(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> "added", 2L -> "changed"), s"got $got")
  }

  test("weightedSample: deterministic, k rows, weight-proportional membership") {
    // 50 heavy docs (w=5000) among 950 light (w=50): E-S with these odds
    // puts heavy docs in the vast majority of top-100 slots
    val docs = spark.range(1000).select($"id".as("doc_id"),
      lit("s").as("source"),
      when($"id" < 50, 5000L).otherwise(50L).as("n_chars"))
    val a = CorpusOps.weightedSample(docs, 100).collect()
    val b = CorpusOps.weightedSample(docs, 100).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 100)
    val heavy = a.count(_.getLong(0) < 50)
    assert(heavy >= 40, s"heavy docs in sample: $heavy")
    // es_key is nonnegative and ascending with doc_id tie-break
    val keys = a.map(r => (r.getLong(3), r.getLong(0)))
    assert(keys.forall(_._1 >= 0L))
    assert(keys.sameElements(keys.sorted))
  }

  test("weightedSample: top-k plans as TakeOrderedAndProject (no global sort)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = CorpusOps.weightedSample(docs, 100).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
