package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.{GraftFunctions => F}
import graft.operators.ReferenceQueries

/** Property-based invariants from SURVEY.md §5.2. ScalaCheck generators
  * drive small driver-side samples through real Spark plans; fixed seeds
  * keep runs deterministic (no scalatestplus bridge in the offline cache,
  * so sampling is explicit).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], trials: Int = 8)(body: A => Unit): Unit =
    (1 to trials).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => body(t._1, t._2))

  private val dayGen = Gen.choose(-20000, 40000) // ±epoch, covers 1915..2079

  test("formatted-string date filter ≡ native date comparison") {
    forAll2(Gen.listOfN(30, dayGen), dayGen) { (days, threshDay) =>
      val df = days.toDF("d").select(F.epochDaysToDate(col("d")).as("dt"))
      val threshold = java.time.LocalDate.ofEpochDay(threshDay).toString
      val viaString = df.filter(
        F.dateToString(col("dt"), "yyyy-MM-dd") >= lit(threshold)).count()
      val viaDate = df.filter(col("dt") >= to_date(lit(threshold))).count()
      assert(viaString == viaDate)
    }
  }

  test("CASE classification partitions the input (JOVEM ∪ ADULTO, disjoint)") {
    forAll(Gen.listOfN(25, dayGen)) { days =>
      val cust = days.zipWithIndex.map { case (d, i) =>
        (s"n$i", s"t$i", s"e$i", Date.valueOf(java.time.LocalDate.ofEpochDay(d)),
          new Timestamp(i * 1000L))
      }.toDF("nome", "telefone", "email", "nascimento", "dt_update")
      val classed = ReferenceQueries.idadeclass(cust)
      val cats = classed.groupBy("idadecat").count()
        .as[(String, Long)].collect().toMap
      assert(cats.keySet.subsetOf(Set("JOVEM", "ADULTO")))
      assert(cats.values.sum == days.size)
    }
  }

  test("windowed counts sum to total row count for any timestamps") {
    forAll(Gen.listOfN(30, Gen.choose(0L, 600_000L))) { millis =>
      val cust = millis.zipWithIndex.map { case (ms, i) =>
        (s"n$i", s"e$i", if (i % 2 == 0) "JOVEM" else "ADULTO", new Timestamp(ms))
      }.toDF("nome", "email", "idadecat", "dt_update")
      val total = ReferenceQueries.idadecont(cust)
        .agg(sum("contagem")).as[Long].collect()(0)
      assert(total == millis.size)
    }
  }

  test("prefix-filtered jaccard at threshold ~0 equals the naive shared-shingle pairs") {
    val wordGen = Gen.listOfN(8, Gen.oneOf("aa", "bb", "cc", "dd"))
    forAll(Gen.listOfN(6, wordGen), trials = 4) { texts =>
      val docs = texts.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" "), "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
      // tiny positive threshold ⇒ keep every pair sharing >= 1 shingle
      val pairs = graft.operators.Dedup.jaccardPairs(docs, 2, 1e-9)
        .select("a", "b").as[(Long, Long)].collect().toSet
      // naive reference: pairs with non-empty shingle intersection
      val sh = texts.map(ws =>
        ws.sliding(2).map(_.mkString(" ")).toSet)
      val expected = (for {
        i <- sh.indices; j <- sh.indices if i < j
        if (sh(i) & sh(j)).nonEmpty
      } yield (i.toLong, j.toLong)).toSet
      assert(pairs == expected)
    }
  }

  test("jaccard symmetric and bounded in [0,1]") {
    val tokGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e"))
    forAll2(tokGen, tokGen) { (xs, ys) =>
      val df = Seq((xs, ys), (ys, xs)).toDF("x", "y")
      val got = df.select(F.jaccard(col("x"), col("y"))).as[Double].collect()
      assert(got(0) == got(1))
      assert(got(0) >= 0.0 && got(0) <= 1.0)
    }
  }

  test("KMV sketch equals the k smallest distinct hashes for any multiset") {
    import graft.functions.{DetHash, KmvSketch}
    forAll(Gen.listOfN(400, Gen.choose(0L, 200L)), trials = 6) { vals =>
      val df = vals.toDF("v")
        .select(DetHash.base60(col("v").cast("string")).as("h"))
      val sketch = df.repartition(5)
        .agg(KmvSketch.column(col("h"), 32)).as[Seq[Long]].head()
      val expect = vals.map(v => DetHash.base60(v.toString))
        .distinct.sorted.take(32)
      assert(sketch == expect)
    }
  }

  test("bloom probe admits every inserted key (no false negatives, any key set)") {
    import graft.operators.Relational
    forAll(Gen.listOfN(60, Gen.choose(Long.MinValue, Long.MaxValue)), trials = 6) { keys =>
      val kdf = keys.toDF("k")
      val bloom = Relational.bloomBuild(kdf, col("k"), words = 64)
      val pass = kdf.crossJoin(broadcast(bloom))
        .filter(Relational.bloomMightContain(col("k"), col("bloom"), words = 64))
        .count()
      assert(pass == keys.length.toLong)
    }
  }

  test("z-order key deinterleaves back to its inputs (any 16-bit pair)") {
    import graft.operators.ZOrder
    def unspread(z: Long): Long = {
      // inverse mask ladder: gather the even bits back into 16
      var v = z & 0x55555555L
      v = (v | (v >> 1)) & 0x33333333L
      v = (v | (v >> 2)) & 0x0F0F0F0FL
      v = (v | (v >> 4)) & 0x00FF00FFL
      (v | (v >> 8)) & 0x0000FFFFL
    }
    forAll2(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)) { (x, y) =>
      val z = ZOrder.zkeyJvm(x, y)
      assert(unspread(z) == x)
      assert(unspread(z >> 1) == y)
    }
  }

  test("CMS estimate dominates the exact count for any key distribution") {
    import graft.operators.Relational
    forAll(Gen.listOfN(300, Gen.choose(0L, 40L)), trials = 4) { vals =>
      val got = Relational.cmsHeavyHitters(vals.toDF("k"), "k", 4, 32, 50)
        .select(col("exact_cnt"), col("est_cnt")).as[(Long, Long)].collect()
      assert(got.nonEmpty)
      assert(got.forall { case (exact, est) => est >= exact })
    }
  }

  test("simhash pigeonhole pairs == brute-force hamming pairs on any corpus") {
    // small shared-word pool makes collisions (and near-collisions) likely
    val textGen = Gen.listOfN(6, Gen.oneOf("alpha", "beta", "gamma", "delta"))
      .map(_.mkString(" "))
    forAll(Gen.listOfN(7, textGen), trials = 4) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, "en", "s") }
        .toDF("doc_id", "text", "lang", "source")
      val got = graft.operators.Dedup.simhashPairs(docs, 3)
        .as[(Long, Long, Long)].collect().toSet
      val sigs = graft.operators.Dedup.simhashSignatures(docs)
        .as[(Long, Long)].collect().toMap
      val brute = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
      } yield (a, b, h.toLong)).toSet
      assert(got == brute, s"pigeonhole=$got brute=$brute")
    }
  }

  test("epoch replication: per-doc copies in {floor(f), ceil(f)}, fraction-bounded") {
    val factorGen = Gen.oneOf(0.0, 0.3, 1.0, 1.5, 2.0, 2.7)
    forAll2(factorGen, Gen.choose(10, 40)) { (f, n) =>
      val docs = (0 until n).map(i => (i.toLong, "s0", s"text $i"))
        .toDF("doc_id", "source", "text").withColumn("lang", lit("en"))
      val counts = graft.operators.CorpusOps
        .epochSample(docs, Seq("s0" -> f), 1.0)
        .groupBy(col("doc_id")).count().as[(Long, Long)].collect().toMap
      val (lo, hi) = (math.floor(f).toLong, math.ceil(f).toLong)
      // docs with zero copies are absent; present ones hold the bound
      counts.values.foreach(c => assert(c == lo || c == hi, s"f=$f got $c"))
      // total replication stays within the deterministic-sampling envelope
      val total = counts.values.sum
      assert(total >= lo * n && total <= hi * n, s"f=$f total=$total n=$n")
    }
  }

  test("ceilRational ≡ exact BigInt ceil(num·sz/den) — boundary products included") {
    // the round-10 advisory fix, property-pinned: a float ceil(0.9·10)
    // rounds 9.000000000000002 up to 10, shrinking the AllPairs prefix /
    // containment pigeonhole below their guarantees. The reduced-multiple
    // division must match BigInt arithmetic exactly — especially at
    // exact-integer products (sz a multiple of den/gcd), so the
    // generator mixes random sizes with constructed boundary cases.
    val den = 1000000L
    val tGen = Gen.oneOf(0.5, 0.8, 0.9, 0.95, 0.99)
    val szGen = Gen.oneOf(Gen.choose(0L, 5000L),
      Gen.choose(1L, 500L).map(_ * 10L), // 0.9·(k·10) lands exactly on ints
      Gen.const(1000000000L)) // the 1e9-gram extreme the claim covers
    forAll2(tGen, Gen.listOfN(40, szGen)) { (t, szs) =>
      val num = math.round(t * den)
      val got = szs.toDF("sz")
        .select(graft.operators.Dedup.ceilRational(num, col("sz"), den).as("c"))
        .as[Long].collect().toSeq
      val want = szs.map(sz =>
        ((BigInt(num) * sz + den - 1) / den).toLong)
      assert(got == want, s"t=$t diverged: ${got.zip(want).filter(p => p._1 != p._2).take(3)}")
    }
  }
}
