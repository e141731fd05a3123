package graft

import org.apache.spark.sql.functions._

/** PINS the incremental ops' ∝-batch DENOMINATORS
  * ([[ScaleBench100.BatchCount]]) against the slices the ops actually
  * process. Three of them restate the op's own filter verbatim
  * (doc/embedding/order slices); the curation one is a DERIVED
  * closed-form — the changeset predicate
  * `% 13 ≠ 5 ∧ (% 11 = 3 ∨ % 17 = 2)` standing in for "v2 docs added
  * or fingerprint-changed", which is only correct while
  * [[graft.operators.CorpusOps.incrementalCuration]]'s snapshot fixture
  * keeps its exact v1/v2 derivation. If the fixture drifts, the
  * flatness gate's denominator silently measures the wrong batch —
  * this spec fails instead.
  */
class BatchDenominatorSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("the curation denominator equals the op's actual fp-diff changeset") {
    val docs = Tables.load(spark, sf, "documents")
    // the op's OWN derivation (CorpusOps.incrementalCuration): v1 drops
    // % 11 = 3, v2 drops % 13 = 5 and revs % 17 = 2; fresh = in v2 with
    // no v1 row or a different fingerprint
    val v1 = docs.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"), md5(col("text")).as("fp1"))
    val v2 = docs.filter(col("doc_id") % 13 =!= 5)
      .withColumn("text",
        when(col("doc_id") % 17 === 2, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .select(col("doc_id"), md5(col("text")).as("fp"))
    val fresh = v2.join(v1, Seq("doc_id"), "left")
      .filter(col("fp1").isNull || col("fp1") =!= col("fp"))
      .count()
    val denominator =
      ScaleBench100.BatchCount("corpus_incremental_curation")(spark, sf)
    assert(fresh > 0, "fixture lost its changeset")
    assert(denominator == fresh,
      s"BatchCount's closed-form changeset ($denominator) diverged from " +
        s"the op's fp-diff ($fresh) — incrementalCuration's fixture changed " +
        "without updating the flatness denominator")
  }

  test("the slice denominators count non-empty batches on every table they gate") {
    // the other denominators restate op filters verbatim; pin that each
    // measures a non-empty, proper slice at oracle scale (an empty or
    // full-table count would make per-item flatness meaningless)
    val docs = Tables.load(spark, sf, "documents").count()
    val emb = Tables.load(spark, sf, "embeddings").count()
    val docBatch = ScaleBench100.BatchCount("dedup_incremental")(spark, sf)
    val vecBatch = ScaleBench100.BatchCount("sim_ivf_incremental")(spark, sf)
    val liBatch = ScaleBench100.BatchCount("agg_incremental_revenue")(spark, sf)
    assert(docBatch > 0 && docBatch < docs, s"doc batch $docBatch of $docs")
    assert(vecBatch > 0 && vecBatch < emb, s"vec batch $vecBatch of $emb")
    assert(liBatch > 0 &&
      liBatch < Tables.load(spark, sf, "lineitem").count(),
      s"lineitem batch $liBatch")
    // the three dedup ops share ONE denominator function by contract
    assert(ScaleBench100.BatchCount("dedup_clusters_incremental")(spark, sf)
      == docBatch)
    assert(ScaleBench100.BatchCount("dedup_containment_incremental")(spark, sf)
      == docBatch)
  }
}
