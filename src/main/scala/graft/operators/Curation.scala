package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.fingerprint

/** Corpus curation — the canonical training-data chain composed from the
  * engine's own operators: language filter → quality filter → exact dedup
  * keep-one. One registered query exercises the composition end to end
  * (each stage is oracle-checked on its own elsewhere; this checks the
  * CHAIN, where column handoffs and filter interactions can break even
  * when every stage is individually right).
  *
  * Scale shape: the language/quality stage is a JOIN-FREE projection
  * ([[TextAnalysis.withPredLangAndQuality]]) fused into the document
  * scan, so the only wide exchange is the fingerprint groupBy over the
  * SURVIVORS — filters run before dedup on purpose: at 100 TB,
  * language+quality typically drop most of the corpus before anything
  * shuffles.
  */
object Curation {

  /** Documents surviving (pred_lang = lang, quality >= minQuality),
    * deduped to the min doc_id per normalized-text fingerprint. Returns
    * (doc_id, lang, source) like [[Dedup.exactDedup]].
    *
    * The survivor guard lives INSIDE a generator expression
    * (`explode_outer(when(keep, array(fp)))` — dropped docs get a NULL
    * fingerprint, excluded after the aggregation), NOT as a `.filter` on
    * the derived pred_lang/quality columns: predicate pushdown
    * substitutes a Filter's references through every projection
    * unconditionally, re-running the whole scoring pipeline a second
    * time per row inside the filter (measured 10× on this query — the
    * same Catalyst trap charLshPairs documents). The post-agg
    * `fp IS NOT NULL` filter is on a generator-output/grouping attribute,
    * which substitution cannot reach through.
    */
  def curate(docs: DataFrame, lang: String = "en",
             minQuality: Double = 0.7): DataFrame = {
    val keep = col("pred_lang") === lang && col("quality") >= minQuality
    TextAnalysis.withPredLangAndQuality(docs)
      .select(
        explode_outer(when(keep, array(fingerprint(col("text"))))).as("fp"),
        struct(col("doc_id"), col("lang"), col("source")).as("r"))
      .groupBy(col("fp"))
      .agg(min_by(col("r"), col("r.doc_id")).as("r"))
      .filter(col("fp").isNotNull)
      .select(col("r.doc_id"), col("r.lang"), col("r.source"))
  }
}
