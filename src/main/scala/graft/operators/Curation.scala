package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus curation — the canonical training-data chain composed from the
  * engine's own operators: language filter → quality filter → exact dedup
  * keep-one. One registered query exercises the composition end to end
  * (each stage is oracle-checked on its own elsewhere; this checks the
  * CHAIN, where column handoffs and filter interactions can break even
  * when every stage is individually right).
  *
  * Scale shape: the language/quality stage is a JOIN-FREE projection
  * ([[TextAnalysis.withPredLangAndQuality]]) whose filter fuses into the
  * document scan, so the only wide exchange is the final
  * 32-byte-fingerprint groupBy over the SURVIVORS — filters run before
  * dedup on purpose: at 100 TB, language+quality typically drop most of
  * the corpus before anything shuffles.
  */
object Curation {

  /** Documents surviving (pred_lang = lang, quality >= minQuality),
    * deduped to the min doc_id per normalized-text fingerprint. Returns
    * (doc_id, lang, source) like [[Dedup.exactDedup]].
    */
  def curate(docs: DataFrame, lang: String = "en",
             minQuality: Double = 0.7): DataFrame =
    Dedup.exactDedup(
      TextAnalysis.withPredLangAndQuality(docs)
        .filter(col("pred_lang") === lang && col("quality") >= minQuality))
}
