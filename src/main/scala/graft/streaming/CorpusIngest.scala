package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingestion: the batch training-data gate
  * ([[graft.analytics.TextAnalysis.corpusFilter]] — dedup + quality +
  * language, plus q60's decontamination) applied to continuously-arriving
  * documents. The flag expressions are the SAME code as batch
  * (`TextAnalysis.corpusFlags`), so the two paths cannot drift; the spec
  * differentially tests the streamed verdicts against the batch operator
  * on identical input.
  *
  * Scale shape: flags are map-side; exact dedup is
  * `dropDuplicatesWithinWatermark` on the 32-char fingerprint (state
  * bounded by the watermark — the streaming stand-in for the batch
  * min-id-per-fingerprint window, with first-ARRIVAL rather than min-id
  * as the keep rule, the honest streaming semantics); decontamination is
  * a stream-static left-anti join against the benchmark-sized eval
  * fingerprint set, broadcast per micro-batch exactly like q60's batch
  * form.
  */
object CorpusIngest {

  /** Gate a document stream: emit only docs that are first-of-fingerprint
    * within the watermark, pass the quality bar, match `keepLang`, and do
    * not collide with the static eval set. `evalFps` must carry an `fp`
    * column of md5(text) fingerprints (dimension/benchmark-sized). */
  def ingestGate(docs: DataFrame, idCol: String, textCol: String,
                 tsCol: String, evalFps: DataFrame,
                 watermark: String = "1 hour",
                 keepLang: String = "en"): DataFrame = {
    val flagged = graft.analytics.TextAnalysis.corpusFlags(docs, textCol)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
    flagged
      .filter(col("q_ok") && col("lang_guess") === keepLang)
      .join(broadcast(evalFps.select(col("fp"))), Seq("fp"), "left_anti")
      .select(col(idCol), col(tsCol), col(textCol), col("lang_guess"))
  }
}
