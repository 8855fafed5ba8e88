package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming exact dedup for the ingest path: drop records whose
 * content hash was already seen, with the state bounded by a
 * watermark — the streaming form of Dedup.exactDedup for pipelines
 * that must not land the same document twice. State per key is one
 * hash + timestamp; the watermark bounds total state to the dedup
 * horizon instead of growing forever.
 */
object StreamDedup {

  /** @param docs streaming df with (ts:timestamp, textCol)
    * @param horizon how long a content hash stays "seen" */
  def dedupStream(docs: DataFrame, textCol: String = "text",
      horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("__content_hash", md5(col(textCol)))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
}
