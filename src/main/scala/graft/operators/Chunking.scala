package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking: split each document into fixed-token windows with
  * overlap — the context-window segmentation step between cleaning and
  * packing in an LLM training-data pipeline (long documents must become
  * model-sized sequences; the overlap preserves cross-boundary
  * context).
  *
  * Chunk i covers tokens [i·stride, i·stride + chunkTokens) where
  * stride = chunkTokens − overlap; the last chunk may be short. Purely
  * row-local (tokenize → explode the start offsets → slice), no
  * shuffle, stays in codegen — a 100 TB corpus chunks at scan speed.
  */
object Chunking {

  /** @return one row per (document, chunk): all input columns plus
    *         `chunk_id` (0-based), `chunk_text`, `chunk_tokens` */
  def chunk(df: DataFrame, textCol: String, chunkTokens: Int = 256,
      overlap: Int = 32): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      // starts 0, stride, 2·stride, … < token count (tokens() of any
      // string is non-empty, so the sequence bounds are always valid)
      .withColumn("__start", explode(
        sequence(lit(0), greatest(size(col("__toks")) - 1, lit(0)), lit(stride))))
      .withColumn("chunk_id", (col("__start") / lit(stride)).cast("long"))
      .withColumn("chunk_text",
        array_join(slice(col("__toks"), col("__start") + 1, lit(chunkTokens)), " "))
      .withColumn("chunk_tokens",
        least(lit(chunkTokens), size(col("__toks")) - col("__start")).cast("long"))
      .drop("__toks", "__start")
  }
}
