package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking with overlap — the retrieval-side
  * sibling of Packing's context-window chunking (31f packs the global
  * token stream for TRAINING; a RAG/embedding index wants PER-DOCUMENT
  * windows with overlap so no answer span is cut at a boundary).
  *
  * Chunk k of a doc with n whitespace tokens covers tokens
  * [k*stride, k*stride + width); chunks are emitted while they add new
  * tokens: 1 + max(0, ceil((n - width) / stride)) chunks, so a doc at
  * most `width` tokens long is exactly one chunk and the last chunk
  * always reaches the end of the doc. Map-only: tokens split once per
  * row, windows come from an in-row sequence + explode — no shuffle,
  * no window function, nothing driver-side; at 100 TB this is a pure
  * scan whose output is bounded by (input tokens) / stride * width.
  */
object Chunker {
  def chunks(df: DataFrame, id: Column, text: Column,
             width: Int = 64, stride: Int = 32): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width,
      "need 1 <= stride <= width (stride > width would drop tokens)")
    val tk = split(text, "\\s+")
    df.select(id.as("doc_id"), tk.as("_tk"), size(tk).as("_n"))
      .select(col("doc_id"), col("_tk"), col("_n"),
        explode(sequence(lit(0), greatest(lit(0),
          ceil((col("_n") - lit(width)).cast("double") / stride)
            .cast("int")))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        least(lit(width), col("_n") - col("chunk_idx") * stride).as("n_tok"),
        concat_ws(" ", slice(col("_tk"), col("chunk_idx") * stride + 1,
          least(lit(width), col("_n") - col("chunk_idx") * stride)))
          .as("chunk_text"))
  }
}
