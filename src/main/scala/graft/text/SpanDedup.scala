package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ExactSubstr-style span-level dedup (Lee et al. 2021,
  * "Deduplicating Training Data Makes Language Models Better"): every
  * token span of >= n tokens that occurs verbatim more than once in
  * the corpus is removed from every occurrence EXCEPT the first (by
  * (doc_id, position)), and the document text is rebuilt from the
  * surviving tokens. Document-grain dedup ([[graft.dedup]]) misses a
  * boilerplate paragraph pasted into otherwise-distinct pages;
  * line-grain ([[LineDedup]]) misses spans that cross line layout —
  * this is the span-grain member of the dedup menu, at token (not
  * suffix-array) alignment: a shared span shorter than n tokens is
  * below the gate by declaration, and any shared span of m >= n
  * tokens is found exactly (all m−n+1 of its n-grams collide).
  *
  * Distributed shape: n-grams materialize MAP-SIDE from each doc's
  * token array (one struct per token, constant fanout — the same
  * grain as TF-IDF's explode), so the only corpus-wide exchange is
  * the single groupBy(gram) that elects each gram's canonical first
  * occurrence as min of a PACKED (doc_id << 21 | pos) long — a plain
  * `min` that hash-aggregates (no struct argmin, no SortAggregate).
  * Duplicated non-canonical occurrences join back against the
  * persisted gram set (the persist-shared-subtrees rule: the gram
  * pass feeds both the election and the join), collapse to per-doc
  * sorted start arrays (output-sized: only removed material travels),
  * and span union / island counting / text rebuild are higher-order
  * array functions on the doc row — no token-grain second shuffle.
  * Pack bounds (documented, not latent): pos < 2^21 tokens per doc,
  * doc_id < 2^42.
  */
object SpanDedup {

  private val Pack = 1L << 21

  /** (doc_id, n_tokens, n_removed, n_spans, text_clean) for every
    * document; n_spans counts maximal contiguous runs of removed
    * token positions (overlapping/adjacent duplicate n-grams merge). */
  def dedupSpans(df: DataFrame, id: Column, text: Column, n: Int = 8): DataFrame = {
    require(n >= 2, s"span gate must be >= 2 tokens, got $n")
    val toks = graft.sources.Ingest.parallelismFloor(df)
      .select(id.as("doc_id"), split(text, "\\s+").as("_tk"))
    val grams = toks
      .filter(size(col("_tk")) >= n)
      .select(col("doc_id"), explode(transform(
        sequence(lit(0), size(col("_tk")) - n),
        i => struct(i.as("pos"),
          array_join(slice(col("_tk"), i + 1, lit(n)), " ").as("gram")))).as("_e"))
      .select(col("doc_id"), col("_e.pos").as("pos"), col("_e.gram").as("gram"),
        (col("doc_id") * Pack + col("_e.pos")).as("_pk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val winners = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("_c"), min(col("_pk")).as("_first"))
      .filter(col("_c") > 1)
    // winners + starts both read grams inside the returned plan:
    // release after the caller's action (best-effort cleanup)
    graft.functions.CacheRelease.afterNextExecution(grams)
    // removal starts: non-canonical occurrences of duplicated grams,
    // collapsed to one sorted array per affected doc (output-sized)
    val starts = grams.join(winners, "gram")
      .filter(col("_pk") =!= col("_first"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("_ss"))
    val ss = coalesce(col("_ss"), array().cast("array<int>"))
    val idx = sequence(lit(0), size(col("_tk")) - 1)
    val covered = (i: Column) =>
      exists(ss, s => s <= i && i < s + n)
    val kept = filter(idx, i => !covered(i))
    // island fold over sorted starts: new span when a start opens past
    // the current covered end + 1 (adjacent coverage merges)
    val spans = aggregate(ss,
      struct(lit(0).as("k"), lit(-2).as("e")),
      (acc, s) => struct(
        when(s > acc("e") + 1, acc("k") + 1).otherwise(acc("k")).as("k"),
        greatest(acc("e"), s + n - 1).as("e")),
      acc => acc("k"))
    toks.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("_tk")).cast("long").as("n_tokens"),
        (size(idx) - size(kept)).cast("long").as("n_removed"),
        spans.cast("long").as("n_spans"),
        array_join(transform(kept, i => element_at(col("_tk"), i + 1)), " ")
          .as("text_clean"))
  }
}
