package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-wide duplicate-line removal — the C4 §2.2 / RefinedWeb
  * boilerplate filter: a line occurring in more than `maxDocs`
  * DISTINCT documents (navigation bars, cookie banners, license
  * headers) is removed from EVERY document, and each document's text
  * is reconstructed from its surviving lines in order. This is
  * corpus-global state per line — a per-document operator
  * (TextFeatures.lineRepetition measures WITHIN-doc repetition)
  * cannot express it.
  *
  * Scale shape: the two line-grain passes (document-frequency
  * aggregate; hot-mark join + per-doc rebuild) are inherent to the
  * operator — C4 runs exactly this shape — and both partially
  * aggregate map-side. The hot-line set is the filter's OUTPUT-side
  * artifact (only lines crossing the threshold), orders of magnitude
  * smaller than the line universe, so AQE turns the mark join into a
  * broadcast in practice while the plan stays correct when a
  * pathological corpus makes it large. The exploded lines are
  * persisted once and feed both consumers (df aggregate; hot-mark
  * join + rebuild).
  */
object LineDedup {

  /** (doc_id, clean_text, n_kept, n_removed); documents whose every
    * line is boilerplate survive with empty text (the caller decides
    * whether to drop them — a quality gate usually follows). */
  def dedupLines(df: DataFrame, id: Column, text: Column,
                 maxDocs: Long): DataFrame = {
    require(maxDocs >= 1L)
    val lines = df
      .select(id.as("doc_id"), posexplode(split(text, "\n")).as(Seq("pos", "line")))
      .persist(StorageLevel.MEMORY_AND_DISK) // df agg + hot-mark join read it
    val hot = lines.groupBy(col("line"))
      .agg(count_distinct(col("doc_id")).as("_df"))
      .filter(col("_df") > maxDocs)
      .select("line")
    // mark hot lines instead of anti-joining them away, so ONE
    // aggregate rebuilds the text AND counts kept/total — no second
    // per-doc aggregate and no re-scan of the raw text (a re-split
    // of `text` here would re-evaluate the text expression over the
    // whole corpus a third time); a null-text doc has no lines and
    // resolves to 0/0 through the final left join
    val marked = lines.join(hot.withColumn("_hot", lit(true)), Seq("line"), "left")
    val rebuilt = marked.groupBy("doc_id")
      .agg(
        concat_ws("\n",
          transform(
            filter(
              array_sort(collect_list(struct(col("pos"), col("line"),
                coalesce(col("_hot"), lit(false)).as("h")))),
              p => !p("h")),
            p => p("line"))).as("clean_text"),
        count(when(col("_hot").isNull, 1)).as("n_kept"),
        count(lit(1)).as("_n_lines"))
    df.select(id.as("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (coalesce(col("_n_lines"), lit(0L))
          - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }
}
