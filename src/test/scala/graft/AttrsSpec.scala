package graft

import graft.text.TextFeatures
import org.apache.spark.sql.functions._

/** The fused attribute pass must agree column-for-column with the
  * standalone operators it fuses (the oracle side is composed from
  * their oracles, so this pins the Spark side the same way). */
class AttrsSpec extends SparkSpec {

  test("fused attributes equal the standalone operators column-for-column") {
    val docs = Tables.documents(spark, sfDir)
    val lined = regexp_replace(
      regexp_replace(col("text"), "\\s+", " "), "(\\S+ \\S+) ", "$1\n")
    val attrs = TextFeatures.attributes(docs, col("doc_id"), col("text"), lined)

    def rows(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Any]] =
      df.collect().map(r => r.getLong(0) -> r.toSeq.tail.toSeq).toMap

    val tok = rows(TextFeatures.tokenStats(docs, col("doc_id"), col("text")))
    val qual = rows(TextFeatures.quality(docs, col("doc_id"), col("text")))
    val rep = rows(TextFeatures.repetition(docs, col("doc_id"), col("text")))
    val lin = rows(TextFeatures.lineRepetition(
      docs.withColumn("_lined", lined), col("doc_id"), col("_lined")))
    val lang = rows(TextFeatures.langId(docs, col("doc_id"), col("text")))

    val got = attrs.collect()
    assert(got.length == docs.count())
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.toSeq.slice(1, 5) == tok(id), s"tokenStats columns, doc $id")
      // quality: n_chars_m, (skip n_tokens — not emitted), punct, digit,
      // stop, keep
      val q = qual(id)
      assert(r.toSeq(5) == q(0) && r.toSeq.slice(6, 10) == q.drop(2),
        s"quality columns, doc $id")
      rep.get(id) match {
        case Some(rr) => // (n_tokens, max_run, top2gram_n, dup_word, top2_frac)
          assert(r.toSeq(10) == rr(1) && r.toSeq(11) == rr(3) &&
            r.toSeq(12) == rr(4), s"repetition columns, doc $id")
        case None =>
          assert(r.isNullAt(10) && r.isNullAt(11) && r.isNullAt(12),
            s"sub-2-token doc $id must carry NULL repetition attributes")
      }
      val l = lin(id) // n_lines, dup_line_frac, dup_line_char_frac, ...
      assert(r.toSeq.slice(13, 16) == l.take(3), s"line columns, doc $id")
      assert(r.toSeq(16) == lang(id).last, s"pred_lang, doc $id")
    }
  }
}
