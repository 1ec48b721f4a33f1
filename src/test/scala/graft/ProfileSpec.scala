package graft

import graft.operators.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def byCol(rows: Array[org.apache.spark.sql.Row]) =
    rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.getString(4)), Option(r.getString(5)), r.getString(6))).toMap

  test("hand-built profile: counts, nulls, distincts, min/max, top-k") {
    val df = Seq(
      (1L, Option("a"), Option.empty[String]),
      (2L, Option("a"), Option.empty[String]),
      (3L, Option("b"), Option.empty[String]),
      (4L, Option.empty[String], Option.empty[String])
    ).toDF("id", "s", "t")
    val got = byCol(Profile.profile(df, Seq("id", "s", "t"), topK = 2).collect())
    // singleton counts tie-break by value ascending
    assert(got("id") == ((4L, 0L, 4L, Some("1"), Some("4"), "1,2")))
    assert(got("s") == ((4L, 1L, 2L, Some("a"), Some("b"), "a,b")))
    // an all-null column profiles cleanly
    assert(got("t") == ((4L, 4L, 0L, None, None, "")))
  }

  test("top-k orders by count desc then value") {
    val df = (Seq.fill(3)("z") ++ Seq.fill(3)("y") ++ Seq.fill(1)("a"))
      .toDF("v")
    val got = byCol(Profile.profile(df, Seq("v"), topK = 2).collect())
    assert(got("v")._6 == "y,z") // 3-way count tie y/z -> value order; a drops
  }

  test("q_profile matches the naive per-column computation") {
    val docs = Tables.load(spark, sfDir, "documents")
    val got = byCol(SparkEntry.queries("q_profile")(spark, sfDir).collect())
    assert(got.keySet == Set("doc_id", "text", "lang", "source", "n_chars"))
    val n = docs.count()
    for ((c, (rows, nulls, distinct, _, _, _)) <- got) {
      assert(rows == n, c)
      assert(nulls == docs.filter(docs(c).isNull).count(), c)
      assert(distinct == docs.filter(docs(c).isNotNull)
        .select(c).distinct().count(), c)
    }
  }
}
