package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.Tables
import graft.analytics.Analytics
import graft.events.EventQueries

/** Round-3 operator block: repetition signals, PII scrub, weighted
  * sampling, histogram, retention cohorts, pivot. The DuckDB oracle proves
  * engine parity; these specs prove the SEMANTICS against independently
  * computed ground truth on the fixture corpus. */
class CurationOpsSpec extends SparkSpec {

  test("pii scrub redacts exactly the planted instances") {
    val out = TextOps.textPiiScrub(spark, sf).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val id = r.getLong(0); val txt = r.getString(1); val n = r.getLong(2)
      val expected = (if (id % 5 == 0) 1 else 0) + (if (id % 7 == 0) 1 else 0) +
        (if (id % 11 == 0) 1 else 0)
      assert(n == expected, s"doc $id: $n redactions, expected $expected")
      assert(!txt.contains("@mail.example.com"), s"doc $id leaked an email")
      assert(!txt.contains("123-45-6789"), s"doc $id leaked an id")
      assert(!txt.contains("10.0.42.7"), s"doc $id leaked an ip")
      if (id % 5 == 0) assert(txt.contains("<EMAIL>"))
      if (id % 7 == 0) assert(txt.contains("<ID>"))
      if (id % 11 == 0) assert(txt.contains("<IP>"))
    }
  }

  test("repetition signals match a hand count on one document") {
    val doc = Tables.documents(spark, sf).orderBy("doc_id").limit(1).collect()(0)
    val id = doc.getAs[Long]("doc_id")
    val toks = doc.getAs[String]("text").trim.split("\\s+").filter(_.nonEmpty)
    val counts = toks.groupBy(identity).map(_._2.length)
    val r = TextOps.textRepetition(spark, sf)
      .filter(col("doc_id") === id).collect()(0)
    assert(r.getAs[Long]("n_tokens") == toks.length)
    assert(r.getAs[Long]("n_distinct") == counts.size)
    assert(r.getAs[Long]("top_cnt") == counts.max)
    assert(r.getAs[Double]("dup_frac") ==
      (toks.length - counts.size).toDouble / toks.length)
  }

  test("weighted sample keeps exactly the rows the hash formula selects") {
    val kept = Curation.pipelineSampleWeighted(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
      .collect()
    for (r <- all) {
      val id = r.getLong(0); val toks = r.getLong(1)
      val expectKeep =
        java.lang.Math.floorMod(id * 3266489917L, 100000L) < math.min(toks, 500L) * 200L
      assert(kept.contains(id) == expectKeep, s"doc $id")
    }
  }

  test("histogram buckets partition the event count") {
    val h = EventQueries.evtHistogram(spark, sf)
    val total = h.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
    assert(h.filter(col("bucket_lo") =!= col("bucket") * 25.0).count() == 0)
  }

  test("retention cohort offset-0 counts the cohort's full population") {
    val rc = EventQueries.evtRetentionCohort(spark, sf)
    // every user appears in their own cohort at offset 0, so summing
    // offset-0 counts over cohorts recovers the distinct-user total
    val atZero = rc.filter(col("wk_offset") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(atZero == users)
    assert(rc.filter(col("wk_offset") < 0).count() == 0)
  }

  test("pivot columns re-sum to the unpivoted totals") {
    val p = Analytics.qPivot(spark, sf)
      .agg(sum(coalesce(col("rev_f"), lit(0.0)) + coalesce(col("rev_o"), lit(0.0))
        + coalesce(col("rev_p"), lit(0.0))).as("tot"))
      .collect()(0).getDouble(0)
    val direct = Tables.orders(spark, sf)
      .agg(sum(col("o_totalprice").cast(org.apache.spark.sql.types.DataTypes
        .createDecimalType(18, 2))).cast("double")).collect()(0).getDouble(0)
    assert(math.abs(p - direct) / direct < 1e-9)
  }
}
