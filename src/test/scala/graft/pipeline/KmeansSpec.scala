package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structure checks for the k-means corpus operator and the
  * cluster-balanced sample (rows-only queries — centroids are not
  * SQL-derivable, so correctness is pinned here instead of DuckDB). */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpusN =
    graft.sources.Tables.embeddings(spark, sf).count()

  test("emb_kmeans partitions the corpus: sizes sum to |corpus|, cohesion sane") {
    val rows = Ann.embKmeans(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 16)
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === corpusN)
    rows.foreach { r =>
      val coh = r.getAs[Double]("cohesion")
      assert(coh >= -1.0 - 1e-9 && coh <= 1.0 + 1e-9, s"cohesion $coh")
      val share = r.getAs[Double]("top_label_share")
      assert(share > 0.0 && share <= 1.0 + 1e-9, s"share $share")
    }
  }

  test("every vector is assigned to its true nearest centroid (brute force)") {
    val e = graft.sources.Tables.embeddings(spark, sf)
    val cents = Ann.ivfCentroids(e, 16).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else d / (math.sqrt(na) * math.sqrt(nb))
    }
    // recompute the winning cid per vector on the driver (500 × 16 fixture)
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val got = Ann.pipelineClusterSample(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cid"))
    assert(got.nonEmpty)
    got.foreach { case (vid, cid) =>
      val v = vecs(vid)
      val best = cents.map { case (c, cv) => (c, cos(v, cv)) }
        .maxBy { case (c, s) => (s, -c) }._1
      assert(cid === best, s"vec $vid assigned $cid, nearest is $best")
    }
  }

  test("cluster sample: exactly min(k, |cluster|) rows per cluster, rerun-stable") {
    val k = 10
    val sizes = Ann.embKmeans(spark, sf).collect()
      .map(r => r.getAs[Long]("cid") -> r.getAs[Long]("n_vecs")).toMap
    val s1 = Ann.pipelineClusterSample(spark, sf).collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Long]("vec_id"), r.getAs[Long]("rn")))
    val byCluster = s1.groupBy(_._1)
    byCluster.foreach { case (cid, rows) =>
      assert(rows.length === math.min(k.toLong, sizes(cid)).toInt,
        s"cluster $cid: ${rows.length} sampled of ${sizes(cid)}")
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        s"cluster $cid ranks not dense")
    }
    // deterministic: a second evaluation yields the identical sample
    val s2 = Ann.pipelineClusterSample(spark, sf).collect()
      .map(r => (r.getAs[Long]("cid"), r.getAs[Long]("vec_id"), r.getAs[Long]("rn")))
    assert(s1.sorted.toSeq === s2.sorted.toSeq)
  }
}
