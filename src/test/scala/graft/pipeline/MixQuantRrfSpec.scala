package graft.pipeline

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantics pins for the round-11 additions: int8 scalar quantization,
  * hybrid RRF retrieval, and domain oversampling. The DuckDB oracle
  * proves cross-engine agreement; these pin the properties the oracle
  * can't express (code-range/reconstruction invariants, fusion-vs-arm
  * consistency, token-budget semantics of the expansion). */
class MixQuantRrfSpec extends SparkSpec {

  test("emb_quantize_int8: codes in [0,255], degenerate dims code 0, mse small") {
    val r = CorpusStats.embQuantizeInt8(spark, sf)
    val rows = r.collect()
    assert(rows.nonEmpty)
    // sum over 64 dims of codes in [0,255]
    rows.foreach { row =>
      val n = row.getAs[Long]("n_dims")
      val sc = row.getAs[Long]("sum_code")
      assert(sc >= 0 && sc <= 255L * n)
      assert(row.getAs[Double]("mse") >= 0.0)
    }
    // 8-bit reconstruction of a [mn,mx] range has per-dim error ≤
    // (step/2)² with step=(mx-mn)/255 — check against the actual ranges
    val stats = Tables.embeddings(spark, sf)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(((max(col("v")) - min(col("v"))) / 255).as("step"))
      .agg(max(col("step") * col("step") / 4)).head().getDouble(0)
    rows.foreach { row =>
      assert(row.getAs[Double]("mse") <= stats * 1.0000001,
        s"mse exceeds the max per-dim quantization bound: $row")
    }
  }

  test("emb_quantize_int8: an all-equal dimension reconstructs exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 5.0f)), (2L, Seq(1.0f, 7.0f)), (3L, Seq(1.0f, 6.0f))
    ).toDF("vec_id", "embedding")
    // dim 0 is constant: mn = mx → code 0, recon = mn, sqerr 0.
    // The operator reads via Tables, so run the same chain inline.
    val d = df.select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("vec_id"), col("dim"), col("v").cast("double").as("xd"))
    val st = d.groupBy(col("dim")).agg(min(col("xd")).as("mn"), max(col("xd")).as("mx"))
    val coded = d.join(broadcast(st), Seq("dim"))
      .withColumn("code",
        when(col("mx") > col("mn"),
          least(greatest(round((col("xd") - col("mn")) /
            (col("mx") - col("mn")) * 255, 0), lit(0.0)), lit(255.0)))
          .otherwise(lit(0.0)).cast("long"))
    val dim0 = coded.filter(col("dim") === 0).select("code").collect().map(_.getLong(0))
    assert(dim0.forall(_ == 0L))
    // extremes of a varying dim hit the code range ends exactly
    val dim1 = coded.filter(col("dim") === 1)
      .select(col("xd"), col("code")).collect()
    assert(dim1.find(_.getDouble(0) == 5.0).get.getLong(1) === 0L)
    assert(dim1.find(_.getDouble(0) == 7.0).get.getLong(1) === 255L)
  }

  test("ann_hybrid_rrf: fusion is consistent with its arms") {
    val r = Ann.annHybridRrf(spark, sf).collect()
    assert(r.nonEmpty)
    val k = 60.0
    r.foreach { row =>
      val lex = Option(row.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
      val vec = Option(row.getAs[java.lang.Long]("vec_rank")).map(_.toLong)
      assert(lex.nonEmpty || vec.nonEmpty, "a fused doc must come from an arm")
      val expect = lex.map(r0 => BigDecimal(1.0 / (k + r0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).getOrElse(BigDecimal(0)) +
        vec.map(r0 => BigDecimal(1.0 / (k + r0))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)).getOrElse(BigDecimal(0))
      assert(math.abs(row.getAs[Double]("rrf") - expect.toDouble) < 1e-12)
    }
    // ranks are a permutation of 1..n ordered by rrf desc
    val byRank = r.sortBy(_.getAs[Long]("rank"))
    assert(byRank.map(_.getAs[Long]("rank")).toSeq == (1L to r.length).toSeq)
    val rrfs = byRank.map(_.getAs[Double]("rrf")).toSeq
    assert(rrfs == rrfs.sorted.reverse, "rank order must follow rrf desc")
    // a doc in both arms outranks the same-rank doc in one arm
    val both = r.filter(x => x.getAs[java.lang.Long]("lex_rank") != null &&
      x.getAs[java.lang.Long]("vec_rank") != null)
    both.foreach { b =>
      r.filter(x => x.getAs[java.lang.Long]("vec_rank") == null &&
          x.getAs[java.lang.Long]("lex_rank") != null &&
          x.getAs[java.lang.Long]("lex_rank") >= b.getAs[java.lang.Long]("lex_rank"))
        .foreach { lone =>
          assert(b.getAs[Long]("rank") < lone.getAs[Long]("rank"),
            s"two-arm doc must outrank weaker one-arm doc: $b vs $lone")
        }
    }
  }

  test("pipeline_oversample: every doc ≥1 copy, max source exactly 1, budgets equalize") {
    val out = Curation.pipelineOversample(spark, sf)
    val perDoc = out.groupBy(col("doc_id"), col("source"))
      .agg(countDistinct(col("epoch")).as("copies"), count(lit(1)).as("rows"))
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      assert(r.getAs[Long]("copies") >= 1L && r.getAs[Long]("copies") <= 8L)
      assert(r.getAs[Long]("copies") == r.getAs[Long]("rows"), "epochs must be distinct")
    }
    // source token totals before/after: the largest source is unchanged,
    // every other source lands within one max-doc of the shared target
    val d = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("toks"))
    val before = d.groupBy(col("source")).agg(sum(col("toks")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = before.values.max
    val after = out.groupBy(col("source")).agg(sum(col("toks")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxSource = before.maxBy(_._2)._1
    assert(after(maxSource) == before(maxSource), "the target source is not expanded")
    val maxDocToks = d.agg(max(col("toks"))).head().getLong(0)
    after.foreach { case (s, t) =>
      val full = target / before(s)
      if (full < 8) {
        // expectation of the fractional-epoch hash keep is exact; the
        // realized total is within a small-sample band around the target
        assert(math.abs(t - target).toDouble <=
          math.max(0.35 * target, 40.0 * maxDocToks),
          s"source $s: after=$t target=$target")
      }
    }
    // determinism / repartition stability
    val again = Curation.pipelineOversample(spark, sf)
      .repartition(7).collect().toSet
    assert(again == out.collect().toSet)
  }
}
