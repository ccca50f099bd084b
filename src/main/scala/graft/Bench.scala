package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark entrypoint: times every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints ONE compact JSON line on stdout
  * (the driver parses it into BENCH_r{N}.json). Keep the line short —
  * per-query seconds are rounded to ms — and keep it the LAST thing
  * printed, unprefixed (build.sbt sets `run / outputStrategy :=
  * StdoutOutput` so sbt does not wrap it in `[info] `).
  *
  * Each query runs SPARK_GRAFT_BENCH_PASSES times (default 5) and the
  * headline number is the per-query MEDIAN: single-pass timings on a
  * shared local[32] box whipsawed 10× between same-code runs (r3/r4
  * verdicts), so one noisy pass must never masquerade as a plan
  * regression. The full per-pass record (plus per-query min–max spread,
  * a normalized physical-plan hash, and round-over-round regression
  * flags vs the previous committed bench_out.json) is persisted to
  * bench_out.json next to the repo (stdout keeps only the medians — the
  * driver tails it to 2000 chars). A query whose median moved >2× is
  * auto-explained: "plan" says whether its normalized plan hash changed
  * since the previous record or the move is pure box jitter.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "5").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Warm up what is shared across queries and NOT the thing being
    // measured: JVM/codegen paths, parquet footers + schema inference for
    // every base table at this SF. Without this the first timed query
    // absorbs session + IO setup (doc_filter_in showed 12.8s in r02 purely
    // from hash-map iteration order putting it first).
    spark.range(1000).selectExpr("sum(id)").collect()
    // events.parquet carries TIMESTAMP(NANOS); Tables sets this for real
    // reads, the warmup needs it too
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      try spark.read.parquet(s"$sfDir/$t.parquet").foreach(_ => ())
      catch { case NonFatal(_) => }
    }
    try SparkEntry.entry(spark).count() catch { case NonFatal(_) => }
    // pass-major order: query q's pass 2 runs a full suite-length after
    // its pass 1, so a transient box-load spike cannot poison every pass
    // of the same query
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // Fixed calibration workload timed once per pass: data-INDEPENDENT
    // (spark.range), pinned size/partitioning, a codegen'd hash + a 1M-key
    // shuffle — the same resources the suite stresses. Its round-over-
    // round ratio measures BOX drift (r9→r10 drifted a uniform 1.2× with
    // zero code change, under the >2× per-query gate's radar), so the
    // regression flags below run on calibration-NORMALIZED ratios and a
    // uniform library regression can no longer hide inside box jitter.
    def calibrate(): Double = {
      val t0 = System.nanoTime()
      spark.range(0L, 48L * 1000 * 1000, 1L, 32)
        // pmod keeps the 48M-row double sum far from long overflow (ANSI)
        .selectExpr("id % 1000000 AS k", "pmod(xxhash64(id), 1000003) AS h")
        .groupBy("k").agg(org.apache.spark.sql.functions.sum("h").as("s"))
        .selectExpr("sum(s)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // warm the calibration path itself before timing it
    val calPerPass = new Array[Double](passes)
    val perPass = Array.tabulate(passes) { pass =>
      // result-artifact caches must not leak across passes (each pass
      // must time the operator, not a prior pass's persisted output);
      // input-fixture caches (session doc collection) stay warm on purpose
      graft.pipeline.Dedup.clearResultCaches()
      graft.pipeline.Curation.clearResultCaches()
      graft.operators.OperatorQueries.clearResultCaches()
      graft.operators.SkewDispatch.clearStatsCache()
      calPerPass(pass) = calibrate()
      names.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch {
            case NonFatal(e) =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
    }
    def median(xs: Seq[Double]): Double = {
      val good = xs.filter(_ >= 0.0).sorted
      if (good.isEmpty) -1.0
      else if (good.length % 2 == 1) good(good.length / 2)
      else (good(good.length / 2 - 1) + good(good.length / 2)) / 2.0
    }
    val results = names.map { case (name, _) =>
      name -> median(perPass.toSeq.map(_(name)))
    }

    // ---- regression hygiene -------------------------------------------
    // normalized physical-plan hash per query (expr ids / plan ids / scan
    // listings stripped): lets the NEXT round tell a real plan change
    // from box jitter. Result caches cleared so cache state can't leak
    // InMemoryRelations into the hash.
    graft.pipeline.Dedup.clearResultCaches()
    graft.pipeline.Curation.clearResultCaches()
    graft.operators.OperatorQueries.clearResultCaches()
    graft.operators.SkewDispatch.clearStatsCache()
    val planHashes: Map[String, String] = names.map { case (name, fn) =>
      val h = try {
        val s = fn(spark, sfDir).queryExecution.executedPlan.toString
          .replaceAll("#\\d+", "#")
          .replaceAll("plan_id=\\d+", "plan_id=")
          .replaceAll("Location: [^,\\]]+", "Location:")
          // session-global counters / object identities that vary with
          // RUN ORDER, not plan shape: lambda variable ids and literal
          // array identity hashes (UnsafeArrayData@...)
          .replaceAll("lambda [A-Za-z]+_\\d+", "lambda x_")
          .replaceAll("@[0-9a-f]{6,}", "@")
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      } catch { case NonFatal(_) => "error" }
      name -> h
    }.toMap
    // previous committed record (the prior round's bench_out.json)
    val outPath = java.nio.file.Paths.get(
      sys.props.getOrElse("user.dir", "."), "bench_out.json")
    val (prevMed, prevHash): (Map[String, Double], Map[String, String]) =
      try {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        val j = JsonMethods.parse(java.nio.file.Files.readString(outPath))
        def strMap(field: String): Map[String, String] = j \ field match {
          case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
          case _ => Map.empty
        }
        // only comparable against a record from the SAME corpus dir
        val sameSf = j \ "sf" match {
          case JString(s) => s == sfDir
          case _ => false
        }
        val med = if (!sameSf) Map.empty[String, Double] else j \ "queries" match {
          case JObject(fs) => fs.collect {
            case (k, JDouble(v)) => k -> v
            case (k, JInt(v)) => k -> v.toDouble
            case (k, JDecimal(v)) => k -> v.toDouble
          }.toMap
          case _ => Map.empty[String, Double]
        }
        (med, if (sameSf) strMap("plan_hashes") else Map.empty[String, String])
      } catch { case NonFatal(_) => (Map.empty, Map.empty) }
    // box-drift normalization: this round's calibration vs the previous
    // committed record's. drift > 1 = the box got slower; each query's
    // normalized time = raw / drift. 1.0 when no prior calibration exists.
    val calMed = median(calPerPass.toIndexedSeq)
    val prevCal: Double =
      try {
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        JsonMethods.parse(java.nio.file.Files.readString(outPath)) \ "calibration" match {
          case JDouble(v) => v
          case JDecimal(v) => v.toDouble
          case JInt(v) => v.toDouble
          case _ => -1.0
        }
      } catch { case NonFatal(_) => -1.0 }
    val drift = if (prevCal > 0.0 && calMed > 0.0) calMed / prevCal else 1.0
    // flag >2× NORMALIZED moves either way (raw/drift vs prev — uniform
    // box drift divides out, so it neither masks a real uniform library
    // regression nor cries wolf on a slow box day), and explain them:
    // same plan hash = residual jitter; different = a plan change to audit
    val regressions = results.collect {
      case (name, now) if now > 0.0 && prevMed.get(name).exists(p =>
          p > 0.0 && { val n = now / drift; n / p > 2.0 || p / n > 2.0 }) =>
        val prev = prevMed(name)
        val plan = (prevHash.get(name), planHashes.get(name)) match {
          case (Some(a), Some(b)) if a == b => "same"
          case (Some(_), Some(_)) => "changed"
          case _ => "unknown"
        }
        (name, prev, now, plan)
    }

    def r3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // a query that failed every pass keeps its -1.0 sentinel in "queries"
    // but must not SUBTRACT from the headline total; it is reported
    // explicitly in "failed" so an all-pass-failure is loud in the JSON,
    // not a silently-smaller total
    val failed = results.collect { case (k, v) if v < 0.0 => k }
    val total = results.collect { case (_, v) if v >= 0.0 => v }.sum
    spark.stop()
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // regressions ride the STDOUT line too (at the end, inside the
    // driver's 2000-char tail): a >2× round-over-round move is loud in
    // BENCH_r{N}.json itself, already explained
    val regJson = regressions.map { case (n, p, now, plan) =>
      s"""{"q":"$n","prev":${r3(p)},"now":${r3(now)},"norm_now":${r3(now / drift)},"plan":"$plan"}"""
    }.mkString("[", ",", "]")
    // calibration + drift ride the END of the line (the driver tails
    // stdout to 2000 chars — trailing fields always survive)
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","passes":$passes,"calibration":${r3(calMed)},"cal_drift":${r3(drift)},"total_norm":${r3(total / drift)},"regressions":$regJson}"""
    // the driver keeps only a 2000-char tail of stdout — persist the full
    // per-pass record so timings survive for every round. Path resolved
    // against the repo (user.dir), not whatever cwd the forked JVM got.
    val passesJson = names.map { case (name, _) =>
      s"\"" + name + "\":" + perPass.map(p => r3(p(name))).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // per-query min–max spread across passes (variance at a glance)
    val spreadJson = names.map { case (name, _) =>
      val good = perPass.toSeq.map(_(name)).filter(_ >= 0.0)
      val sp = if (good.isEmpty) -1.0 else good.max - good.min
      s"\"" + name + "\":" + r3(sp)
    }.mkString("{", ",", "}")
    val hashJson = names.map { case (name, _) =>
      s"\"" + name + "\":\"" + planHashes.getOrElse(name, "error") + "\""
    }.mkString("{", ",", "}")
    // both series in the committed record: raw medians ("queries") and
    // calibration-normalized ("queries_norm"). The regression gate above
    // compares raw-now/drift against the PREVIOUS record's raw series —
    // that is the round-over-round-comparable arithmetic. queries_norm
    // is informational (this round's times in drift-corrected units);
    // do NOT compare one round's queries_norm against another's — each
    // is normalized to a different round's box.
    val qsNorm = results.map { case (k, v) =>
      s"\"" + k + "\":" + r3(if (v >= 0.0) v / drift else v)
    }.mkString("{", ",", "}")
    val calPassesJson = calPerPass.map(r3).mkString("[", ",", "]")
    val fileLine = line.dropRight(1) +
      s""","queries_norm":$qsNorm,"cal_per_pass":$calPassesJson,"per_pass":$passesJson,"spread":$spreadJson,"plan_hashes":$hashJson}"""
    try java.nio.file.Files.write(outPath, (fileLine + "\n").getBytes("UTF-8"))
    catch {
      case NonFatal(e) =>
        System.err.println(s"[bench] could not write $outPath: $e")
    }
    // last line of output, after Spark's shutdown logging
    System.out.println(line)
    System.out.flush()
  }
}
