package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.LocalDateTime
import scala.util.Random

/** Seeded ALTERNATE-corpus generator for the distribution-robustness
  * sweep: same ten table schemas (and physical parquet types) as the
  * driver testdata, but adversarial distributions — skewed group
  * cardinalities, empty groups (a region with no nations, a market
  * segment with no customers, a source with no documents), all-null
  * fields, duplicate keys and texts, tie-heavy LIMIT boundaries,
  * same-microsecond event bursts, JSON prop variants (missing/quoted/
  * null `k`), zero-norm embeddings, and exact-duplicate vectors.
  *
  * Every oracle-checked query must hash-match DuckDB on THIS corpus as
  * well as the fixture one (scripts/selfcheck.py) — converting the
  * single-fixture proofs into distribution-robust proofs. The reference
  * behavior being pinned is its filter/agg semantics under missing and
  * null fields (reference: src/storage/src/bson_util.rs filter arms),
  * extended from the doc-store fuzzers to every oracle surface.
  *
  * Profiles:
  *  - `skew` (default): full-size corpus (~sf0.01) with the hazards above
  *  - `edge`: near-minimal tables (0–6 rows) — empty-input hardening;
  *    `edge,<t1+t2>` empties the named tables entirely
  *  - `fuzz`: small TPC-H-only corpus for the decorrelation sweep
  *    (DecorrFuzzSpec) — hazard rates themselves drawn per seed
  *  - `dupheavy`: the skew corpus plus ~30% of all documents sharing one
  *    (text, lang) — adversarial duplication through every dedup oracle
  *
  * Usage: GenCorpus <outDir> [seed] [profile]
  */
object GenCorpus {

  final case class Region(r_regionkey: Int, r_name: String)
  final case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  final case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Option[Double], c_mktsegment: String)
  final case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
      s_acctbal: Double)
  final case class Part(p_partkey: Long, p_name: String, p_brand: String,
      p_type: String, p_size: Int, p_retailprice: Double)
  final case class Order(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double, o_orderdate: LocalDateTime,
      o_orderpriority: String)
  final case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: LocalDateTime)
  final case class Event(event_id: Long, ts: LocalDateTime, user_id: Long,
      event_type: String, value: Option[Double], props: String)
  final case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  final case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  private def round2(d: Double): Double = math.round(d * 100.0) / 100.0

  private def pick[A](rnd: Random, weighted: Seq[(A, Double)]): A = {
    val r = rnd.nextDouble() * weighted.map(_._2).sum
    var acc = 0.0
    weighted.find { case (_, w) => acc += w; r < acc }.map(_._1)
      .getOrElse(weighted.last._1)
  }

  // word pool matching the fixture corpus's vocabulary
  private val Words: Array[String] =
    ("key agg row scan slow fast table value part hash merge batch line sort " +
      "window spark order data column join small customer query big group " +
      "stream filter the a").split(" ")

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val seed = if (args.length > 1) args(1).toLong else 20260814L
    val profile = if (args.length > 2) args(2) else "skew"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-gencorpus")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, outDir, seed, profile)
    spark.stop()
  }

  def generate(spark: SparkSession, outDir: String, seed: Long,
      profile: String): Unit = {
    import spark.implicits._
    val parts = profile.split(",", 2)
    val edge = parts(0) == "edge"
    val fuzz = parts(0) == "fuzz"
    // `dupheavy`: the skew corpus plus a corpus-wide duplicate cluster —
    // ~30% of ALL documents share one (text, lang). Oracle-checks the
    // dedup paths (rep-collapsed jaccard, exact, clusters, keep-list,
    // e2e) under adversarial duplication, where a collapse bug would
    // change pair output massively.
    val dupheavy = parts(0) == "dupheavy"
    val emptied: Set[String] = // '+' or ';' separated ('+' survives sbt quoting)
      if (parts.length > 1) parts(1).split("[;+]").toSet else Set.empty
    val rnd = new Random(seed)

    // `fuzz` profile (DecorrFuzzSpec): MANY small TPC-H-only corpora —
    // hazard RATES themselves are drawn per seed, so across a sweep some
    // corpora have no nulls and some are null-heavy, some tie everywhere,
    // some have empty predicate windows (every order in one year, no
    // giant orders, all-zero discounts). One knob set per corpus keeps
    // each corpus internally coherent while the sweep covers the space.
    val (nCust, nSupp, nPart, nOrd) =
      if (fuzz) (120, 30, 150, 400) else (1500, 100, 2000, 15000)
    val pNullBal = if (fuzz) rnd.nextDouble() * 0.25 else 0.03
    val pZeroBal = if (fuzz) rnd.nextDouble() * 0.3 else 0.10
    val pHotCust = if (fuzz) rnd.nextDouble() * 0.6 else 0.3
    val pTiePrice = if (fuzz) rnd.nextDouble() * 0.5 else 0.2
    val pBrandHoard = if (fuzz) rnd.nextDouble() * 0.5 else 0.25
    val discZeroAll = fuzz && rnd.nextInt(10) == 0
    val oneYearOnly = fuzz && rnd.nextInt(10) == 0
    val noGiants = fuzz && rnd.nextBoolean()

    // ---- region / nation --------------------------------------------------
    val regions = Seq(Region(0, "AFRICA"), Region(1, "AMERICA"),
      Region(2, "ASIA"), Region(3, "EUROPE"), Region(4, "MIDDLE EAST"))
    // region 4 gets NO nations (empty group through every region join);
    // region 2 hoards most of them
    val nations =
      if (edge) Seq(Nation(0, "NATION_0", 0), Nation(1, "NATION_1", 2),
        Nation(2, "NATION_2", 0))
      else (0 until 25).map { i =>
        val rk = if (i <= 14) 2 else Seq(0, 1, 3)(i % 3)
        Nation(i, s"NATION_$i", rk)
      }
    val nationKeys = nations.map(_.n_nationkey)

    // ---- customer ---------------------------------------------------------
    // segment MACHINERY absent; nation 2 hoards 40%; nations 5 and 6 have
    // zero customers; ~3% null acctbal; acctbal ties at 0.00
    val customers =
      if (edge) (0L until 5L).map(i => Customer(i, f"Customer#$i%09d",
        (i % 2).toInt * 2, if (i == 3) None else Some(round2(i * 10.0 - 20)),
        if (i < 3) "BUILDING" else "AUTOMOBILE"))
      else (0L until nCust.toLong).map { i =>
        val nk =
          if (rnd.nextDouble() < 0.4) 2
          else {
            var k = nationKeys(rnd.nextInt(nationKeys.length))
            while (k == 5 || k == 6) k = nationKeys(rnd.nextInt(nationKeys.length))
            k
          }
        val bal =
          if (rnd.nextDouble() < pNullBal) None
          else if (rnd.nextDouble() < pZeroBal) Some(0.0)
          else Some(round2(rnd.nextDouble() * 11000.0 - 1000.0))
        val seg = pick(rnd, Seq("BUILDING" -> 0.45, "AUTOMOBILE" -> 0.30,
          "FURNITURE" -> 0.20, "HOUSEHOLD" -> 0.05))
        Customer(i, f"Customer#$i%09d", nk, bal, seg)
      }

    // ---- supplier ---------------------------------------------------------
    // only nations 0..9 have suppliers; 10% negative balances; ties at 0
    val suppliers =
      if (edge) Seq(Supplier(0L, "Supplier#000000000", 0, 0.0),
        Supplier(1L, "Supplier#000000001", 2, -10.5))
      else (0L until nSupp.toLong).map { i =>
        val nk = nationKeys.filter(_ <= 9)(rnd.nextInt(10))
        val bal = if (rnd.nextDouble() < 0.1) round2(-rnd.nextDouble() * 500)
          else if (rnd.nextDouble() < 0.1) 0.0
          else round2(rnd.nextDouble() * 9000)
        Supplier(i, f"Supplier#$i%09d", nk, bal)
      }

    // ---- part -------------------------------------------------------------
    val adjs = Seq("small", "red", "blue", "green", "large", "tiny")
    val nouns = Seq("ring", "widget", "bolt", "gear", "cog", "plate")
    val ptypes = Seq("MEDIUM", "SMALL", "STANDARD", "LARGE", "ECONOMY", "PROMO")
    val partsTbl =
      if (edge) Seq(Part(0L, "red bolt", "Brand#23", "PROMO", 1, 1.0),
        Part(1L, "small ring", "Brand#12", "SMALL", 5, 10.0),
        Part(2L, "blue gear", "Brand#3", "LARGE", 15, 100.0))
      else (0L until nPart.toLong).map { i =>
        // Brand#23 hoards 25% of parts (q17/q19's brand)
        val brand = if (rnd.nextDouble() < pBrandHoard) "Brand#23"
          else s"Brand#${1 + rnd.nextInt(20)}"
        val ptype = pick(rnd, Seq("PROMO" -> 0.3, "STANDARD" -> 0.3,
          "SMALL" -> 0.15, "MEDIUM" -> 0.1, "LARGE" -> 0.1, "ECONOMY" -> 0.05))
        val size = if (rnd.nextDouble() < 0.4) 1 + rnd.nextInt(15)
          else 1 + rnd.nextInt(50)
        Part(i, s"${adjs(rnd.nextInt(adjs.length))} ${nouns(rnd.nextInt(nouns.length))}",
          brand, ptype, size, round2(1 + rnd.nextDouble() * 999))
      }

    // ---- orders -----------------------------------------------------------
    // customer 7 places 30% of orders; customers 1200+ place none;
    // 20% of totalprices tie at exactly 1000.00; dates pile on 1996
    val statuses = Seq("O" -> 0.7, "F" -> 0.29, "P" -> 0.01)
    val prios = Seq("1-URGENT" -> 0.4, "2-HIGH" -> 0.1, "3-MEDIUM" -> 0.1,
      "4-NOT SPECIFIED" -> 0.1, "5-LOW" -> 0.3)
    val orders =
      if (edge) (0L until 4L).map(i => Order(i, i % 3,
        if (i == 0) "F" else "O", 1000.0,
        LocalDateTime.of(1996, 7, 1 + i.toInt, 0, 0), "1-URGENT"))
      else (0L until nOrd.toLong).map { i =>
        val ck = if (rnd.nextDouble() < pHotCust) 7L
          else (nCust / 15).toLong + rnd.nextInt(nCust * 4 / 5 - nCust / 15)
        val price = if (rnd.nextDouble() < pTiePrice) 1000.0
          else round2(rnd.nextDouble() * 300000)
        val year = if (oneYearOnly) 1996
          else pick(rnd, Seq(1995 -> 0.1, 1996 -> 0.55, 1997 -> 0.15,
            1998 -> 0.1, 1999 -> 0.05, 2000 -> 0.05))
        val date = LocalDateTime.of(year, 1 + rnd.nextInt(12),
          1 + rnd.nextInt(28), 0, 0)
        Order(i, ck, pick(rnd, statuses), price, date, pick(rnd, prios))
      }

    // ---- lineitem ---------------------------------------------------------
    // 10 giant orders (60 lines, qty 50 → q18's >300 buyers); part 42 in
    // 20% of lines; tie-heavy quantities and discounts at q6/q19 bounds
    val nPartRows = partsTbl.length
    val nSuppRows = suppliers.length
    val lineitems = orders.flatMap { o =>
      val giant = !edge && !noGiants && o.o_orderkey < (if (fuzz) 3 else 10)
      val nLines = if (giant) 60 else 1 + rnd.nextInt(if (edge) 3 else 7)
      (1 to nLines).map { ln =>
        val pk = if (rnd.nextDouble() < 0.2) 42L % nPartRows
          else rnd.nextInt(nPartRows).toLong
        val sk = if (rnd.nextDouble() < 0.15) 3L % nSuppRows
          else rnd.nextInt(nSuppRows).toLong
        val qty = if (giant) 50.0
          else if (rnd.nextDouble() < 0.3) 50.0
          else (1 + rnd.nextInt(50)).toDouble
        val disc = if (discZeroAll) 0.0
          else pick(rnd, Seq(0.05 -> 0.2, 0.06 -> 0.2, 0.07 -> 0.2,
            0.0 -> 0.2, 0.01 -> 0.05, 0.02 -> 0.05, 0.08 -> 0.05, 0.1 -> 0.05))
        val tax = pick(rnd, Seq(0.0 -> 0.5, 0.04 -> 0.25, 0.08 -> 0.25))
        val rf = pick(rnd, Seq("N" -> 0.6, "A" -> 0.25, "R" -> 0.15))
        val ls = if (o.o_orderstatus == "O") "O" else pick(rnd, Seq("F" -> 0.7, "O" -> 0.3))
        val ship = o.o_orderdate.plusDays(rnd.nextInt(121).toLong)
        Lineitem(o.o_orderkey, pk, sk, ln, qty,
          round2(qty * (1 + rnd.nextDouble() * 1000)), disc, tax, rf, ls, ship)
      }
    }

    // ---- events -----------------------------------------------------------
    // user 0 emits 50% of events; half the January days empty; bursts of
    // identical timestamps; ~1% null values; props k missing/quoted/null
    val days = Seq(1, 2, 3, 9, 10, 29)
    val burstTs = (0 until 5).map(i =>
      LocalDateTime.of(2024, 1, 9, 12, 0, i).plusNanos(123456000L * i))
    val etypes = Seq("view" -> 0.6, "click" -> 0.3, "purchase" -> 0.05,
      "signup" -> 0.04, "error" -> 0.01)
    val events =
      if (fuzz) Seq.empty[Event]
      else if (edge) (0L until 5L).map(i => Event(i,
        LocalDateTime.of(2024, 1, 9, 12, 0, i.toInt), 0L, "view",
        if (i == 2) None else Some(1.0), if (i == 4) "{}" else s"""{"k": $i}"""))
      else (0L until 10000L).map { i =>
        val uid = if (rnd.nextDouble() < 0.5) 0L
          else 1L + math.floor(math.pow(rnd.nextDouble(), 3.0) * 299).toLong
        val ts = if (uid == 0L && rnd.nextDouble() < 0.2)
            burstTs(rnd.nextInt(burstTs.length))
          else LocalDateTime.of(2024, 1, days(rnd.nextInt(days.length)),
            rnd.nextInt(24), rnd.nextInt(60), rnd.nextInt(60))
            .plusNanos(rnd.nextInt(1000000) * 1000L)
        val value = if (rnd.nextDouble() < 0.01) None
          else Some(pick(rnd, Seq(0.0 -> 0.2, 1.0 -> 0.2, 9.99 -> 0.1,
            round2(rnd.nextDouble() * 490) -> 0.5)))
        val k = rnd.nextInt(100)
        val props = rnd.nextInt(20) match {
          case 0 => "{}"                       // k missing
          case 1 => s"""{"k": null}"""         // k explicitly null
          case 2 => s"""{"k": "$k"}"""         // reference wire form: quoted
          case 3 => s"""{"k": $k, "extra": "x"}"""
          case _ => s"""{"k": $k}"""
        }
        Event(i, ts, uid, pick(rnd, etypes), value, props)
      }

    // ---- documents --------------------------------------------------------
    def sent(n: Int): String =
      (0 until n).map(_ => Words(rnd.nextInt(Words.length))).mkString(" ")
    val boiler = "subscribe to our newsletter today"
    val docs: Seq[Document] =
      if (edge || fuzz) Seq.empty
      else {
        val dupText = sent(40)
        val nearBase = sent(40).split(" ")
        (0L until 600L).map { i =>
          val text: String = i match {
            // ~30% of docs share ONE text (180/600); the 40–44 unicode
            // range is excluded so the dupheavy profile keeps its
            // zh/accent hazard coverage
            case x if dupheavy && x % 10 < 3 && !(x >= 40 && x < 45) => dupText
            case x if x < 10 => dupText // exact-duplicate cluster of 10
            case x if x < 20 => // near-dups: one word flipped per doc
              val w = nearBase.clone(); w((x - 10).toInt % w.length) = "flip"
              w.mkString(" ")
            case x if x < 25 => "" // empty texts
            case x if x < 30 => Words(x.toInt % Words.length) // single word
            case x if x < 35 => ("echo " * 50).trim // heavy repetition
            case x if x < 40 =>
              s"contact alice@example.com or bob.smith@test.org call " +
                s"555-123-4567 visit https://example.com/p?q=$x and http://t.io/$x"
            case x if x < 45 => s"café naïve résumé 中文 测试 $x"
            case x if x < 145 => // shared boilerplate line + body
              boiler + "\n" + sent(10 + rnd.nextInt(40)) + "\n" + boiler
            case _ => sent(5 + rnd.nextInt(75))
          }
          // fr absent from the corpus; zh only on the unicode docs
          val lang = if (dupheavy && i % 3 == 0) "en" // cluster shares lang
            else if (i >= 40 && i < 45) "zh"
            else pick(rnd, Seq("en" -> 0.8, "de" -> 0.12, "es" -> 0.08))
          val src = if (rnd.nextDouble() < 0.5) "src0" else s"src${rnd.nextInt(10)}"
          Document(i, text, lang, src, text.length.toLong)
        }
      }

    // ---- embeddings -------------------------------------------------------
    val dim = 64
    val centroids = Array.fill(9, dim)(rnd.nextGaussian().toFloat)
    val embs: Seq[Embedding] =
      if (fuzz) Seq.empty[Embedding]
      else if (edge) Seq(Embedding(0L, Array.fill(dim)(1.0f), 0))
      else {
        val base = (0L until 600L).map { i =>
          val c = rnd.nextInt(9) // label 9 absent
          val v = centroids(c).map(x => x + rnd.nextGaussian().toFloat * 0.3f)
          Embedding(i, v, c)
        }
        // specials: exact duplicate pair, zero vector, colinear vector
        // (cosine tie with id 0 at a top-k boundary)
        val v0 = base(0).embedding
        base.updated(1, Embedding(1L, v0.clone(), base(0).label))
          .updated(2, Embedding(2L, Array.fill(dim)(0.0f), 0))
          .updated(3, Embedding(3L, v0.map(_ * 2.0f), base(0).label))
      }

    def emptyIf[A](name: String, rows: Seq[A]): Seq[A] =
      if (emptied(name)) Seq.empty else rows

    writeOne(spark, emptyIf("region", regions).toDF(), outDir, "region")
    writeOne(spark, emptyIf("nation", nations).toDF(), outDir, "nation")
    writeOne(spark, emptyIf("customer", customers).toDF(), outDir, "customer")
    writeOne(spark, emptyIf("supplier", suppliers).toDF(), outDir, "supplier")
    writeOne(spark, emptyIf("part", partsTbl).toDF(), outDir, "part")
    writeOne(spark,
      emptyIf("orders", orders).toDF()
        .withColumn("o_orderdate", org.apache.spark.sql.functions
          .col("o_orderdate").cast("timestamp_ntz")), outDir, "orders")
    writeOne(spark,
      emptyIf("lineitem", lineitems).toDF()
        .withColumn("l_shipdate", org.apache.spark.sql.functions
          .col("l_shipdate").cast("timestamp_ntz")), outDir, "lineitem")
    if (!fuzz) writeOne(spark,
      emptyIf("events", events).toDF()
        .withColumn("ts", org.apache.spark.sql.functions
          .col("ts").cast("timestamp_ntz")), outDir, "events")
    if (!fuzz) {
      writeOne(spark, emptyIf("documents", docs).toDF(), outDir, "documents")
      writeOne(spark, emptyIf("embeddings", embs).toDF(), outDir, "embeddings")
    }
  }

  /** Write a df as ONE parquet FILE at `<out>/<name>.parquet` (the driver
    * testdata layout — a file, not a directory, so DuckDB's plain-path
    * read works identically on both corpora). */
  private def writeOne(spark: SparkSession, df: DataFrame, out: String,
      name: String): Unit = {
    val tmp = s"$out/.tmp_$name"
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = Files.list(Paths.get(tmp)).filter(_.toString.endsWith(".parquet"))
      .findFirst().orElseThrow(() => new IllegalStateException(s"no part file for $name"))
    Files.createDirectories(Paths.get(out))
    Files.move(part, Paths.get(out, s"$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => Files.deleteIfExists(p))
  }
}
