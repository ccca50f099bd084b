package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema.
  *
  * All scans go through here so that every operator benefits from the same
  * source behavior: parquet columnar pruning + predicate pushdown (verified
  * in specs via `.explain` — `ReadSchema` / `PushedFilters`). On a real
  * cluster these would be partitioned/bucketed external tables; in this
  * harness they are single parquet files per table.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** events.parquet with `ts` normalized to a session-UTC TIMESTAMP.
    * The driver's generator has stamped `ts` two ways across rounds:
    * TIMESTAMP(NANOS) (which Spark reads as a nanos long under the
    * legacy conf `eventsRaw` sets — normalize via integer `div`, a
    * double round trip would lose precision above 2^53 ns) and, newer,
    * TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
    * TIMESTAMP_NTZ — normalize with a cast; sessions here pin
    * `spark.sql.session.timeZone=UTC`, so the cast maps wall-clock to
    * the same instant DuckDB sees). Handling both keeps every derived
    * corpus (ScaleSmoke, fixtures) readable regardless of vintage. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = eventsRaw(spark, dir)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** events with `ts` left in its RAW on-disk form (nanos long for the
    * legacy files, TIMESTAMP_NTZ for the current ones). Time-range
    * predicates belong HERE: comparisons against a literal of the raw
    * type push down to the parquet scan and prune row groups, while
    * `events` above wraps ts in a conversion Catalyst will not push
    * through, so filters there scan everything. */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view (for spark.sql usage). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
