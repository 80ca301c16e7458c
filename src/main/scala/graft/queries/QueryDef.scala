package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark plan plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB as the correctness
  * oracle. Column names/types and row order must agree between the two.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** On-disk bytes of a source table — the scale signal for sizing
    * cached-relation partitions (round 11, guide §2.2). Hadoop-FS
    * path so it works for any scheme the session can read.
    */
  def inputBytes(spark: SparkSession, dir: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Gate-repartition a scan whose downstream per-row work is heavy
    * (tokenization, JSON predicate batteries, codec decode): when the
    * source yields FEWER partitions than the session parallelism —
    * single-file / single-row-group inputs, which parquet can only
    * split at row-group grain — one cheap shuffle of the raw rows
    * unlocks the cores for the expensive map stage (guide §2.5 input
    * skew: "one huge unsplittable file … repartition immediately
    * after the read"). At real scale the scan already has ≥ cores
    * partitions and this is the identity — no added shuffle — so the
    * policy is input-derived, never a local tuning constant. Apply
    * ONLY where the per-row work dwarfs one extra exchange of the
    * input rows.
    */
  def spread(spark: SparkSession, df: DataFrame): DataFrame = {
    val par = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  /** Partition count for a persisted multi-consumer relation DERIVED
    * from ~`bytes` of input: one partition per 128 MB of source data,
    * floored at 1 (guide §2.2 "fewer, larger partitions" — tiny
    * cached partitions cost a fixed per-task overhead every consumer
    * and every iteration re-pays; at real scale the quotient grows
    * with the data, so this is input-derived, never a local-core
    * constant).
    */
  def cacheParts(bytes: Long): Int =
    math.max(1L, math.min(1L << 20, (bytes + (128L << 20) - 1) / (128L << 20)))
      .toInt

  /** The events table's `ts` encoding has varied across driver data
    * generations: TIMESTAMP(NANOS) (surfaced by Spark only as a LONG
    * via the nanosAsLong legacy conf) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) (surfaced as TIMESTAMP_NTZ). Dispatch on
    * the type actually read so both generations land on the same
    * session-UTC micros TimestampType column the suite (and the
    * DuckDB oracle, which sees naive micros either way) computes on:
    * nanos-as-long floor-divides to micros — DuckDB's own
    * `CAST(ts AS TIMESTAMP)` truncation — and NTZ casts through the
    * UTC session timezone, which is numerically the identity on the
    * stored micros.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Exception => () } // non-settable => already decided
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = read(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      // NTZ micros cast through the UTC session zone == identity on the
      // stored micros (see the dispatch note above).
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts read as unexpected parquet type $other — the driver " +
          "likely regenerated testdata with a new ts encoding; check the " +
          "parquet logical type and add an explicit dispatch arm here " +
          "rather than silently casting")
    }
  }
}

/** THE content-hash bucket rule for every reproducible split/sample in
  * the suite (train_split, decontaminate's labels, stratified_sample):
  * first 16 bits of md5 of the stable id, mod `mod`. Single-sourced so
  * a split-rule change can never diverge one consumer's labels from
  * another's; reproducible across engines, runs, partitionings and
  * cluster sizes (never `rand()`).
  */
/** THE cents quantization for oracle-exact money/value columns:
  * round(x·100) into int64, so distributed sums are order-independent
  * integers and the double division happens once at the end.
  * Single-sourced (Spark + DuckDB sides) so a rounding-mode or
  * quantum change can never diverge one query from another.
  */
object Quantize {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  def cents(c: Column): Column = round(c * 100).cast("long")

  def centsSql(expr: String): String =
    s"CAST(round($expr * 100) AS BIGINT)"
}

object ContentHash {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  def bucket(idCol: Column, mod: Int): Column =
    conv(substring(md5(idCol.cast("string")), 1, 4), 16, 10)
      .cast("long") % mod

  def bucketSql(idExpr: String, mod: Int): String =
    s"('0x' || substr(md5(CAST($idExpr AS VARCHAR)), 1, 4))::BIGINT % $mod"
}
