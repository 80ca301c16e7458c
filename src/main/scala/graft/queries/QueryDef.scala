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
