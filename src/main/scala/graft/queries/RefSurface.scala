package graft.queries

import graft.filters.FilterOracle
import graft.functions.Sse
import graft.operators.Fanout
import graft.operators.Fanout.Subscription
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries replicating the reference's own analytic surface over the
  * driver's `events` table: subsystem fan-out with filter predicates,
  * SSE/chunk framing, envelope validation.
  */
object RefSurface {

  /** Standing subscriptions for the batch fan-out queries (FIXTURES §7
    * shape). Subscription 4's string filter `k<='50'` never matches the
    * integer `props.k` — it pins the reference's strict type matching
    * in the oracle comparison. Subscription 3 has zero filters =>
    * matches every `error` event (evtstrd/listener.py:62).
    */
  val subscriptions: Seq[Subscription] = Seq(
    Subscription(1L, "purchase", Seq("k<=50")),
    Subscription(2L, "purchase", Seq("k>=10", "k<90")),
    Subscription(3L, "error", Nil),
    Subscription(4L, "view", Seq("k<='50'")))

  private val crlf = "chr(13) || chr(10)"

  /** Flagship: compiled fan-out + SSE frame projection. */
  def fanout(spark: SparkSession, dir: String): DataFrame = {
    // spread (guide §2.5): every event evaluates the full compiled
    // subscription battery (JSON-path extraction × filters) in the
    // scan stage — identity at real scale
    val events = Tables.spread(spark, Tables.events(spark, dir))
    Fanout
      .compiled(events, subscriptions, col("event_type"), col("props"))
      .select(
        col("sub_id"),
        col("event_id"),
        Sse
          .frame(col("event_type"), col("props"), col("event_id").cast("string"))
          .as("frame"))
      .orderBy("sub_id", "event_id")
  }

  /** Same result through the runtime path: broadcast join on subsystem
    * + residual filter evaluation (subscriptions as data).
    */
  def fanoutDynamic(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // spread: the residual filter interpreter runs per (event × sub)
    // row after the broadcast join that rides the scan stage
    val events = Tables.spread(spark, Tables.events(spark, dir))
    val subs = subscriptions
      .map(s => (s.id, s.subsystem, s.filters))
      .toDF("sub_id", "subsystem", "filters")
    Fanout
      .dynamic(events, subs, col("event_type"), col("props"))
      .select(col("sub_id"), col("event_id"))
      .orderBy("sub_id", "event_id")
  }

  def fanoutOracle: String = {
    val branches = subscriptions.map { s =>
      val frame =
        s"'event: ' || event_type || $crlf || 'data: ' || props || $crlf" +
          s" || 'id: ' || CAST(event_id AS VARCHAR) || $crlf || $crlf"
      s"SELECT CAST(${s.id} AS BIGINT) AS sub_id, event_id, $frame AS frame " +
        s"FROM events WHERE event_type = '${s.subsystem}' " +
        s"AND ${FilterOracle.predicateAll(s.filters, "props")}"
    }
    branches.mkString("", " UNION ALL ", " ORDER BY sub_id, event_id")
  }

  def fanoutDynamicOracle: String = {
    val branches = subscriptions.map { s =>
      s"SELECT CAST(${s.id} AS BIGINT) AS sub_id, event_id " +
        s"FROM events WHERE event_type = '${s.subsystem}' " +
        s"AND ${FilterOracle.predicateAll(s.filters, "props")}"
    }
    branches.mkString("", " UNION ALL ", " ORDER BY sub_id, event_id")
  }

  /** SSE frames wrapped in HTTP/1.1 chunks; a deterministic subset of
    * events carries no id => id line omitted (evtstrd/events.py:30-31).
    */
  def sseChunks(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val id =
      when(col("event_id") % 5 === 0, lit(null).cast("string"))
        .otherwise(col("event_id").cast("string"))
    events
      .select(
        col("event_id"),
        Sse.chunk(Sse.frame(col("event_type"), col("props"), id)).as("chunk"))
      .orderBy("event_id")
  }

  def sseChunksOracle: String = {
    val idPart =
      s"CASE WHEN event_id % 5 = 0 THEN '' ELSE 'id: ' || CAST(event_id AS VARCHAR) || $crlf END"
    val frame =
      s"('event: ' || event_type || $crlf || 'data: ' || props || $crlf || $idPart || $crlf)"
    s"SELECT event_id, printf('%x', octet_length(CAST($frame AS BLOB))) || $crlf || $frame || $crlf AS chunk " +
      "FROM events ORDER BY event_id"
  }

  /** Wire-envelope validation: events are serialized to the socket
    * JSON-lines format (evtstrd/socket_server.py:102-112), a
    * deterministic subset corrupted (bad JSON) or mis-actioned, then
    * parsed back with permissive corrupt-record handling and validated
    * — bad lines are dropped, never fail the job (evtstrd/util.py:11-21,
    * socket_server.py:88-99). Output: surviving event count per
    * subsystem.
    */
  def envelopeStats(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
    val action =
      when(col("event_id") % 89 === 0, lit("ping")).otherwise(lit("notify"))
    // string-concat, NOT to_json(struct(...)): props must embed as a
    // raw JSON object — a struct STRING field would render it as a
    // quoted/escaped JSON *string*, which the ingest path now rejects
    // by variant type (data must be a dict, socket_server.py:107).
    // event_type is JSON-escaped defensively so a quote/backslash in
    // the data could never silently invalidate lines (and desync the
    // oracle, which counts raw event_type values).
    val subsystemEsc = regexp_replace(
      regexp_replace(col("event_type"), "\\\\", "\\\\\\\\"),
      "\"", "\\\\\"")
    val line = concat(
      lit("{\"action\": \""), action,
      lit("\", \"subsystem\": \""), subsystemEsc,
      lit("\", \"event\": \"add\", \"data\": "), col("props"),
      lit(", \"id\": \""), col("event_id").cast("string"),
      lit("\"}"))
    // valid JSON but data is a number, not an object — the reference
    // rejects non-dict data (evtstrd/socket_server.py:107); subsystem
    // gets the same defensive escaping as the main line
    val scalarDataLine = concat(
      lit("{\"action\": \"notify\", \"subsystem\": \""),
      subsystemEsc,
      lit("\", \"event\": \"add\", \"data\": "),
      col("event_id").cast("string"),
      lit(", \"id\": \""),
      col("event_id").cast("string"),
      lit("\"}"))
    val corrupted =
      when(col("event_id") % 97 === 0, concat(lit("{oops"), line))
        .when(col("event_id") % 101 === 0, scalarDataLine)
        .otherwise(line)
    // runs the actual ingest-path plan (single Generate-guarded parse,
    // validity + data-is-object filters) so its semantics stay
    // oracle-checked. spread (guide §2.5): the serialize + permissive
    // JSON re-parse is per-row heavy and otherwise runs inside the
    // single-row-group events scan — identity at real scale
    graft.streaming.EventStreamPipeline
      .parseLines(
        Tables.spread(spark, events.select(corrupted.as("value"))))
      .groupBy(col("subsystem"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy("subsystem")
  }

  def envelopeStatsOracle: String =
    """SELECT event_type AS subsystem, CAST(count(*) AS BIGINT) AS n_events
      |FROM events WHERE event_id % 89 <> 0 AND event_id % 97 <> 0 AND event_id % 101 <> 0
      |GROUP BY event_type ORDER BY subsystem""".stripMargin

  /** The filter-language semantics gate: a synthesized payload column
    * mixes integer, string-typed-number, date (valid and invalid) and
    * nested shapes; a fixed battery of filters (every comparator, every
    * value type) is counted over it. Spark evaluates the compiled
    * Catalyst predicates; the oracle evaluates [[FilterOracle]]'s
    * generated SQL — any semantic drift between compiler and spec shows
    * up as a count mismatch here.
    */
  val filterBattery: Seq[(String, String)] = Seq(
    "f_int_le" -> "k<=50",
    "f_int_gt" -> "k>49",
    "f_int_eq" -> "k=87",
    "f_str_ge" -> "k>='50'",
    "f_str_lt" -> "k<'5'",
    "f_date_ge" -> "d>=2024-01-15",
    "f_date_eq" -> "d=2024-01-07",
    "f_nested" -> "nested.k<75",
    "f_empty_seg" -> "k.<75", // trailing dot = literal ""-key lookup
    "f_missing" -> "nope=1")

  /** Conjunctions + out-of-int64 literals, the riskiest corners of the
    * semantics: mixed-type conjunctions must collapse to false via
    * strict typing (a key is never both int and string), and huge
    * literals hit the [[graft.filters.FilterCompiler.hugeLiteralMatches]]
    * domain-reasoning branch (every int64 payload is below a huge
    * positive literal / above a huge negative one; equality never
    * holds). Each case is counted on BOTH the native codegen-probe
    * path and the variant path (suffix `_v`), so the oracle pins the
    * two production evaluation strategies independently.
    */
  val conjBattery: Seq[(String, Seq[String])] = Seq(
    "c_int_range" -> Seq("k>=10", "k<90"),
    "c_mixed_types" -> Seq("k>=10", "k<'90'"), // strictness: always 0
    "c_nested_range" -> Seq("nested.k>10", "nested.k<75"),
    "c_huge_conj" -> Seq("k<9223372036854775808", "k>=50"),
    "f_huge_lt" -> Seq("k<9223372036854775808"), // 2^63: any int matches
    "f_huge_gt_neg" -> Seq("k>-9223372036854775809"),
    "f_huge_eq" -> Seq("k=99999999999999999999"), // equality: always 0
    // huge literal reached through a NESTED path: domain reasoning
    // must compose with path extraction, on both eval strategies
    "c_huge_nested" -> Seq("nested.k<9223372036854775808"),
    // date-range conjunction: two strict-ISO date leaves over the same
    // key — the variant path must parse the date ONCE per leaf and
    // agree with the native probes
    "c_date_conj" -> Seq("d>=2024-01-10", "d<2024-01-20"),
    // keys live on DISJOINT payload arms (d-arm rows carry no k and
    // vice versa), so the conjunction is everywhere-false by strict
    // missing-key semantics, never by accident
    "c_cross_key" -> Seq("d>=2024-01-01", "k>=0"))

  def filterLang(spark: SparkSession, dir: String): DataFrame = {
    // spread (guide §2.5): ~80 JSON-path predicates evaluate per row
    // in the scan stage — the heaviest per-row map work in the suite
    val ev = Tables.spread(spark, Tables.events(spark, dir))
    val kv = get_json_object(col("props"), "$.k")
    val payload = when(col("event_id") % 4 === 0, col("props"))
      .when(col("event_id") % 4 === 1, concat(lit("{\"k\": \""), kv, lit("\"}")))
      .when(
        col("event_id") % 4 === 2,
        when(col("event_id") % 11 === 0, lit("{\"d\": \"2024-02-30\"}"))
          .otherwise(
            concat(
              lit("{\"d\": \"2024-01-"),
              lpad((lit(1) + col("event_id") % 31).cast("string"), 2, "0"),
              lit("\"}"))))
      // arm 3 also carries an empty-string key under "k": existing
      // int/string filters on "k" see an OBJECT (type mismatch =>
      // false, same as the previous missing-"k"), while the
      // trailing-dot filter resolves it
      .otherwise(concat(
        lit("{\"nested\": {\"k\": "), kv,
        lit("}, \"k\": {\"\": "), kv, lit("}}")))
    // every single-filter case ALSO counts on the variant path
    // (suffix `_v`): string/date/nested/empty-segment/missing-key
    // semantics are pinned for both production evaluation strategies,
    // not just the conjunction battery
    val aggCols = filterBattery.flatMap { case (name, f) =>
      Seq(
        sum(
          graft.filters.FilterCompiler
            .compile(graft.filters.FilterParser.parse(f), col("payload"))
            .cast("long")).as(name),
        sum(
          coalesce(
            graft.filters.FilterCompiler.compileAllOnVariant(Seq(f), col("pv")),
            lit(false))
            .cast("long")).as(s"${name}_v"))
    } ++ conjBattery.flatMap { case (name, fs) =>
      Seq(
        sum(
          graft.filters.FilterCompiler
            .compileAll(fs, col("payload"))
            .cast("long")).as(name),
        sum(
          coalesce(
            graft.filters.FilterCompiler.compileAllOnVariant(fs, col("pv")),
            lit(false))
            .cast("long")).as(s"${name}_v"))
    }
    ev.select(col("event_id"), payload.as("payload"))
      // Generate barrier: the variant parses once per row; inlining
      // try_parse_json into every try_variant_get reference would cost
      // one parse per predicate leaf
      .select(col("payload"), explode(array(try_parse_json(col("payload")))).as("pv"))
      .agg(aggCols.head, aggCols.tail: _*)
  }

  def filterLangOracle: String = {
    val payload =
      """CASE
        | WHEN event_id % 4 = 0 THEN props
        | WHEN event_id % 4 = 1 THEN '{"k": "' || (props->>'$.k') || '"}'
        | WHEN event_id % 4 = 2 THEN (CASE WHEN event_id % 11 = 0 THEN '{"d": "2024-02-30"}'
        |   ELSE '{"d": "2024-01-' || lpad(CAST(1 + event_id % 31 AS VARCHAR), 2, '0') || '"}' END)
        | ELSE '{"nested": {"k": ' || (props->>'$.k') || '}, "k": {"": ' || (props->>'$.k') || '}}' END""".stripMargin
    val aggs = filterBattery.flatMap { case (name, f) =>
      val p = FilterOracle.predicate(f, "payload")
      Seq(
        s"CAST(SUM(CASE WHEN $p THEN 1 ELSE 0 END) AS BIGINT) AS $name",
        s"CAST(SUM(CASE WHEN $p THEN 1 ELSE 0 END) AS BIGINT) AS ${name}_v")
    } ++ conjBattery.flatMap { case (name, fs) =>
      val pred = FilterOracle.predicateAll(fs, "payload")
      Seq(
        s"CAST(SUM(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS $name",
        s"CAST(SUM(CASE WHEN $pred THEN 1 ELSE 0 END) AS BIGINT) AS ${name}_v")
    }
    s"WITH p AS (SELECT $payload AS payload FROM events)\n" +
      s"SELECT ${aggs.mkString(",\n  ")} FROM p"
  }

  /** Stats aggregation over the fan-out result (evtstrd/stats.py:34-50
    * shape): per-subscription delivery counters plus a JSON projection
    * built with engine-portable string concat.
    */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    val fo = fanout(spark, dir)
    fo.groupBy(col("sub_id"))
      .agg(
        count(lit(1)).as("n_delivered"),
        min(col("event_id")).as("first_event"),
        max(col("event_id")).as("last_event"))
      .select(
        col("sub_id"), col("n_delivered"), col("first_event"),
        col("last_event"),
        concat(
          lit("{\"subscription\": "), col("sub_id"),
          lit(", \"delivered\": "), col("n_delivered"), lit("}")).as("stats_json"))
      .orderBy("sub_id")
  }

  def statsAggOracle: String = {
    val branches = subscriptions.map { s =>
      s"SELECT CAST(${s.id} AS BIGINT) AS sub_id, event_id " +
        s"FROM events WHERE event_type = '${s.subsystem}' " +
        s"AND ${FilterOracle.predicateAll(s.filters, "props")}"
    }
    s"""WITH fo AS (${branches.mkString(" UNION ALL ")})
       |SELECT sub_id, CAST(COUNT(*) AS BIGINT) AS n_delivered,
       |  MIN(event_id) AS first_event, MAX(event_id) AS last_event,
       |  '{"subscription": ' || sub_id || ', "delivered": ' || COUNT(*) || '}' AS stats_json
       |FROM fo GROUP BY sub_id ORDER BY sub_id""".stripMargin
  }

  /** Strict dual-format ISO date parsing (evtstrd/date.py:4-16) over
    * strings derived from order dates: dashed, compact, and invalid
    * calendar forms; unparseable => null, job never fails.
    */
  def dateParse(spark: SparkSession, dir: String): DataFrame = {
    // spread: rlike + two regexp_replace + strict re-parse per row
    // otherwise run inside the single-row-group orders scan
    val ord = Tables.spread(spark, Tables.read(spark, dir, "orders"))
    val dashed = date_format(col("o_orderdate"), "yyyy-MM-dd")
    val dateStr = when(col("o_orderkey") % 13 === 0, lit("2020-13-40"))
      .when(col("o_orderkey") % 3 === 0, regexp_replace(dashed, "-", ""))
      .otherwise(dashed)
    val parsed = when(
      dateStr.rlike("^\\d{4}-?\\d{2}-?\\d{2}$"),
      call_function(
        "try_to_date", regexp_replace(dateStr, "-", ""), lit("yyyyMMdd")))
    ord.select(col("o_orderkey"), dateStr.as("date_str"), parsed.as("parsed"))
      .orderBy("o_orderkey")
  }

  def dateParseOracle: String =
    """WITH d AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 13 = 0 THEN '2020-13-40'
      |      WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%Y%m%d')
      |      ELSE strftime(o_orderdate, '%Y-%m-%d') END AS date_str
      |  FROM orders)
      |SELECT o_orderkey, date_str,
      |  CASE WHEN regexp_matches(date_str, '^\d{4}-?\d{2}-?\d{2}$')
      |    THEN CAST(try_strptime(regexp_replace(date_str, '-', '', 'g'), '%Y%m%d') AS DATE)
      |  END AS parsed
      |FROM d ORDER BY o_orderkey""".stripMargin

  /** JSON connector round trip: serialize events to JSON lines
    * (the wire format) and read them back through the `json` data
    * source with an explicit schema, then aggregate — exercising the
    * json reader the streaming path's dev-mode uses.
    */
  def jsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val jsonLines =
      Tables.events(spark, dir).select(col("event_id"), col("event_type"), col("value")).toJSON
    spark.read.schema(schema).json(jsonLines)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total"))
      .orderBy("event_type")
  }

  def jsonRoundtripOracle: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** CSV connector round trip: serialize a projection to CSV text and
    * parse it back with `from_csv` + explicit schema.
    */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val line = concat_ws(",", col("event_id"), col("event_type"))
    val schema = "event_id BIGINT, event_type STRING"
    Tables.events(spark, dir)
      .select(line.as("line"))
      .select(inline(array(from_csv(
        col("line"),
        org.apache.spark.sql.types.StructType.fromDDL(schema),
        Map.empty[String, String]))))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        max(col("event_id")).as("max_id"))
      .orderBy("event_type")
  }

  def csvRoundtripOracle: String =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) n, MAX(event_id) max_id
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** `gen_source_agg`: the custom batch DataSourceV2
    * ([[graft.sources.GraftGenSource]]) under the ORACLE gate — a
    * filtered aggregate over the generated table, with the id-range
    * predicate pushed INTO the V2 scan (the ScanBuilder narrows the
    * generated range — GraftGenSourceSpec pins delivery) and DuckDB
    * replaying the same closed-form columns from `range()`. A custom
    * connector whose pushdown mangles boundary arithmetic (the
    * off-by-one in >= vs > is the classic) hash-mismatches here.
    */
  def genSourceAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.GraftGenSource")
      .option("rows", "100000").option("slices", "8").load()
      .where(col("id") >= 2500 && col("id") < 97500)
      .groupBy(col("tag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value")).as("sum_value"),
        sum(col("bucket")).as("sum_bucket"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      .orderBy("tag")

  def genSourceAggOracle: String =
    """WITH g AS (
      |  SELECT i AS id, i % 97 AS bucket,
      |    (i * 2654435761) % 1000000 AS v,
      |    'T' || CAST(i % 10 AS VARCHAR) AS tag
      |  FROM range(2500, 97500) t(i))
      |SELECT tag, CAST(count(*) AS BIGINT) n,
      |  CAST(sum(v) AS BIGINT) sum_value,
      |  CAST(sum(bucket) AS BIGINT) sum_bucket,
      |  CAST(min(id) AS BIGINT) min_id, CAST(max(id) AS BIGINT) max_id
      |FROM g GROUP BY tag ORDER BY tag""".stripMargin

  /** `gen_source_pushagg`: DataSourceV2 AGGREGATE pushdown
    * (`SupportsPushDownAggregates`, partial mode) made observable —
    * the same V2 table as [[genSourceAgg]], but grouped by `bucket`
    * so the connector ACCEPTS the aggregation: each of the 8 splits
    * folds its generated id range locally and ships ≤ 97 partial
    * rows (count/min/max/sum per bucket) instead of 95k raw rows;
    * Spark plans only the final merge. This is the row-group-
    * statistics contract a real warehouse connector implements —
    * at 100 TB the difference between a scan-shaped and a
    * metadata-shaped GROUP BY. GraftGenSourceSpec pins that the
    * pushdown actually ENGAGED (lastAggPushed set, raw-scan schema
    * untouched) and that filter pushdown composes with it (the
    * pushed id range still narrows first).
    */
  def genSourcePushAgg(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("graft.sources.GraftGenSource")
      .option("rows", "200000").option("slices", "8").load()
      .where(col("id") >= 50000 && col("id") < 150000)
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"),
        sum(col("value")).as("sum_value"))
      .orderBy("bucket")

  def genSourcePushAggOracle: String =
    """WITH g AS (
      |  SELECT i AS id, i % 97 AS bucket,
      |    (i * 2654435761) % 1000000 AS v
      |  FROM range(50000, 150000) t(i))
      |SELECT bucket, CAST(count(*) AS BIGINT) n,
      |  CAST(min(id) AS BIGINT) min_id, CAST(max(id) AS BIGINT) max_id,
      |  CAST(sum(v) AS BIGINT) sum_value
      |FROM g GROUP BY bucket ORDER BY bucket""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("gen_source_agg", genSourceAgg, Some(genSourceAggOracle)),
    QueryDef(
      "gen_source_pushagg", genSourcePushAgg, Some(genSourcePushAggOracle)),
    QueryDef("csv_roundtrip", csvRoundtrip, Some(csvRoundtripOracle)),
    QueryDef("json_roundtrip", jsonRoundtrip, Some(jsonRoundtripOracle)),
    QueryDef("fanout", fanout, Some(fanoutOracle)),
    QueryDef("fanout_dynamic", fanoutDynamic, Some(fanoutDynamicOracle)),
    QueryDef("sse_chunks", sseChunks, Some(sseChunksOracle)),
    QueryDef("envelope_stats", envelopeStats, Some(envelopeStatsOracle)),
    QueryDef("filter_lang", filterLang, Some(filterLangOracle)),
    QueryDef("stats_agg", statsAgg, Some(statsAggOracle)),
    QueryDef("date_parse", dateParse, Some(dateParseOracle)))
}
