package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Training-data pipeline operators past the dedup/similarity core:
  * eval-set decontamination (cross-split n-gram overlap), stratified
  * reproducible sampling (per-class rates), and sequence-length
  * bucketing for batch packing. All reproducible by content hash —
  * never `rand()` — so results are identical across engines, runs,
  * partitionings and cluster sizes.
  */
object TrainingPipeline {

  /** Content-hash split (the [[ContentHash]] rule `train_split` also
    * uses): buckets 0-7 train, 8-9 eval.
    */
  private def isTrain(idCol: org.apache.spark.sql.Column) =
    ContentHash.bucket(idCol, 10) < 8

  private val IsTrainSql = s"${ContentHash.bucketSql("doc_id", 10)} < 8"

  /** Decontamination: for each EVAL document, the train document
    * sharing the most 3-gram shingles with it (reported when >= 3
    * shared — the standard "n-gram collision" leakage check run
    * before training on any corpus that might contain the eval set).
    *
    * Scale shape: shingle sides reuse the shared persisted doc-array
    * relation; the overlap join is a posting-list equi-join on
    * shingle (never doc x doc), partial+final counted on
    * (eval_doc, train_doc); the top-1 window partitions by eval_doc
    * (high cardinality, even spread). Eval is ~20% of docs, so the
    * join's build side is the smaller shingle stream.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val sh = Dedup.shingles(spark, dir)
      .withColumn("is_train", isTrain(col("doc_id")))
    val trainSh = sh.where(col("is_train"))
      .select(col("shingle"), col("doc_id").as("train_doc"))
    val evalSh = sh.where(!col("is_train"))
      .select(col("shingle"), col("doc_id").as("eval_doc"))
    val overlap = evalSh.join(trainSh, "shingle")
      .groupBy(col("eval_doc"), col("train_doc"))
      .agg(count(lit(1)).as("shared"))
    val w = Window.partitionBy(col("eval_doc"))
      .orderBy(col("shared").desc, col("train_doc"))
    overlap
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") === 1 && col("shared") >= 3)
      .select(
        col("eval_doc"),
        col("train_doc").as("worst_train_doc"),
        col("shared").as("shared_ngrams"))
      .orderBy("eval_doc")
  }

  def decontaminateOracle: String =
    s"""WITH ${Dedup.ShinglesSql},
       |lab AS (SELECT doc_id, $IsTrainSql AS is_train FROM documents),
       |tr AS (SELECT s.shingle, s.doc_id train_doc FROM sh s JOIN lab USING (doc_id) WHERE is_train),
       |ev AS (SELECT s.shingle, s.doc_id eval_doc FROM sh s JOIN lab USING (doc_id) WHERE NOT is_train),
       |ov AS (
       |  SELECT eval_doc, train_doc, CAST(count(*) AS BIGINT) shared
       |  FROM ev JOIN tr USING (shingle) GROUP BY 1, 2),
       |rk AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY eval_doc ORDER BY shared DESC, train_doc) rnk
       |  FROM ov)
       |SELECT eval_doc, train_doc AS worst_train_doc, shared AS shared_ngrams
       |FROM rk WHERE rnk = 1 AND shared >= 3 ORDER BY eval_doc""".stripMargin

  /** Stratified sampling with per-class rates (class rebalancing:
    * downsample the over-represented event types hard, keep the rare
    * ones) — the hash-gate makes it a pushdown-able narrow filter, so
    * at 100 TB the sample never materializes the unsampled rows past
    * the scan.
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val gate = ContentHash.bucket(col("event_id"), 100)
    val rate = when(col("event_type") === "view", 2)
      .when(col("event_type") === "click", 10)
      .otherwise(50)
    Tables.events(spark, dir)
      .where(gate < rate)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_sampled"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
      .orderBy("event_type")
  }

  def stratifiedSampleOracle: String =
    s"""SELECT event_type, CAST(COUNT(*) AS BIGINT) n_sampled,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) total_value
       |FROM events
       |WHERE ${ContentHash.bucketSql("event_id", 100)} <
       |  CASE event_type WHEN 'view' THEN 2 WHEN 'click' THEN 10 ELSE 50 END
       |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Sequence-length bucketing for batch packing: documents binned to
    * power-of-2 token-count buckets; per bucket the doc count, token
    * total, and packing efficiency (fraction of a bucket-width-padded
    * batch that is real tokens — the number a packing scheduler
    * optimizes). Narrow per-row work + one tiny aggregation.
    */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame = {
    val toks = size(filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
      .cast("long")
    Tables.read(spark, dir, "documents")
      .select(toks.as("n_tokens"))
      .where(col("n_tokens") > 0)
      // bucket cap = next power of two >= n_tokens. Integer-exact via
      // the binary bit width of (n-1) — a float log2/power formula can
      // flip a bucket at exact powers of two if the engines' log
      // implementations differ by an ulp
      .withColumn(
        "bucket_cap",
        when(col("n_tokens") === 1, lit(1L))
          .otherwise(
            call_function(
              "shiftleft", lit(1L), length(bin(col("n_tokens") - 1)).cast("int"))
              .cast("long")))
      .groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("total_tokens"))
      .withColumn(
        "packing_efficiency",
        col("total_tokens").cast("double") / (col("n_docs") * col("bucket_cap")))
      .orderBy("bucket_cap")
  }

  def lengthBucketsOracle: String =
    """WITH t AS (
      |  SELECT CAST(len(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS BIGINT) n_tokens
      |  FROM documents),
      |b AS (
      |  SELECT n_tokens,
      |    CASE WHEN n_tokens = 1 THEN 1
      |      ELSE 1::BIGINT << length(bin(n_tokens - 1)) END AS bucket_cap
      |  FROM t WHERE n_tokens > 0)
      |SELECT bucket_cap, CAST(COUNT(*) AS BIGINT) n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) total_tokens,
      |  CAST(SUM(n_tokens) AS DOUBLE) / (COUNT(*) * bucket_cap) packing_efficiency
      |FROM b GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin

  /** Concat-and-chunk sequence packing (the LLM-pretraining layout:
    * token streams concatenated per shard, then split every
    * `PackBudget` tokens): per shard, the pack count and how many
    * documents straddle a pack boundary (the cross-attention-
    * contamination metric a packing run reports). Documents land in
    * shards by content hash, packs fill in doc_id order.
    *
    * Scale shape: THE distributed prefix-sum. A single global running
    * sum would be an unpartitioned window (the scale-killer removed
    * from ntile); sharding makes it a per-shard window after ONE hash
    * shuffle, each shard sorting only its own slice — shard count is
    * the parallelism knob (32 here, thousands at 100 TB; real packing
    * runs are per output shard/file anyway). All arithmetic is exact
    * integer division on token offsets.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val toks = size(filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
      .cast("long")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.read(spark, dir, "documents")
      .select(col("doc_id"), toks.as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("shard", ContentHash.bucket(col("doc_id"), 32))
      .withColumn("start_tok", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("first_pack", expr(s"start_tok div $PackBudget"))
      .withColumn(
        "last_pack", expr(s"(start_tok + n_tokens - 1) div $PackBudget"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (max(col("last_pack")) + 1L).as("n_packs"),
        sum((col("first_pack") =!= col("last_pack")).cast("long"))
          .as("n_straddling"))
      .orderBy("shard")
  }

  private val PackBudget = 2048L

  def packSequencesOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) n_tokens
       |  FROM documents),
       |sharded AS (
       |  SELECT doc_id, n_tokens, ${ContentHash.bucketSql("doc_id", 32)} shard
       |  FROM t WHERE n_tokens > 0),
       |placed AS (
       |  SELECT shard, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) start_tok
       |  FROM sharded)
       |SELECT shard, CAST(COUNT(*) AS BIGINT) n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) total_tokens,
       |  CAST(MAX((start_tok + n_tokens - 1) // $PackBudget) + 1 AS BIGINT) n_packs,
       |  CAST(SUM(CASE WHEN start_tok // $PackBudget
       |    <> (start_tok + n_tokens - 1) // $PackBudget THEN 1 ELSE 0 END) AS BIGINT) n_straddling
       |FROM placed GROUP BY shard ORDER BY shard""".stripMargin

  /** The C4-style cleaning funnel, composed from the suite's own
    * pieces: length gate -> quality-score gate (the text_quality
    * formula) -> near-dup removal via the PRODUCTION dedup path (the
    * MinHash+LSH pipeline's verified jacc >= 0.5 pairs; the larger
    * doc_id of each pair loses). One funnel row: survivors at each
    * stage plus the kept token mass — the report a corpus-prep run
    * publishes before training.
    *
    * Scale shape: the gates are narrow per-row work; the loser list
    * is the LSH dedup output (bounded band buckets, never all-pairs —
    * the ngram_jaccard exhaustive baseline exists separately for
    * exactness), joined back as an explicitly broadcast keep-list.
    */
  def corpusClean(spark: SparkSession, dir: String): DataFrame = {
    val toksCol = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    val docs = Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("text"), explode(array(toksCol)).as("t"))
    val stopArr = array(Seq("the", "a", "and", "of", "to", "in").map(lit): _*)
    val nTok = size(col("t")).cast("long")
    val nChars = length(col("text")).cast("long")
    val nPunct = (length(col("text")) -
      length(regexp_replace(col("text"), "[.,;:!?]", ""))).cast("long")
    val nStop = size(filter(col("t"), x => array_contains(stopArr, x))).cast("long")
    val score = when(nTok === 0 || nChars === 0, lit(0.0)).otherwise(
      nStop.cast("double") / nTok +
        nPunct.cast("double") / nChars +
        least(nTok.cast("double") / 100.0, lit(1.0)))
    val scored = docs.select(col("doc_id"), nTok.as("n_tokens"), score.as("score"))
    val losers = Dedup.minhashLsh(spark, dir)
      .select(col("b").as("doc_id"))
      .distinct()
      .withColumn("is_loser", lit(true))
    scored
      .join(broadcast(losers), Seq("doc_id"), "left")
      .withColumn("len_ok", col("n_tokens") >= 20)
      .withColumn("q_ok", col("len_ok") && col("score") >= 0.35)
      .withColumn("kept", col("q_ok") && col("is_loser").isNull)
      .agg(
        count(lit(1)).as("n_total"),
        sum(col("len_ok").cast("long")).as("n_len_ok"),
        sum(col("q_ok").cast("long")).as("n_quality_ok"),
        sum(col("kept").cast("long")).as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(lit(0L)))
          .as("kept_tokens"))
  }

  def corpusCleanOracle: String =
    s"""WITH ${Dedup.ShinglesSql},
       |${Dedup.MinhashPairsCtes},
       |losers AS (SELECT DISTINCT b AS doc_id FROM lshpairs),
       |q AS (SELECT doc_id,
       |  CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) AS BIGINT) n_tokens,
       |  CAST(length(text) AS BIGINT) n_chars,
       |  CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS BIGINT) n_punct,
       |  CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> list_contains(['the','a','and','of','to','in'], x))) AS BIGINT) n_stop
       | FROM documents),
       |s AS (SELECT doc_id, n_tokens,
       |  CASE WHEN n_tokens = 0 OR n_chars = 0 THEN 0.0
       |    ELSE CAST(n_stop AS DOUBLE) / n_tokens + CAST(n_punct AS DOUBLE) / n_chars
       |      + least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) END AS score
       | FROM q),
       |f AS (SELECT s.doc_id, n_tokens,
       |  (n_tokens >= 20) len_ok,
       |  (n_tokens >= 20 AND score >= 0.35) q_ok,
       |  (n_tokens >= 20 AND score >= 0.35 AND l.doc_id IS NULL) kept
       | FROM s LEFT JOIN losers l ON s.doc_id = l.doc_id)
       |SELECT CAST(COUNT(*) AS BIGINT) n_total,
       |  CAST(SUM(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT) n_len_ok,
       |  CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) n_quality_ok,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) n_kept,
       |  CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT) kept_tokens
       |FROM f""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("decontaminate", decontaminate, Some(decontaminateOracle)),
    QueryDef("stratified_sample", stratifiedSample, Some(stratifiedSampleOracle)),
    QueryDef("length_buckets", lengthBuckets, Some(lengthBucketsOracle)),
    QueryDef("pack_sequences", packSequences, Some(packSequencesOracle)),
    QueryDef("corpus_clean", corpusClean, Some(corpusCleanOracle)))
}
