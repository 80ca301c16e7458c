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
    // The eval ⋈ train posting join IS the session-shared all-pairs
    // expansion restricted to split-crossing pairs (round 12, the
    // rankScores argument): `inter` counts the same shared distinct
    // shingles the join counted, the relation is a < b exhaustive, and
    // is_train is pure doc_id arithmetic — so orienting each crossing
    // pair (train side, eval side) reproduces the overlap rows exactly
    // without re-running the posting expansion per invocation.
    val overlap = Dedup.allPairsShared(spark, dir)
      .select(
        col("a"), col("b"), col("inter"),
        isTrain(col("a")).as("ta"), isTrain(col("b")).as("tb"))
      .where(col("ta") =!= col("tb"))
      .select(
        when(col("ta"), col("b")).otherwise(col("a")).as("eval_doc"),
        when(col("ta"), col("a")).otherwise(col("b")).as("train_doc"),
        col("inter").as("shared"))
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
    val losers = Dedup.minhashLshShared(spark, dir)
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

  /** Domain-mixing weights: per source, doc and token totals plus the
    * up/down-sampling weight (in parts-per-million) that would flatten
    * the corpus to a uniform token budget per source —
    * `weight_ppm = total_tokens · 10⁶ ÷ (n_sources · source_tokens)`,
    * all in int64 so both engines agree exactly. The real mixing
    * recipe multiplies these by target proportions; the uniform
    * target keeps the oracle closed-form.
    *
    * Scale shape: one narrow scan + a 20-row hash aggregate; the
    * corpus totals come back via a single-row broadcast cross join
    * (BroadcastNestedLoopJoin over one row — no expansion, no
    * shuffle).
    */
  def domainMix(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(filter(split(col("text"), "\\s+"), x => x =!= ""))
      .cast("long")
    val perSrc = Tables.read(spark, dir, "documents")
      .select(col("source"), nTok.as("n_tok"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("src_tokens"))
    val totals = perSrc.agg(
      sum(col("src_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_sources"))
    perSrc.crossJoin(broadcast(totals))
      .select(
        col("source"),
        col("n_docs"),
        col("src_tokens"),
        call_function(
          "div",
          col("tot_tokens") * lit(1000000L),
          col("n_sources") * col("src_tokens")).as("weight_ppm"))
      .orderBy("source")
  }

  def domainMixOracle: String =
    s"""WITH t AS (
       |  SELECT source,
       |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) n_tok
       |  FROM documents),
       |s AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) src_tokens
       |  FROM t GROUP BY source),
       |tot AS (
       |  SELECT CAST(SUM(src_tokens) AS BIGINT) tot_tokens,
       |    CAST(COUNT(*) AS BIGINT) n_sources FROM s)
       |SELECT source, n_docs, src_tokens,
       |  CAST(tot_tokens * 1000000 // (n_sources * src_tokens) AS BIGINT) weight_ppm
       |FROM s, tot ORDER BY source""".stripMargin

  /** `mix_allocate`: the allocation step [[domainMix]] stops short
    * of — apportion a FIXED token budget (10⁶ tokens) across sources
    * proportionally to their token mass, with quotas that are
    * integers AND sum to the budget EXACTLY. Plain floor division
    * under-allocates by up to n_sources−1; largest-remainder
    * (Hamilton) apportionment fixes it deterministically: every
    * source gets `floor(B·srcᵢ/T)`, and the B − Σfloor leftover goes
    * one token each to the sources with the largest remainders
    * (source-name tie-break). This is what a real mixture recipe
    * ships to the sampler — "2.3× upweight" is a weight, a quota is a
    * CONTRACT. `Σ quota = B` is asserted in Wave10Spec.
    *
    * Plan shape: one scan + 20-row source aggregate; totals and the
    * floor-sum deficit return as 1-row broadcasts; the remainder
    * RANK is a triangular broadcast self-join over the source
    * relation (the ntile cumulative-rank trick) — no window, nothing
    * bigger than |sources|² ever materializes. Overflow bound:
    * `src_tokens · 10⁶` must fit int64 ⇒ valid to ~9·10¹² tokens per
    * source; past that, pre-scale T and srcᵢ by a common power of two
    * (the ratio, hence the apportionment, is invariant).
    */
  def mixAllocate(spark: SparkSession, dir: String): DataFrame = {
    val B = 1000000L
    val nTok = size(filter(split(col("text"), "\\s+"), x => x =!= ""))
      .cast("long")
    val perSrc = Tables.read(spark, dir, "documents")
      .select(col("source"), nTok.as("n_tok"))
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("src_tokens"))
    val tot = perSrc.agg(sum(col("src_tokens")).as("t"))
    val base = perSrc.crossJoin(broadcast(tot))
      .select(
        col("source"), col("src_tokens"),
        expr(s"src_tokens * ${B}L div t").as("floor_q"),
        expr(s"(src_tokens * ${B}L) % t").as("rem"))
      .localCheckpoint(eager = false) // rank join + deficit below
    val deficit = base.agg((lit(B) - sum(col("floor_q"))).as("d"))
    val rhs = broadcast(
      base.select(col("rem").as("rem2"), col("source").as("s2")))
    base
      .join(
        rhs,
        col("rem2") > col("rem") ||
          (col("rem2") === col("rem") && col("s2") < col("source")),
        "left")
      .groupBy(col("source"), col("src_tokens"), col("floor_q"), col("rem"))
      .agg(count(col("s2")).as("n_above"))
      .crossJoin(broadcast(deficit))
      .select(
        col("source"), col("src_tokens"), col("floor_q"), col("rem"),
        when(col("n_above") < col("d"), lit(1L)).otherwise(lit(0L))
          .as("extra"))
      .withColumn("quota", col("floor_q") + col("extra"))
      .orderBy("source")
  }

  def mixAllocateOracle: String =
    s"""WITH t AS (
       |  SELECT source,
       |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS BIGINT) n_tok
       |  FROM documents),
       |s AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) src_tokens
       |  FROM t GROUP BY source),
       |tot AS (SELECT CAST(SUM(src_tokens) AS BIGINT) t FROM s),
       |base AS (SELECT source, src_tokens,
       |    src_tokens * 1000000 // t floor_q,
       |    (src_tokens * 1000000) % t rem
       |  FROM s, tot),
       |d AS (SELECT 1000000 - CAST(SUM(floor_q) AS BIGINT) d FROM base),
       |r AS (SELECT *, CAST(row_number() OVER (
       |    ORDER BY rem DESC, source) AS BIGINT) rk FROM base)
       |SELECT source, src_tokens, floor_q, rem,
       |  CAST(CASE WHEN rk <= d THEN 1 ELSE 0 END AS BIGINT) extra,
       |  floor_q + CAST(CASE WHEN rk <= d THEN 1 ELSE 0 END AS BIGINT) quota
       |FROM r, d ORDER BY source""".stripMargin

  /** `curation_funnel`: the END-TO-END curation pipeline as ONE
    * declarative query — the funnel every training-data run reports:
    * raw → quality gate (≥30 tokens AND token-collision ≤ 10%, the
    * `collision_entropy` statistic as a FILTER) → exact dedup
    * (min-doc_id keeper per md5) → near-dup dedup (min surviving
    * member per converged CC cluster), with per-source survivor
    * counts at every stage and the token mass that remains. Stages
    * compose on SURVIVORS (a doc cut by quality can't shield its
    * duplicate), which is why this is a funnel and not four
    * independent counts.
    *
    * Plan shape: per-doc token stats are the `collision_entropy`
    * explode + two doc-co-partitioned aggregates; every later move is
    * doc-grain or smaller — hash-keeper and cluster-keeper are
    * (hash)/(cluster) aggregates joined back on their own keys, the
    * near-dup labels are the session-shared converged CC table
    * ([[Dedup.ccLabelsShared]], one fixpoint per session), and the
    * final per-source rollup is a 20-row aggregate with conditional
    * sums. At 100 TB nothing in the funnel shuffles more than
    * doc-grain rows, and the quality cut prunes BEFORE both dedup
    * joins — filter-first is the economics of every real pipeline.
    */
  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val toksL = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    // spread (guide §2.5): the tokenize + explode otherwise runs in
    // the single-row-group documents scan — identity at real scale
    val ds = Tables.spread(spark, Tables.read(spark, dir, "documents"))
      .select(col("doc_id"), explode(toksL).as("tk"))
      .groupBy(col("doc_id"), col("tk"))
      .agg(count(lit(1)).as("cg"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cg")).as("n_tok"), sum(col("cg") * col("cg")).as("ss"))
      .select(
        col("doc_id"), col("n_tok"),
        expr("(ss * 1000000 div n_tok) div n_tok").as("cp"))
    val base = Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      .join(ds, Seq("doc_id"), "left")
      .select(
        col("doc_id"), col("source"), col("h"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("cp"), lit(1000000L)).as("cp"))
      .withColumn("q", col("n_tok") >= 30 && col("cp") <= 100000)
      .localCheckpoint(eager = false) // keeper agg + final rollup
    val exactKeeper = base.where(col("q"))
      .groupBy(col("h")).agg(min(col("doc_id")).as("ek"))
    val withE = base
      .join(exactKeeper, Seq("h"), "left")
      .withColumn("e", col("q") && col("doc_id") === col("ek"))
      .localCheckpoint(eager = false) // cluster stage + final rollup
    val cl = withE.where(col("e"))
      .select(col("doc_id"))
      .join(
        Dedup.ccLabelsShared(spark, dir)
          .withColumnRenamed("doc", "doc_id"),
        Seq("doc_id"), "left")
      .select(
        col("doc_id"), coalesce(col("root"), col("doc_id")).as("ck"))
    val nearKeeper = cl.groupBy(col("ck")).agg(min(col("doc_id")).as("nk"))
    val s3 = cl.join(nearKeeper, Seq("ck"))
      .where(col("doc_id") === col("nk"))
      .select(col("doc_id"), lit(true).as("nr"))
    withE
      .join(s3, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_raw"),
        sum(when(col("q"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("e"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("nr").isNotNull, 1L).otherwise(0L)).as("n_near"),
        sum(when(col("nr").isNotNull, col("n_tok")).otherwise(0L))
          .as("tokens_kept"))
      .orderBy("source")
  }

  def curationFunnelOracle: String =
    s"""WITH RECURSIVE ${Dedup.ShinglesSql},
       |${Dedup.MinhashPairsCtes},
       |ed AS (SELECT a src, b dst FROM lshpairs
       |       UNION SELECT b, a FROM lshpairs),
       |reach AS (
       |  SELECT src AS doc, dst AS r FROM ed
       |  UNION
       |  SELECT reach.doc, ed.dst FROM reach JOIN ed ON reach.r = ed.src),
       |comp AS (
       |  SELECT doc, least(doc, MIN(r)) AS root FROM reach GROUP BY doc),
       |tkn AS (SELECT doc_id,
       |    unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
       |      x -> x <> '')) tk
       |  FROM documents),
       |gc AS (SELECT doc_id, tk, CAST(count(*) AS BIGINT) cg
       |  FROM tkn GROUP BY 1, 2),
       |dstat AS (SELECT doc_id, CAST(SUM(cg) AS BIGINT) n_tok,
       |    (CAST(SUM(cg * cg) AS BIGINT) * 1000000 // SUM(cg)) // SUM(cg) cp
       |  FROM gc GROUP BY 1),
       |base AS (SELECT d.doc_id, d.source, md5(d.text) h,
       |    COALESCE(ds.n_tok, 0) n_tok, COALESCE(ds.cp, 1000000) cp,
       |    (COALESCE(ds.n_tok, 0) >= 30 AND COALESCE(ds.cp, 1000000)
       |      <= 100000) q
       |  FROM documents d LEFT JOIN dstat ds ON d.doc_id = ds.doc_id),
       |exk AS (SELECT h, MIN(doc_id) ek FROM base WHERE q GROUP BY h),
       |withe AS (SELECT b.*, (b.q AND b.doc_id = exk.ek) e
       |  FROM base b LEFT JOIN exk ON b.h = exk.h),
       |cl AS (SELECT w.doc_id, COALESCE(comp.root, w.doc_id) ck
       |  FROM withe w LEFT JOIN comp ON w.doc_id = comp.doc
       |  WHERE w.e),
       |nk AS (SELECT ck, MIN(doc_id) nk FROM cl GROUP BY ck),
       |s3 AS (SELECT cl.doc_id FROM cl JOIN nk
       |  ON cl.ck = nk.ck AND cl.doc_id = nk.nk)
       |SELECT w.source,
       |  CAST(count(*) AS BIGINT) n_raw,
       |  CAST(SUM(CASE WHEN w.q THEN 1 ELSE 0 END) AS BIGINT) n_quality,
       |  CAST(SUM(CASE WHEN w.e THEN 1 ELSE 0 END) AS BIGINT) n_exact,
       |  CAST(SUM(CASE WHEN s3.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) n_near,
       |  CAST(SUM(CASE WHEN s3.doc_id IS NOT NULL THEN w.n_tok ELSE 0 END)
       |    AS BIGINT) tokens_kept
       |FROM withe w LEFT JOIN s3 ON w.doc_id = s3.doc_id
       |GROUP BY w.source ORDER BY w.source""".stripMargin

  /** PII scrubbing: redact phone-shaped `NN-NNN-NNN-NNNN` numbers and
    * then any remaining ≥5-digit ID runs from a free-text column,
    * reporting the redacted text plus exact per-kind match counts.
    * Counting n_id AFTER the phone redaction keeps the two counters
    * disjoint (phone digits never double-count as IDs) — the order is
    * part of the contract. The synthetic tables carry no phone
    * column, so the input line is derived deterministically from the
    * customer key (same integer construction on both engines); the
    * operator under test is the scrub projection, not the synthesis.
    *
    * Scale shape: pure per-row regex projection — one scan, zero
    * shuffles, fully codegen'd (`regexp_replace`/`regexp_count` are
    * built-ins on both engines; patterns stay in the RE2 ∩ Java
    * dialect: character classes and bounded quantifiers only).
    */
  def piiScrub(spark: SparkSession, dir: String): DataFrame = {
    val phonePat = "\\d{2}-\\d{3}-\\d{3}-\\d{4}"
    val idPat = "\\d{5,}"
    val k = col("c_custkey")
    val phone = format_string(
      "%02d-%03d-%03d-%04d",
      k % 90 + 10,
      k % 900 + 100,
      (k * 7) % 900 + 100,
      (k * 13) % 9000 + 1000)
    val text = concat_ws(
      " ", col("c_name"), lit("call"), phone, lit("acct"), k * 3 + 1)
    Tables.read(spark, dir, "customer")
      .select(col("c_custkey"), explode(array(text)).as("t"))
      .select(
        col("c_custkey"),
        regexp_count(col("t"), lit(phonePat)).cast("long")
          .as("n_phone"),
        explode(
          array(regexp_replace(col("t"), phonePat, "[PHONE]")))
          .as("t1"))
      .select(
        col("c_custkey"),
        col("n_phone"),
        regexp_count(col("t1"), lit(idPat)).cast("long").as("n_id"),
        regexp_replace(col("t1"), idPat, "[ID]").as("redacted"))
      .orderBy("c_custkey")
  }

  def piiScrubOracle: String =
    s"""WITH t AS (
       |  SELECT c_custkey,
       |    c_name || ' call ' ||
       |    printf('%02d-%03d-%03d-%04d', c_custkey % 90 + 10,
       |      c_custkey % 900 + 100, (c_custkey * 7) % 900 + 100,
       |      (c_custkey * 13) % 9000 + 1000) ||
       |    ' acct ' || (c_custkey * 3 + 1) AS t
       |  FROM customer),
       |p AS (
       |  SELECT c_custkey,
       |    CAST(len(regexp_extract_all(t, '\\d{2}-\\d{3}-\\d{3}-\\d{4}')) AS BIGINT) n_phone,
       |    regexp_replace(t, '\\d{2}-\\d{3}-\\d{3}-\\d{4}', '[PHONE]', 'g') t1
       |  FROM t)
       |SELECT c_custkey, n_phone,
       |  CAST(len(regexp_extract_all(t1, '\\d{5,}')) AS BIGINT) n_id,
       |  regexp_replace(t1, '\\d{5,}', '[ID]', 'g') redacted
       |FROM p ORDER BY c_custkey""".stripMargin

  /** Reproducible epoch shuffle: global training order for epoch 1 as
    * a keyed-hash sort — `md5("epoch1:" || doc_id)` is the shuffle
    * key, so the permutation is a pure function of (epoch, doc_id):
    * re-runs and resumed jobs see the identical order, and a
    * different epoch label yields a statistically independent
    * permutation with no RNG state to checkpoint.
    *
    * Scale shape: one narrow projection + ONE global sort. Spark
    * plans a global sort as a range-partitioned distributed sort
    * (sampled range boundaries, then per-partition sorts) — the
    * md5 keys are uniform so the range partitions are balanced by
    * construction; there is no window and no single-partition stage.
    */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame =
    Tables.read(spark, dir, "documents")
      .select(
        md5(concat(lit("epoch1:"), col("doc_id").cast("string")))
          .as("shuffle_key"),
        col("doc_id"))
      .orderBy("shuffle_key")

  def epochShuffleOracle: String =
    """SELECT md5('epoch1:' || doc_id) AS shuffle_key, doc_id
      |FROM documents ORDER BY shuffle_key""".stripMargin

  /** Winsorization: clip each group's values to its exact [p05, p95]
    * order statistics — the standard heavy-tail tamer before loss
    * weighting / normalization (a handful of outliers otherwise
    * dominate a mean). Percentile bounds come from the same
    * value-histogram rank arithmetic as percentile_report (windows
    * over the HISTOGRAM, partitioned by group — never the fact
    * table), the bounds table is group-cardinality-sized so it
    * BROADCASTS back onto the fact scan, and the clip itself is a
    * narrow greatest/least projection into one partial+final
    * aggregate. Integer cents throughout => order-independent,
    * engine-exact sums.
    */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val vals = Tables.events(spark, dir)
      .select(col("event_type"), Quantize.cents(col("value")).as("vc"))
    val hist = vals.groupBy(col("event_type"), col("vc"))
      .agg(count(lit(1)).as("cnt"))
    val wRun = Window.partitionBy(col("event_type")).orderBy(col("vc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = hist
      .withColumn("hi", sum(col("cnt")).over(wRun))
      .withColumn("lo", col("hi") - col("cnt") + 1)
      .withColumn(
        "n", sum(col("cnt")).over(Window.partitionBy(col("event_type"))))
    def atRank(r: org.apache.spark.sql.Column) =
      max(when(r.between(col("lo"), col("hi")), col("vc")))
    val bounds = ranked.groupBy(col("event_type")).agg(
      atRank(expr("(5 * n + 99) div 100")).as("p05"),
      atRank(expr("(95 * n + 99) div 100")).as("p95"))
    vals.join(broadcast(bounds), "event_type")
      .select(
        col("event_type"), col("vc"), col("p05"), col("p95"),
        greatest(col("p05"), least(col("p95"), col("vc"))).as("clipped"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("p05")).as("p05_cents"),
        min(col("p95")).as("p95_cents"),
        sum(col("vc")).as("sum_raw_cents"),
        sum(col("clipped")).as("sum_clip_cents"),
        sum((col("vc") < col("p05")).cast("long")).as("n_clip_lo"),
        sum((col("vc") > col("p95")).cast("long")).as("n_clip_hi"))
      .orderBy("event_type")
  }

  def winsorizeOracle: String =
    s"""WITH v AS (
      |  SELECT event_type, ${Quantize.centsSql("value")} vc FROM events),
      |h AS (SELECT event_type, vc, CAST(COUNT(*) AS BIGINT) cnt FROM v GROUP BY 1, 2),
      |r AS (
      |  SELECT *, SUM(cnt) OVER (PARTITION BY event_type ORDER BY vc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) hi,
      |    SUM(cnt) OVER (PARTITION BY event_type) n
      |  FROM h),
      |i AS (SELECT *, hi - cnt + 1 lo FROM r),
      |b AS (
      |  SELECT event_type,
      |    MAX(CASE WHEN (5 * n + 99) // 100 BETWEEN lo AND hi THEN vc END) p05,
      |    MAX(CASE WHEN (95 * n + 99) // 100 BETWEEN lo AND hi THEN vc END) p95
      |  FROM i GROUP BY event_type)
      |SELECT v.event_type, CAST(COUNT(*) AS BIGINT) n,
      |  MIN(p05) p05_cents, MIN(p95) p95_cents,
      |  CAST(SUM(vc) AS BIGINT) sum_raw_cents,
      |  CAST(SUM(GREATEST(p05, LEAST(p95, vc))) AS BIGINT) sum_clip_cents,
      |  CAST(SUM(CASE WHEN vc < p05 THEN 1 ELSE 0 END) AS BIGINT) n_clip_lo,
      |  CAST(SUM(CASE WHEN vc > p95 THEN 1 ELSE 0 END) AS BIGINT) n_clip_hi
      |FROM v JOIN b USING (event_type)
      |GROUP BY v.event_type ORDER BY v.event_type""".stripMargin

  /** `zscore_normalize`: per-group feature standardization — the
    * feature-scaling pass a training pipeline runs before model
    * input. The group moments derive from EXACT integer sums (sum of
    * cents, sum of squared cents — order-independent under
    * distributed aggregation), so mean/std are single deterministic
    * IEEE expressions over exact longs; the normalized value is
    * computed per row after a broadcast join of the 5-row moments
    * table. Never a low-cardinality window over the fact table — the
    * two-pass agg+broadcast IS the 100 TB shape. Population std
    * (divide by n), zero-variance groups normalize to 0.
    */
  def zscoreNormalize(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.read(spark, dir, "orders").select(
      col("o_orderkey"), col("o_orderpriority").as("priority"),
      Quantize.cents(col("o_totalprice")).as("cents"))
    val moments = ord.groupBy(col("priority"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("cents")).as("s1"),
        // squared cents overflow a BIGINT sum past ~10^5 rows of
        // large orders: the sum accumulates in DECIMAL(38,0) (exact,
        // like DuckDB's HUGEINT) and converts to double once
        sum((col("cents") * col("cents")).cast(DecimalType(38, 0))).as("s2"))
      .select(
        col("priority"),
        (col("s1").cast("double") / col("n")).as("mean"),
        // clamp: the moments identity can go epsilon-negative under
        // IEEE cancellation; DuckDB's sqrt raises on negatives
        sqrt(greatest(
          (col("s2").cast("double") / col("n")) -
            (col("s1").cast("double") / col("n")) *
            (col("s1").cast("double") / col("n")),
          lit(0.0))).as("std"))
    ord.join(broadcast(moments), "priority")
      .select(
        col("o_orderkey"), col("priority"), col("cents"),
        when(col("std") > 0, (col("cents") - col("mean")) / col("std"))
          .otherwise(lit(0.0)).as("z"))
      .orderBy("o_orderkey")
  }

  def zscoreNormalizeOracle: String =
    s"""WITH ord AS (
       |  SELECT o_orderkey, o_orderpriority priority,
       |    ${Quantize.centsSql("o_totalprice")} cents
       |  FROM orders),
       |m AS (
       |  SELECT priority,
       |    CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS mean,
       |    -- Σc² crosses 2^53 at sf0.1 and DuckDB's HUGEINT->DOUBLE
       |    -- cast is NOT correctly rounded (off-by-one-ulp on the
       |    -- 5-LOW group) while Spark's DECIMAL(38,0)->double is;
       |    -- the VARCHAR detour goes through strtod, which IS
       |    -- correctly rounded, so both engines see the same double
       |    sqrt(greatest((CAST(CAST(SUM(cents * cents) AS VARCHAR) AS DOUBLE) / COUNT(*)) -
       |      (CAST(SUM(cents) AS DOUBLE) / COUNT(*)) *
       |      (CAST(SUM(cents) AS DOUBLE) / COUNT(*)), 0e0)) AS std
       |  FROM ord GROUP BY priority)
       |SELECT o_orderkey, priority, cents,
       |  CASE WHEN std > 0 THEN (cents - mean) / std ELSE 0e0 END AS z
       |FROM ord JOIN m USING (priority)
       |ORDER BY o_orderkey""".stripMargin

  /** `weighted_sample`: reproducible weight-proportional sampling —
    * k=5 documents per source, longer documents more likely — via
    * PRIORITY SAMPLING (Duffield–Lund–Thorup / sequential Poisson):
    * each doc draws a deterministic uniform `u` from [[ContentHash]]
    * (never `rand()` — same doc, same draw, on any cluster), its
    * priority is `u/weight`, and the k smallest priorities per
    * stratum win. Integer-exact: `u` is the 16-bit hash + 1 and the
    * priority is `(u · 1,000,000) div weight`, so both engines rank
    * identical BIGINTs — no `pow`/`ln` last-ulp hazard.
    *
    * Plan shape: one narrow projection + a rank<=k filter directly
    * over the window, which Spark plans as WindowGroupLimit — a
    * map-side partial top-k per source BEFORE the shuffle (the
    * `group_topk` shape), so the 20-value stratum key never
    * concentrates unfiltered rows on 20 reducers. At 100 TB this is
    * the corpus-subsampling front door: scan → hash → per-partition
    * heap of k per stratum → tiny shuffle of ≤ k·strata·partitions
    * survivor rows.
    */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pri = Tables.read(spark, dir, "documents")
      .select(
        col("source"), col("doc_id"), col("n_chars"),
        ((ContentHash.bucket(col("doc_id"), 65536) + 1) * 1000000L)
          .as("scaled"))
      .withColumn("priority", expr("scaled div greatest(n_chars, 1)"))
      .drop("scaled")
    pri
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("priority"), col("doc_id"))).cast("long"))
      .where(col("rn") <= 5)
      .orderBy(col("source"), col("rn"))
  }

  def weightedSampleOracle: String =
    s"""WITH pri AS (
       |  SELECT source, doc_id, n_chars,
       |         CAST(((${ContentHash.bucketSql("doc_id", 65536)}) + 1)
       |              * 1000000 AS BIGINT) // greatest(n_chars, 1)
       |           AS priority
       |  FROM documents),
       |rnk AS (
       |  SELECT source, doc_id, n_chars, priority,
       |         CAST(row_number() OVER (
       |           PARTITION BY source ORDER BY priority, doc_id)
       |           AS BIGINT) AS rn
       |  FROM pri)
       |SELECT source, doc_id, n_chars, priority, rn
       |FROM rnk WHERE rn <= 5
       |ORDER BY source, rn""".stripMargin

  /** `quality_classifier`: the fasttext-style linear quality scorer —
    * the SECOND quality filter every corpus pipeline runs beside the
    * LM-perplexity gate (`ngram_lm`/`lm_prune`): hand-derived integer
    * features (stopword share, length saturation, mean word length,
    * digit/punctuation shares) dotted with PINNED integer weights, a
    * fixed keep threshold, and the per-source keep-rate panel that
    * decides which feeds need re-crawling. A trained model would ship
    * learned weights through the identical plan — the weights are the
    * stub here (this container has no training libs), the scoring
    * dataflow is the real thing.
    *
    * All features are integer ppm/milli with div-floor, so the scores
    * (and the panel) are hash-exact. Plan shape: one narrow codegen'd
    * scan computes every feature (no shuffle), then ONE source-grain
    * aggregate. At 100 TB: map-side-combinable; the scorer adds zero
    * exchanges to whatever pipeline hosts it.
    */
  /** Doc-grain (doc_id, source, lang, score) quality-score relation —
    * single-sourced so [[qualityClassifier]] and the evaluation
    * battery ([[Evaluation]]: auc_roc / calibration_bins / pr_curve)
    * can never diverge on the score definition. Same pinned integer
    * weights and div-floor features as always; `lang` rides along as
    * the binary ground-truth label the eval gates grade against
    * (the stopword feature is English-biased by construction, so
    * lang='en' is the positive class a real quality scorer would be
    * audited on).
    */
  def qualityScoredDocs(spark: SparkSession, dir: String): DataFrame = {
    val toksCol = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    val stopArr = array(Seq("the", "a", "and", "of", "to", "in").map(lit): _*)
    val score =
      expr("(n_stop * 1000000 div n_tok) div 100") + // stopword share
        expr("least(n_tok, 200) * 1000 div 200") + // length saturation
        -expr("abs(n_chars * 1000 div n_tok - 5500) div 2") - // word-length shape
        expr("(n_digit * 1000000 div n_chars) div 100") - // digit share
        expr("(n_punct * 1000000 div n_chars) div 100") // punct share
    Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"), col("text"),
        explode(array(toksCol)).as("t")) // Generate barrier: tokenize once
      .select(
        col("doc_id"), col("source"), col("lang"),
        size(col("t")).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_chars"),
        size(filter(col("t"), x => array_contains(stopArr, x)))
          .cast("long").as("n_stop"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[.,;:!?]", "")))
          .cast("long").as("n_punct"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", "")))
          .cast("long").as("n_digit"))
      .where(col("n_tok") > 0 && col("n_chars") > 0)
      .withColumn("score", score)
      .select(col("doc_id"), col("source"), col("lang"), col("score"))
  }

  /** The DuckDB twin of [[qualityScoredDocs]]: CTEs `qt` (features)
    * and `qscore` (doc_id, source, lang, score) — splice with
    * `WITH $QualityScoreCtes, ...`. Kept beside the Spark definition
    * so a weight change edits one file, both engines.
    */
  val QualityScoreCtes: String =
    """qt AS (
      |  SELECT doc_id, source, lang,
      |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) n_tok,
      |    length(text) n_chars,
      |    len(list_filter(string_split_regex(lower(text), '\s+'),
      |        x -> list_contains(['the','a','and','of','to','in'], x))) n_stop,
      |    length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) n_punct,
      |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) n_digit
      |  FROM documents),
      |qscore AS (
      |  SELECT doc_id, source, lang,
      |    (n_stop * 1000000 // n_tok) // 100
      |    + least(n_tok, 200) * 1000 // 200
      |    - abs(n_chars * 1000 // n_tok - 5500) // 2
      |    - (n_digit * 1000000 // n_chars) // 100
      |    - (n_punct * 1000000 // n_chars) // 100 AS score
      |  FROM qt WHERE n_tok > 0 AND n_chars > 0)""".stripMargin

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    qualityScoredDocs(spark, dir)
      .withColumn("keep", (col("score") >= 800).cast("long"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("keep")).as("n_keep"),
        sum(col("score")).as("ssum"))
      .select(
        col("source"), col("n_docs"), col("n_keep"),
        expr("n_keep * 1000000 div n_docs").as("keep_ppm"),
        // ssum can be negative: sign-split the floor division so both
        // engines truncate toward zero identically
        expr("CASE WHEN ssum < 0 THEN -((-ssum) div n_docs) ELSE ssum div n_docs END")
          .as("avg_score"))
      .orderBy("source")
  }

  def qualityClassifierOracle: String =
    s"""WITH $QualityScoreCtes,
      |s AS (SELECT source, score FROM qscore)
      |SELECT source, CAST(count(*) AS BIGINT) n_docs,
      |  CAST(sum(CASE WHEN score >= 800 THEN 1 ELSE 0 END) AS BIGINT) n_keep,
      |  CAST(sum(CASE WHEN score >= 800 THEN 1 ELSE 0 END) * 1000000
      |    // count(*) AS BIGINT) keep_ppm,
      |  CAST(CASE WHEN sum(score) < 0 THEN -((-sum(score)) // count(*))
      |    ELSE sum(score) // count(*) END AS BIGINT) avg_score
      |FROM s GROUP BY 1 ORDER BY source""".stripMargin

  /** `mlm_mask`: deterministic masked-language-model span selection —
    * the BERT/T5 data-prep step: ~15% of each document's token
    * POSITIONS select for masking by content hash of (doc_id, pos),
    * never RNG state, so the same document masks identically across
    * engines, runs, partitionings and epochs (reshuffle the epoch,
    * not the masks). Output per doc: token count, masked count, and
    * an order-independent checksum of the selected positions' hashes
    * — the artifact a training job verifies its masking against.
    *
    * Plan shape: narrow tokenize → bounded position explode (×n_tok)
    * → ONE doc-grain aggregate. Masking depends only on (doc_id,
    * pos), so the token VALUES never leave the first projection; at
    * 100 TB this is a zero-join, map-side-combinable pass.
    */
  def mlmMask(spark: SparkSession, dir: String): DataFrame = {
    val toksCol = filter(split(lower(col("text")), "\\s+"), x => x =!= "")
    Tables.read(spark, dir, "documents")
      .select(col("doc_id"), size(toksCol).cast("long").as("n_tokens"))
      .where(col("n_tokens") > 0)
      .select(
        col("doc_id"), col("n_tokens"),
        explode(sequence(lit(0L), col("n_tokens") - 1)).as("pos"))
      .withColumn(
        "h",
        conv(
          substring(
            md5(concat(
              col("doc_id").cast("string"), lit(":"),
              col("pos").cast("string"))), 1, 8),
          16, 10).cast("long"))
      .withColumn("m", col("h") % 100 < 15)
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(
        sum(col("m").cast("long")).as("n_masked"),
        sum(when(col("m"), col("h"))).as("mask_checksum"))
      .orderBy("doc_id")
  }

  def mlmMaskOracle: String =
    """WITH w AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) n_tokens
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, n_tokens, pos,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
      |      CAST(pos AS VARCHAR)), 1, 8))::BIGINT h
      |  FROM w, unnest(range(0, n_tokens)) t(pos)
      |  WHERE n_tokens > 0)
      |SELECT doc_id, CAST(n_tokens AS BIGINT) n_tokens,
      |  CAST(sum(CASE WHEN h % 100 < 15 THEN 1 ELSE 0 END) AS BIGINT) n_masked,
      |  CAST(sum(CASE WHEN h % 100 < 15 THEN h END) AS BIGINT) mask_checksum
      |FROM p GROUP BY doc_id, n_tokens ORDER BY doc_id""".stripMargin

  /** `negative_sampling`: reproducible hard-negative selection for
    * contrastive training — per anchor document, the 4 out-of-source
    * candidates with the smallest content hash of the (anchor,
    * candidate) PAIR. Pair-hash ranking is the point: the same
    * anchor draws the same negatives on every engine, run and epoch
    * (no RNG state — the `epoch_shuffle`/`weighted_sample` rule), and
    * different anchors draw independent-looking sets because the hash
    * mixes both ids. Cross-source only, so negatives are never
    * near-duplicates drawn from the anchor's own feed.
    *
    * Plan shape: the anchor set is query-sized and BROADCASTS against
    * one candidate scan (anchors × candidates rows expand, but only
    * ×|anchors|); per-anchor top-4 is an anchor-partitioned
    * WindowGroupLimit-shape rank. At 100 TB anchors are batched: the
    * expansion is |batch|×corpus, the standard in-batch-negatives
    * mining pass.
    */
  def negativeSampling(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val anchors = docs.where(col("doc_id") < 20)
      .select(col("doc_id").as("anchor"), col("source").as("a_source"))
    val pairs = docs
      .join(broadcast(anchors), col("source") =!= col("a_source"))
      .withColumn(
        "h",
        conv(
          substring(
            md5(concat(
              col("anchor").cast("string"), lit("~"),
              col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long"))
    val w = Window.partitionBy(col("anchor")).orderBy(col("h"), col("doc_id"))
    pairs
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= 4)
      .select(col("anchor"), col("rnk"), col("doc_id").as("negative"), col("h"))
      .orderBy("anchor", "rnk")
  }

  def negativeSamplingOracle: String =
    """WITH a AS (
      |  SELECT doc_id anchor, source a_source FROM documents
      |  WHERE doc_id < 20),
      |p AS (
      |  SELECT a.anchor, d.doc_id,
      |    ('0x' || substr(md5(CAST(a.anchor AS VARCHAR) || '~' ||
      |      CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT h
      |  FROM a JOIN documents d ON d.source <> a.a_source),
      |r AS (
      |  SELECT anchor, doc_id, h,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY anchor ORDER BY h, doc_id)
      |      AS BIGINT) rnk
      |  FROM p)
      |SELECT anchor, rnk, doc_id negative, h FROM r
      |WHERE rnk <= 4 ORDER BY anchor, rnk""".stripMargin

  /** `dataset_card`: the one-row corpus summary a dataset release
    * ships — size (docs/tokens), composition (languages/sources),
    * shape (floor-mean tokens per doc, short-doc share), and hygiene
    * (near-dup share off the SHARED converged CC label table — the
    * same propagation dedup_clusters/golden_record already paid for,
    * never re-run here). Everything integer/ppm; one token-counting
    * scan + one label join, then two 1-row aggregates cross-joined.
    * The card is what the curation loop watches release-over-release
    * (vocab_drift watches terms, this watches the corpus envelope).
    */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val nTok = size(filter(split(col("text"), "\\s+"), x => x =!= ""))
      .cast("long")
    val docs = Tables.read(spark, dir, "documents")
    val stats = docs
      .select(col("lang"), col("source"), nTok.as("n_tok"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        countDistinct(col("lang")).as("n_langs"),
        countDistinct(col("source")).as("n_sources"),
        sum(when(col("n_tok") < 20, 1L).otherwise(0L)).as("n_short"))
    val dups = docs
      .join(
        Dedup.ccLabelsShared(spark, dir).withColumnRenamed("doc", "doc_id"),
        Seq("doc_id"), "left")
      .agg(
        sum(when(col("root").isNotNull && col("root") =!= col("doc_id"), 1L)
          .otherwise(0L)).as("n_dups"))
    stats.crossJoin(broadcast(dups))
      .select(
        col("n_docs"), col("total_tokens"), col("n_langs"),
        col("n_sources"),
        expr("total_tokens div n_docs").as("mean_doc_tokens"),
        expr("n_short * 1000000 div n_docs").as("short_ppm"),
        col("n_dups"),
        expr("n_dups * 1000000 div n_docs").as("dup_ppm"))
  }

  def datasetCardOracle: String =
    s"""WITH RECURSIVE ${Dedup.ShinglesSql},
       |${Dedup.MinhashPairsCtes},
       |e AS (SELECT a src, b dst FROM lshpairs UNION SELECT b, a FROM lshpairs),
       |reach AS (
       |  SELECT src AS doc, dst AS r FROM e
       |  UNION
       |  SELECT reach.doc, e.dst FROM reach JOIN e ON reach.r = e.src),
       |comp AS (
       |  SELECT doc, least(doc, MIN(r)) AS root FROM reach GROUP BY doc),
       |t AS (
       |  SELECT lang, source,
       |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'),
       |      x -> x <> '')) AS BIGINT) n_tok
       |  FROM documents),
       |s AS (
       |  SELECT CAST(count(*) AS BIGINT) n_docs,
       |    CAST(sum(n_tok) AS BIGINT) total_tokens,
       |    CAST(count(DISTINCT lang) AS BIGINT) n_langs,
       |    CAST(count(DISTINCT source) AS BIGINT) n_sources,
       |    CAST(sum(CASE WHEN n_tok < 20 THEN 1 ELSE 0 END) AS BIGINT) n_short
       |  FROM t),
       |du AS (
       |  SELECT CAST(sum(CASE WHEN c.root IS NOT NULL
       |      AND c.root <> d.doc_id THEN 1 ELSE 0 END) AS BIGINT) n_dups
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc)
       |SELECT n_docs, total_tokens, n_langs, n_sources,
       |  total_tokens // n_docs mean_doc_tokens,
       |  n_short * 1000000 // n_docs short_ppm,
       |  n_dups, n_dups * 1000000 // n_docs dup_ppm
       |FROM s, du""".stripMargin

  /** Number of BPE merge rounds `bpe_train` learns. */
  private val BpeRounds = 5

  /** Adjacent-symbol pairs of the space-joined symbol string `s`. */
  private val BpePairsOf =
    "CASE WHEN size(split(s, ' ')) < 2 THEN array() ELSE " +
      "transform(sequence(1, size(split(s, ' ')) - 1), i -> " +
      "concat(element_at(split(s, ' '), i), ' ', " +
      "element_at(split(s, ' '), i + 1))) END"

  /** One BPE merge round over a symbol relation carrying (s, cnt):
    * the best pair by weighted count comes from a distributed
    * aggregate whose single row collects to the driver (the
    * bom_rollup one-scalar-action exception), then splices back into
    * the merge as LITERALS — so the merge step is a narrow projection
    * with no crossJoin, no broadcast build, and no best-subtree
    * duplication nested into later rounds (the prior form re-derived
    * every earlier round's pair aggregate inside each new round's
    * plan; at bench scale that nesting was ~0.6 s/round of fixed
    * floor). Returns ((pair, merged, weighted count), merged sym).
    */
  private def bpeRound(sym: DataFrame): ((String, String, Long), DataFrame) = {
    val best = sym
      .select(explode(expr(BpePairsOf)).as("pair"), col("cnt"))
      .groupBy(col("pair")).agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(1)
      .collect().head
    val bp = best.getString(0)
    val bm = bp.replace(" ", "")
    val merged = sym.withColumn(
      "s",
      trim(replace(
        concat(lit(" "), col("s"), lit(" ")),
        lit(s" $bp "), lit(s" $bm "))))
    ((bp, bm, best.getLong(1)), merged)
  }

  /** `bpe_train`: byte-pair-encoding VOCABULARY TRAINING — not just
    * applying a tokenizer (`bpe_tokens`) but LEARNING the merge table,
    * the step every LLM data pipeline runs before tokenizing anything.
    * Each round: count adjacent symbol pairs across the vocabulary
    * (occurrence-weighted by word frequency), pick the most frequent
    * pair (ties: lexicographically smallest — deterministic), merge it
    * in every word, repeat. Output = the learned merge table (step,
    * pair, merged, weighted count) plus a final row proving the merges
    * were APPLIED (distinct symbol count after all rounds).
    *
    * THE scale property of real BPE training, made structural: the
    * corpus contributes exactly ONE map-side-combinable wordcount
    * shuffle; every round after operates on the VOCABULARY relation
    * (distinct words × symbol strings), which is bounded by language,
    * not data volume. At 100 TB the rounds cost the same as at 100 MB.
    *
    * Merge application is boundary-guarded string replacement on the
    * space-joined symbol string (`' a b ' → ' ab '` inside a padded
    * string) — both engines' `replace` is left-to-right and
    * non-overlapping, so immediately-repeated pairs ('a a a') merge
    * alternately rather than greedily; the rule is replayed
    * IDENTICALLY in the oracle, and the corpus has no such words.
    */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // materialized ONCE: the claim "the corpus contributes exactly
    // one wordcount shuffle" must hold in LINEAGE terms too — every
    // merge round's pair-count subtree re-derives from here
    val wc = Tables.read(spark, dir, "documents")
      .select(explode(TextAnalysis.toks(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    var sym = wc.select(
      expr("array_join(transform(sequence(1, length(w)), " +
        "i -> substring(w, i, 1)), ' ')").as("s"),
      col("cnt"))
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    for (step <- 1 to BpeRounds) {
      val ((bp, bm, n), next) = bpeRound(sym)
      merges += ((step.toLong, bp, bm, n))
      sym = next
    }
    val vocab = sym
      .select(explode(split(col("s"), " ")).as("v"))
      .agg(countDistinct(col("v")).as("n"))
      .collect().head.getLong(0)
    (merges.result() :+ ((99L, "<vocab>", "<vocab>", vocab)))
      .toDF("step", "pair", "merged", "n")
      .orderBy("step")
  }

  def bpeTrainOracle: String = {
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (
         |  SELECT t[i] || ' ' || t[i+1] pair, CAST(SUM(cnt) AS BIGINT) n
         |  FROM (SELECT string_split(s, ' ') t, cnt FROM sym${r - 1}),
         |    unnest(range(1, len(t))) u(i)
         |  GROUP BY 1),
         |b$r AS (SELECT pair, replace(pair, ' ', '') merged, n
         |  FROM p$r ORDER BY n DESC, pair LIMIT 1),
         |sym$r AS (
         |  SELECT trim(replace(' ' || s || ' ',
         |    ' ' || (SELECT pair FROM b$r) || ' ',
         |    ' ' || (SELECT merged FROM b$r) || ' ')) s, cnt
         |  FROM sym${r - 1})""".stripMargin
    }.mkString(",\n")
    val mergeRows = (1 to BpeRounds).map(r =>
      s"SELECT CAST($r AS BIGINT) step, pair, merged, n FROM b$r")
      .mkString("\nUNION ALL\n")
    s"""WITH toks AS (
       |  SELECT unnest(${TextAnalysis.ToksSql.format("text")}) w
       |  FROM documents),
       |wc AS (SELECT w, CAST(count(*) AS BIGINT) cnt FROM toks GROUP BY 1),
       |sym0 AS (
       |  SELECT array_to_string(
       |    list_transform(range(1, length(w) + 1), i -> w[i:i]), ' ') s,
       |    cnt
       |  FROM wc),
       |$rounds
       |$mergeRows
       |UNION ALL
       |SELECT CAST(99 AS BIGINT), '<vocab>', '<vocab>',
       |  (SELECT CAST(count(DISTINCT v) AS BIGINT)
       |   FROM (SELECT unnest(string_split(s, ' ')) v FROM sym$BpeRounds))
       |ORDER BY step""".stripMargin
  }

  /** The (word → BPE segmentation) vocabulary table after
    * [[BpeRounds]] learned merges — bpe_train's `sym` evolution kept
    * keyed by the original word. Vocabulary-sized at any corpus size.
    */
  private def bpeSegmentations(
      spark: SparkSession, dir: String): DataFrame = {
    // materialized ONCE: the claim "the corpus contributes exactly
    // one wordcount shuffle" must hold in LINEAGE terms too — every
    // merge round's pair-count subtree re-derives from here
    val wc = Tables.read(spark, dir, "documents")
      .select(explode(TextAnalysis.toks(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    var sym = wc.select(
      col("w"),
      expr("array_join(transform(sequence(1, length(w)), " +
        "i -> substring(w, i, 1)), ' ')").as("s"),
      col("cnt"))
    for (_ <- 1 to BpeRounds) sym = bpeRound(sym)._2
    sym.select(col("w"), col("s"))
  }

  /** `bpe_apply`: tokenize the corpus WITH the vocabulary bpe_train
    * just learned — the second half of the tokenizer lifecycle, and
    * the half that touches the data: the learned (word →
    * segmentation) table is vocabulary-sized, so it BROADCASTS, and
    * corpus application is a narrow scan + map-side join — the
    * production shape where training costs one wordcount and
    * tokenization costs zero shuffles of the corpus. Per (lang):
    * words, subwords, and the fertility (subwords per word, ppm) the
    * learned merges achieve — the metric that says whether 5 merges
    * were worth anything (cf. `tokenizer_fertility`, which measures a
    * FIXED segmenter).
    */
  /** The learned (word → subword-count) table, persisted once per
    * (session, dir) — a tokenizer is TRAINED once and applied many
    * times, so the apply path reading a materialized copy is the
    * production shape (the lmScoresShared discipline: `bpe_train`
    * itself still pays the full merge chain). Vocabulary-sized.
    */
  private val bpeSegCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  private def bpeSegShared(spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val stale =
      bpeSegCache.keys.asScala.filter(_._1.sparkContext.isStopped).toList
    stale.foreach(bpeSegCache.remove)
    bpeSegCache.computeIfAbsent(
      (spark, dir),
      { case (s, d) =>
        bpeSegmentations(s, d)
          .select(col("w").as("sw"), size(split(col("s"), " ")).as("n_sub"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      })
  }

  /** Drop the shared segmentation table for `dir` (post-rewrite). */
  def invalidateShared(spark: SparkSession, dir: String): Unit = {
    val df = bpeSegCache.remove((spark, dir))
    if (df != null) df.unpersist()
  }

  def bpeApply(spark: SparkSession, dir: String): DataFrame = {
    val seg = bpeSegShared(spark, dir)
    Tables.spread(spark, Tables.read(spark, dir, "documents"))
      .select(col("lang"), explode(TextAnalysis.toks(col("text"))).as("w"))
      .join(broadcast(seg), col("w") === col("sw"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_subwords"))
      .withColumn(
        "fertility_ppm", expr("n_subwords * 1000000 div n_words"))
      .orderBy("lang")
  }

  def bpeApplyOracle: String = {
    val rounds = (1 to BpeRounds).map { r =>
      s"""p$r AS (
         |  SELECT t[i] || ' ' || t[i+1] pair, CAST(SUM(cnt) AS BIGINT) n
         |  FROM (SELECT string_split(s, ' ') t, cnt FROM sym${r - 1}),
         |    unnest(range(1, len(t))) u(i)
         |  GROUP BY 1),
         |b$r AS (SELECT pair, replace(pair, ' ', '') merged
         |  FROM p$r ORDER BY n DESC, pair LIMIT 1),
         |sym$r AS (
         |  SELECT w, trim(replace(' ' || s || ' ',
         |    ' ' || (SELECT pair FROM b$r) || ' ',
         |    ' ' || (SELECT merged FROM b$r) || ' ')) s, cnt
         |  FROM sym${r - 1})""".stripMargin
    }.mkString(",\n")
    s"""WITH toks AS (
       |  SELECT unnest(${TextAnalysis.ToksSql.format("text")}) w
       |  FROM documents),
       |wc AS (SELECT w, CAST(count(*) AS BIGINT) cnt FROM toks GROUP BY 1),
       |sym0 AS (
       |  SELECT w, array_to_string(
       |    list_transform(range(1, length(w) + 1), i -> w[i:i]), ' ') s,
       |    cnt
       |  FROM wc),
       |$rounds,
       |seg AS (SELECT w sw, CAST(len(string_split(s, ' ')) AS BIGINT)
       |    n_sub FROM sym$BpeRounds),
       |corpus AS (
       |  SELECT lang, unnest(${TextAnalysis.ToksSql.format("text")}) w
       |  FROM documents),
       |agg AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) n_words,
       |    CAST(SUM(n_sub) AS BIGINT) n_subwords
       |  FROM corpus JOIN seg ON w = sw GROUP BY lang)
       |SELECT lang, n_words, n_subwords,
       |  n_subwords * 1000000 // n_words fertility_ppm
       |FROM agg ORDER BY lang""".stripMargin
  }

  /** `time_split_cv`: expanding-window time-series cross-validation
    * folds over the events table with a one-day EMBARGO — the split
    * discipline for anything trained on temporal data, where
    * [[trainSplit]]'s content-hash rule would leak the future into
    * the past (a random split puts tomorrow in train and today in
    * test). The window divides into 6 equal day-spans; fold k
    * (1..5) tests on span k+1, trains on everything before it MINUS
    * the single embargo day at the boundary (the label-horizon gap
    * that keeps boundary-straddling targets out of both sides).
    * Emits per fold the span and train/embargo/test event counts —
    * all derived from the data's own bounds, so the split is
    * reproducible across engines, runs and partitionings with no
    * RNG and no configuration.
    *
    * Plan: one fact aggregate to the bounded day grid, a 5-row fold
    * grid broadcast-joined onto it, one grid-grain rollup. Degenerate
    * windows (< 6 days) yield span 0 and are filtered — an empty
    * report, not a misleading one.
    */
  def timeSplitCv(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(eager = false) // bounds + the fold classify
    val bounds = days.agg(min(col("d")).as("d0"))
      .crossJoin(broadcast(
        days.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"))
          .select(expr("(datediff(dmax, dmin) + 1) div 6")
            .cast("long").as("span"))))
    val folds = spark.range(1, 6).select(col("id").as("fold"))
    days
      .crossJoin(broadcast(bounds)) // 1-row bounds: documented exception
      .where(col("span") > 0)
      .select(
        datediff(col("d"), col("d0")).cast("long").as("off"),
        col("n"), col("span"))
      .join(broadcast(folds), expr("off < (fold + 1) * span"))
      .groupBy(col("fold"))
      .agg(
        max(col("span")).as("span_days"),
        sum(when(expr("off < fold * span - 1"), col("n")).otherwise(lit(0L)))
          .as("n_train"),
        sum(when(expr("off = fold * span - 1"), col("n")).otherwise(lit(0L)))
          .as("n_embargo"),
        sum(when(expr("off >= fold * span"), col("n")).otherwise(lit(0L)))
          .as("n_test"))
      .orderBy("fold")
  }

  def timeSplitCvOracle: String =
    """WITH dg AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |    CAST(COUNT(*) AS BIGINT) n
      |  FROM events GROUP BY 1),
      |b AS (
      |  SELECT MIN(d) d0,
      |    CAST((date_diff('day', MIN(d), MAX(d)) + 1) // 6 AS BIGINT) span
      |  FROM dg),
      |o AS (
      |  SELECT CAST(date_diff('day', d0, d) AS BIGINT) doff, n, span
      |  FROM dg CROSS JOIN b WHERE span > 0),
      |fl AS (SELECT CAST(unnest(range(1, 6)) AS BIGINT) fold)
      |SELECT fold, CAST(MAX(span) AS BIGINT) span_days,
      |  CAST(SUM(CASE WHEN doff < fold * span - 1 THEN n ELSE 0 END)
      |    AS BIGINT) n_train,
      |  CAST(SUM(CASE WHEN doff = fold * span - 1 THEN n ELSE 0 END)
      |    AS BIGINT) n_embargo,
      |  CAST(SUM(CASE WHEN doff >= fold * span THEN n ELSE 0 END)
      |    AS BIGINT) n_test
      |FROM o JOIN fl ON doff < (fold + 1) * span
      |GROUP BY fold ORDER BY fold""".stripMargin

  /** `target_encoding`: leakage-safe OUT-OF-FOLD target encoding of a
    * categorical — the feature-engineering step that replaces a
    * category with the mean response its OTHER folds observed, so a
    * row never sees a statistic its own label contributed to (naive
    * whole-table means leak the target and inflate every offline
    * metric). Category = order priority, response = order price in
    * cents, folds = the content-hash rule on orderkey (train_split's
    * discipline — reproducible, engine-identical, never rand()).
    * oof_mean_c(cat, fold) = (sum_cat − sum_cat_fold) div
    * (n_cat − n_cat_fold), NULL when a category exists only inside
    * the fold (the honest cold-start answer; a production encoder
    * would back off to the global prior).
    *
    * Plan: ONE fact scan → (category × fold) grid aggregate (25
    * rows); category totals are a rollup OF THE GRID, broadcast
    * back — the fact table is never touched twice. At 100 TB the
    * encoder table ships as a broadcast dim to the training join.
    */
  def targetEncoding(spark: SparkSession, dir: String): DataFrame = {
    val grid = Tables.read(spark, dir, "orders")
      .select(
        col("o_orderpriority").as("category"),
        ContentHash.bucket(col("o_orderkey"), 5).as("fold"),
        Quantize.cents(col("o_totalprice")).as("c"))
      .groupBy(col("category"), col("fold"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
      .localCheckpoint(eager = false) // category rollup + the join
    val catTot = grid.groupBy(col("category"))
      .agg(sum(col("n")).as("n_cat"), sum(col("s")).as("s_cat"))
    grid
      .join(broadcast(catTot), "category")
      .select(
        col("category"), col("fold"), col("n"),
        expr("""CASE WHEN n_cat - n = 0 THEN NULL
          ELSE (s_cat - s) div (n_cat - n) END""").as("oof_mean_c"))
      .orderBy("category", "fold")
  }

  def targetEncodingOracle: String =
    s"""WITH g AS (
       |  SELECT o_orderpriority category,
       |    ${ContentHash.bucketSql("o_orderkey", 5)} fold,
       |    CAST(COUNT(*) AS BIGINT) n,
       |    CAST(SUM(${Quantize.centsSql("o_totalprice")}) AS BIGINT) s
       |  FROM orders GROUP BY 1, 2),
       |ct AS (
       |  SELECT category, CAST(SUM(n) AS BIGINT) n_cat,
       |    CAST(SUM(s) AS BIGINT) s_cat
       |  FROM g GROUP BY 1)
       |SELECT category, fold, n,
       |  CASE WHEN n_cat - n = 0 THEN NULL
       |    ELSE (s_cat - s) // (n_cat - n) END oof_mean_c
       |FROM g JOIN ct USING (category)
       |ORDER BY category, fold""".stripMargin

  /** `feature_hash_collisions`: the measured cost of the HASHING
    * TRICK — vocabulary hashed into B = 1024 buckets by the
    * content-hash rule, and the aliasing it causes read off as data:
    * distinct tokens, occupied buckets, collided tokens (tokens
    * sharing a bucket with a different token), the share of token
    * OCCURRENCES carrying aliased features (the number a model
    * actually pays — df-weighted, not vocab-weighted), and the max
    * bucket load. The hashing-trick member of the measured
    * answer-quality battery (bloom_fpp / minhash_estimate /
    * countmin_error): "1024 buckets" is a memory choice, this is its
    * price tag.
    *
    * Plan: tokenize once (bounded per-row explode), ONE vocab
    * aggregate (token → df), bucket rollup of the VOCAB relation
    * (≤1024 rows), two 1-row folds. Nothing past the vocab aggregate
    * scales with the corpus.
    */
  def featureHashCollisions(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.read(spark, dir, "documents")
      .select(explode(
        filter(split(lower(col("text")), "\\s+"), x => x =!= ""))
        .as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .select(ContentHash.bucket(col("tok"), 1024).as("bucket"), col("df"))
    val buckets = vocab.groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(col("df")).as("occ"))
      .localCheckpoint(eager = false) // the two folds below share it
    buckets.agg(
      sum(col("n_tok")).as("n_tokens"),
      count(lit(1)).as("n_occupied"),
      sum(when(col("n_tok") >= 2, col("n_tok")).otherwise(lit(0L)))
        .as("n_collided"),
      sum(col("occ")).as("t_occ"),
      sum(when(col("n_tok") >= 2, col("occ")).otherwise(lit(0L)))
        .as("a_occ"),
      max(col("n_tok")).as("max_load"))
      .select(
        col("n_tokens"), col("n_occupied"), col("n_collided"),
        expr("n_collided * 1000000 div n_tokens").as("collided_ppm"),
        expr("CASE WHEN t_occ = 0 THEN NULL " +
          "ELSE a_occ * 1000000 div t_occ END").as("aliased_occ_ppm"),
        col("max_load"))
  }

  def featureHashCollisionsOracle: String =
    s"""WITH tk AS (
       |  SELECT unnest(list_filter(
       |    string_split_regex(lower(text), '\\s+'), x -> x <> '')) tok
       |  FROM documents),
       |v AS (
       |  SELECT ${ContentHash.bucketSql("tok", 1024)} bucket,
       |    CAST(c AS BIGINT) df
       |  FROM (SELECT tok, COUNT(*) c FROM tk GROUP BY tok) g),
       |b AS (
       |  SELECT bucket, CAST(COUNT(*) AS BIGINT) n_tok,
       |    CAST(SUM(df) AS BIGINT) occ
       |  FROM v GROUP BY 1)
       |SELECT CAST(SUM(n_tok) AS BIGINT) n_tokens,
       |  CAST(COUNT(*) AS BIGINT) n_occupied,
       |  CAST(SUM(CASE WHEN n_tok >= 2 THEN n_tok ELSE 0 END) AS BIGINT)
       |    n_collided,
       |  CAST(SUM(CASE WHEN n_tok >= 2 THEN n_tok ELSE 0 END) AS BIGINT)
       |    * 1000000 // CAST(SUM(n_tok) AS BIGINT) collided_ppm,
       |  CASE WHEN SUM(occ) = 0 THEN NULL
       |    ELSE CAST(SUM(CASE WHEN n_tok >= 2 THEN occ ELSE 0 END)
       |      AS BIGINT) * 1000000 // CAST(SUM(occ) AS BIGINT)
       |  END aliased_occ_ppm,
       |  CAST(MAX(n_tok) AS BIGINT) max_load
       |FROM b""".stripMargin

  /** `quota_sample`: EXECUTE a mixing recipe — downsample every
    * source to an equal share of a half-corpus budget by the
    * content-hash gate (keep a doc iff its md5 bucket < the source's
    * keep rate), the sampler-side counterpart of [[mixAllocate]]'s
    * quota arithmetic: a quota is a contract, this is the operator
    * that delivers it, reproducibly (same doc kept on every engine,
    * run and partitioning — resampling a source re-keeps a superset,
    * never reshuffles). Emits per source the population, target,
    * gate rate, docs actually kept, and the achieved-vs-target error
    * in ppm of target — the hash gate is binomial around the rate,
    * and publishing the realized gap is the honest form of that
    * (the same measured-vs-nominal stance as countmin_error).
    *
    * Plan: one doc scan with the gate evaluated per row against the
    * broadcast per-source rate (a 20-row dim), ONE source rollup.
    * At 100 TB: zero extra shuffles — the gate rides whatever scan
    * the pipeline already runs.
    */
  def quotaSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.read(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    val perSrc = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint(eager = false) // budget fold + the gate join
    val target = perSrc
      .crossJoin(broadcast(perSrc.agg(
        (sum(col("n_docs")) / 2).cast("long").as("budget"),
        count(lit(1)).as("n_src")))) // 1-row totals: documented exception
      .select(
        col("source"), col("n_docs"),
        expr("budget div n_src").as("target"),
        least(lit(1000000L), expr("(budget div n_src) * 1000000 div n_docs"))
          .as("keep_ppm"))
    docs
      .join(broadcast(target), "source")
      .select(
        col("source"), col("n_docs"), col("target"), col("keep_ppm"),
        (ContentHash.bucket(col("doc_id"), 1000000) < col("keep_ppm"))
          .cast("long").as("kept"))
      .groupBy(col("source"), col("n_docs"), col("target"), col("keep_ppm"))
      .agg(sum(col("kept")).as("n_kept"))
      .select(
        col("source"), col("n_docs"), col("target"), col("keep_ppm"),
        col("n_kept"),
        expr("""CASE WHEN target = 0 THEN NULL
          WHEN n_kept - target < 0
            THEN -((target - n_kept) * 1000000 div target)
          ELSE (n_kept - target) * 1000000 div target
          END""").as("err_ppm"))
      .orderBy("source")
  }

  def quotaSampleOracle: String =
    s"""WITH d AS (SELECT doc_id, source FROM documents),
       |ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) n_docs
       |  FROM d GROUP BY 1),
       |b AS (SELECT CAST(SUM(n_docs) // 2 AS BIGINT) budget,
       |  CAST(COUNT(*) AS BIGINT) n_src FROM ps),
       |tg AS (
       |  SELECT source, n_docs, budget // n_src target,
       |    least(1000000, (budget // n_src) * 1000000 // n_docs) keep_ppm
       |  FROM ps CROSS JOIN b),
       |k AS (
       |  SELECT tg.source, n_docs, target, keep_ppm,
       |    CAST(SUM(CASE WHEN ${ContentHash.bucketSql("doc_id", 1000000)}
       |      < keep_ppm THEN 1 ELSE 0 END) AS BIGINT) n_kept
       |  FROM d JOIN tg ON d.source = tg.source
       |  GROUP BY 1, 2, 3, 4)
       |SELECT source, n_docs, target, keep_ppm, n_kept,
       |  CASE WHEN target = 0 THEN NULL
       |    WHEN n_kept - target < 0
       |      THEN -((target - n_kept) * 1000000 // target)
       |    ELSE (n_kept - target) * 1000000 // target
       |  END err_ppm
       |FROM k ORDER BY source""".stripMargin

  /** `rfm_features`: the classical recency / frequency / monetary
    * feature block per user from the event stream — the feature-
    * engineering step between the raw tables and every churn or LTV
    * model (`cohort_ltv` aggregates the cohort; this emits the
    * PER-USER training row): days since last purchase (vs the
    * corpus's max timestamp — reproducible, not wall clock),
    * purchase count, lifetime purchase cents, tenure days (first
    * event → corpus end), and the error share of all events in ppm.
    * Top-100 by monetary (user tie-break) keeps the dump bounded;
    * the feature computation itself is full-corpus.
    *
    * Plan shape: one events scan → per-user conditional aggregate;
    * corpus max-ts is a 1-row broadcast. Scan-bound at any scale.
    */
  def rfmFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val maxTs = ev.agg(max(col("ts")).as("max_ts"))
    ev.groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === "purchase", col("ts"))).as("last_p"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("frequency"),
        sum(when(col("event_type") === "purchase",
          Quantize.cents(col("value"))).otherwise(0L)).as("monetary_c"),
        min(col("ts")).as("first_ts"),
        sum((col("event_type") === "error").cast("long")).as("n_err"),
        count(lit(1)).as("n_ev"))
      .where(col("last_p").isNotNull) // purchasers only: model rows
      .crossJoin(broadcast(maxTs)) // 1-row corpus end
      .select(
        col("user_id"),
        expr("(unix_micros(max_ts) - unix_micros(last_p))" +
          " div 86400000000").as("recency_days"),
        col("frequency"), col("monetary_c"),
        expr("(unix_micros(max_ts) - unix_micros(first_ts))" +
          " div 86400000000").as("tenure_days"),
        expr("n_err * 1000000 div n_ev").as("error_ppm"))
      .orderBy(col("monetary_c").desc, col("user_id"))
      .limit(100)
  }

  def rfmFeaturesOracle: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) ts, event_type,
      |    CAST(round(value * 100) AS BIGINT) cents
      |  FROM events),
      |mx AS (SELECT MAX(ts) max_ts FROM ev),
      |u AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'purchase' THEN ts END) last_p,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) frequency,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents
      |      ELSE 0 END) AS BIGINT) monetary_c,
      |    MIN(ts) first_ts,
      |    CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS BIGINT) n_err,
      |    CAST(COUNT(*) AS BIGINT) n_ev
      |  FROM ev GROUP BY 1)
      |SELECT user_id,
      |  epoch_us(max_ts - last_p) // 86400000000 recency_days,
      |  frequency, monetary_c,
      |  epoch_us(max_ts - first_ts) // 86400000000 tenure_days,
      |  n_err * 1000000 // n_ev error_ppm
      |FROM u, mx WHERE last_p IS NOT NULL
      |ORDER BY monetary_c DESC, user_id LIMIT 100""".stripMargin

  /** `source_coverage_greedy`: greedy maximum-coverage source
    * selection — pick 5 of the corpus's sources maximizing cumulative
    * DISTINCT trigram-shingle coverage, the "which feeds do I license
    * under a budget" question (`mix_allocate` decides proportions
    * among CHOSEN sources; `source_overlap_matrix` measures pairwise
    * redundancy; this makes the pick, with the classical (1−1/e)
    * guarantee). Exact greedy, not sketched: each round scores every
    * remaining source by its anti-joined novel-shingle count and
    * takes the max (source-name tie-break); per round emits the pick,
    * its marginal gain, and the running covered total — the coverage
    * CURVE, so the budget cutoff is a read, not a rerun.
    *
    * The 5 argmax reads are 1-row collects (the hits/bom_rollup
    * bounded driver-arithmetic exception — round count is a
    * constant, never data-sized). Plan shape (round 11, guide §2.4):
    * the per-shingle SOURCE BITMASK collapses the whole greedy to one
    * shingle-grain aggregate. `bit_or` is duplicate-insensitive, so
    * the old (source, shingle) `distinct` AND the per-round
    * covered-set anti-joins all disappear: one groupBy(shingle) →
    * bit_or(source bit), one groupBy(mask) → count, and the 5 rounds
    * run over the mask-grain rollup (≤ #distinct source-co-occurrence
    * combinations — combinatorially bounded by the source count, not
    * the corpus). gain(s | covered) = Σ cnt[m] over masks with bit s
    * set and m ∩ covered = ∅ — exactly the old anti-joined novel-
    * shingle count, same (gain desc, source asc) tie-break. At
    * 100 TB: ONE pass over the shingle grain instead of a persisted
    * copy + 5 anti-join/aggregate rounds. Source cardinality is a
    * corpus property (licensed feeds), required ≤ 63 so masks fit one
    * int64 — the REQUIRE fails loudly, never silently degrades.
    */
  def sourceCoverageGreedy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ss = Dedup.shingles(spark, dir)
      .join(
        Tables.read(spark, dir, "documents")
          .select(col("doc_id"), col("source")),
        "doc_id")
    // stable source → bit mapping (sorted ascending, so the mapping —
    // and every mask — is deterministic across runs and partitionings).
    // Sources come from the doc-grain table directly — no shingle
    // explode; a source whose documents yield no shingles gets a bit
    // but appears in no mask, so it can never be picked (exactly the
    // old behavior, where it never entered the posting relation).
    val srcs = Tables.read(spark, dir, "documents")
      .select(col("source")).distinct()
      .orderBy(col("source")).as[String].collect()
    require(
      srcs.length <= 63,
      s"source_coverage_greedy bitmask supports <= 63 sources, got " +
        s"${srcs.length}: widen to a 2-word mask before raising the cap")
    val dim = srcs.zipWithIndex
      .map { case (s, i) => (s, 1L << i) }.toSeq.toDF("source", "bit")
    // input-derived cache layout (guide §2.2, the pagerank lesson):
    // the mask rollup is combinatorially bounded and BYTES-tiny at
    // bench scale, but a 32-micro-partition persist charges fixed
    // per-task overhead to every one of the 5 greedy rounds; one
    // partition per 128 MB of source documents keeps the scan cheap
    // locally and grows with the corpus.
    val masks = ss.join(broadcast(dim), "source")
      .groupBy(col("shingle"))
      .agg(expr("bit_or(bit)").as("m"))
      .groupBy(col("m")).agg(count(lit(1)).as("cnt"))
      .coalesce(Tables.cacheParts(Tables.inputBytes(spark, dir, "documents")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var picked = Vector.empty[(Long, String, Long, Long)]
    var coveredTotal = 0L
    var covered = 0L
    try {
      for (r <- 1 to 5) {
        // ONE two-stage job per round: every source's gain as a
        // separate conditional-sum column over the uncovered masks
        // (source cardinality is ≤ 63 by the REQUIRE, so the row is
        // bounded-width driver arithmetic). A picked source's masks
        // all intersect `covered`, so its column goes NULL and it can
        // never be re-picked — the old !isin exclusion. sum(when) is
        // NULL exactly when the old groupBy had no row for the
        // source, and a present gain is ≥ 1 (cnt ≥ 1), so the -1
        // sentinel can never collide with a real gain.
        val gainCols = srcs.indices.map { i =>
          sum(when(col("m").bitwiseAND(lit(1L << i)) =!= 0, col("cnt")))
            .as(s"g$i")
        }
        // `covered` rides a broadcast 1-row dim instead of a literal:
        // the per-round plan is then STRUCTURALLY identical (only the
        // LocalRelation data changes), so rounds 2-5 hit the codegen
        // class cache instead of Janino-recompiling the 63-expression
        // aggregate each round (measured ~150 ms/round of driver gap).
        val row = masks
          .crossJoin(broadcast(Seq(covered).toDF("cov")))
          .where(col("m").bitwiseAND(col("cov")) === 0)
          .agg(gainCols.head, gainCols.tail: _*)
          .collect()(0)
        val gains = srcs.indices
          .map(i => if (row.isNullAt(i)) -1L else row.getLong(i))
        require(gains.max >= 0, s"greedy round $r: no uncovered source")
        // maxBy keeps the FIRST index at the max; srcs is sorted
        // ascending, so ties resolve (gain desc, source asc) — the
        // old orderBy tie-break
        val bi = gains.indices.maxBy(gains)
        coveredTotal += gains(bi)
        covered |= 1L << bi
        picked :+= ((r.toLong, srcs(bi), gains(bi), coveredTotal))
      }
    } finally masks.unpersist()
    picked.toDF("round", "source", "gain", "covered_total")
  }

  def sourceCoverageGreedyOracle: String = {
    val rounds = (1 to 5).map { r =>
      val prevPicks = (1 until r).map(i => s"SELECT source FROM p$i")
        .mkString(" UNION ALL ")
      val notPicked =
        if (r == 1) ""
        else s"WHERE source NOT IN ($prevPicks)" +
          s" AND shingle NOT IN (SELECT shingle FROM c${r - 1})"
      // every c/ss CTE is MATERIALIZED: c_r references c_{r-1} and
      // g_r references both, so inlined CTEs re-evaluate the shingle
      // explode exponentially (measured: a 78 GB spill at sf1)
      val cov =
        if (r == 1)
          "c1 AS MATERIALIZED (" +
            "SELECT DISTINCT shingle FROM ss JOIN p1 USING (source))"
        else s"c$r AS MATERIALIZED (SELECT shingle FROM c${r - 1} UNION " +
          s"SELECT shingle FROM ss JOIN p$r USING (source))"
      s"""g$r AS (
         |  SELECT source, CAST(COUNT(*) AS BIGINT) gain FROM ss
         |  $notPicked GROUP BY 1),
         |p$r AS (
         |  SELECT source, gain FROM g$r
         |  ORDER BY gain DESC, source LIMIT 1),
         |$cov""".stripMargin
    }.mkString(",\n")
    val out = (1 to 5).map { r =>
      s"SELECT CAST($r AS BIGINT) round, source, gain," +
        s" (SELECT CAST(COUNT(*) AS BIGINT) FROM c$r) covered_total FROM p$r"
    }.mkString(" UNION ALL ")
    s"""WITH ${Dedup.ShinglesSql},
       |ss AS MATERIALIZED (
       |  SELECT DISTINCT d.source, sh.shingle
       |  FROM sh JOIN documents d USING (doc_id)),
       |$rounds
       |SELECT * FROM ($out) ORDER BY round""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef(
      "source_coverage_greedy", sourceCoverageGreedy,
      Some(sourceCoverageGreedyOracle)),
    QueryDef("rfm_features", rfmFeatures, Some(rfmFeaturesOracle)),
    QueryDef("time_split_cv", timeSplitCv, Some(timeSplitCvOracle)),
    QueryDef("target_encoding", targetEncoding, Some(targetEncodingOracle)),
    QueryDef(
      "feature_hash_collisions", featureHashCollisions,
      Some(featureHashCollisionsOracle)),
    QueryDef("quota_sample", quotaSample, Some(quotaSampleOracle)),
    QueryDef("bpe_train", bpeTrain, Some(bpeTrainOracle)),
    QueryDef("bpe_apply", bpeApply, Some(bpeApplyOracle)),
    QueryDef("dataset_card", datasetCard, Some(datasetCardOracle)),
    QueryDef(
      "negative_sampling", negativeSampling, Some(negativeSamplingOracle)),
    QueryDef("mlm_mask", mlmMask, Some(mlmMaskOracle)),
    QueryDef(
      "quality_classifier", qualityClassifier,
      Some(qualityClassifierOracle)),
    QueryDef("weighted_sample", weightedSample, Some(weightedSampleOracle)),
    QueryDef("zscore_normalize", zscoreNormalize, Some(zscoreNormalizeOracle)),
    QueryDef("winsorize", winsorize, Some(winsorizeOracle)),
    QueryDef("decontaminate", decontaminate, Some(decontaminateOracle)),
    QueryDef("stratified_sample", stratifiedSample, Some(stratifiedSampleOracle)),
    QueryDef("length_buckets", lengthBuckets, Some(lengthBucketsOracle)),
    QueryDef("pack_sequences", packSequences, Some(packSequencesOracle)),
    QueryDef("corpus_clean", corpusClean, Some(corpusCleanOracle)),
    QueryDef("domain_mix", domainMix, Some(domainMixOracle)),
    QueryDef("mix_allocate", mixAllocate, Some(mixAllocateOracle)),
    QueryDef("curation_funnel", curationFunnel, Some(curationFunnelOracle)),
    QueryDef("pii_scrub", piiScrub, Some(piiScrubOracle)),
    QueryDef("epoch_shuffle", epochShuffle, Some(epochShuffleOracle)))
}
