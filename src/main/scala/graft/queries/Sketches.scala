package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-independent cardinality / frequency sketches whose ESTIMATES
  * are themselves deterministic and therefore hash-pinnable: the hash
  * is content-derived (md5 — no RNG state), partial states are sets /
  * sums (merge-order invariant), and the only float is one final
  * closed-form scalar both engines evaluate over identical integer
  * operands. This is the property `sketch_distinct` (HLL) can only
  * approximate with error-bound booleans; KMV and Count-Min replayed
  * from first principles pin the estimates exactly.
  *
  * Reference context: the reference keeps exact per-subsystem counters
  * (`evtstrd/stats.py` — tiny domains). At 100 TB the distinct-user /
  * frequency questions those counters answer need sketches; these two
  * queries are the mergeable forms of that stats surface.
  */
object Sketches {

  private val K = 64 // minima kept per segment (KMV)
  private val HashSpace = 1152921504606846976L // 2^60: 15 md5 hex chars
  private val SegA = "1-URGENT"
  private val SegB = "2-HIGH"

  private def custHash = // 60-bit content hash of the customer key
    conv(substring(md5(col("o_custkey").cast("string")), 1, 15), 16, 10)
      .cast("long")

  /** KMV (k-minimum-values) distinct sketch over customers per order
    * priority, PLUS the set-operation estimates HLL structurally can't
    * give: union (k smallest of the merged minima, same estimator) and
    * intersection (Beyer et al.: ρ = union-minima seen in both sides,
    * est = ρ·est_union/k). Every estimate sits beside its exact count.
    *
    * Scale shape: ONE distinct shuffle over (segment, hash), then the
    * rank<=k filter plans WindowGroupLimit (map-side partial k-minima
    * — the `group_topk` pattern, safe on a 5-value key); everything
    * downstream operates on the <=5·k-row minima relation. At 100 TB
    * the sketch build moves only distinct pairs and the merge phase is
    * driver-free arithmetic on ~320 rows.
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    // ONE distinct (seg, custkey) relation, hashed after the dedup,
    // feeds the sketch AND every exact baseline (round 12): the old
    // plan scanned orders four times — sketch pairs, per-seg exact,
    // union exact, intersection exact — with per-row md5 on the
    // sketch side and three countDistinct Expand rewrites on the
    // exact side. Distinct keys are all any consumer needs (duplicate
    // rows can't change minima or distinct counts), and hashing after
    // the distinct runs md5 once per distinct pair, not once per row.
    val base = Tables.read(spark, dir, "orders")
      .select(col("o_orderpriority").as("seg"), col("o_custkey"))
      .distinct()
      .select(col("seg"), col("o_custkey"), custHash.as("h"))
      .localCheckpoint(eager = false) // sketch + 3 exact baselines
    // distinct again on (seg, h): collisions inside a segment must
    // collapse to one row exactly as hashing-before-distinct did
    val pairs = base.select(col("seg"), col("h")).distinct()
    val w = Window.partitionBy(col("seg")).orderBy(col("h"))
    val mins = pairs.withColumn("rn", row_number().over(w))
      .where(col("rn") <= K)
      .select("seg", "h")

    // θ = k-th smallest ⇒ est = floor((k-1)·|space|/θ); a segment with
    // fewer than k distinct hashes retained them ALL ⇒ est is exact.
    def estimate(nMin: org.apache.spark.sql.Column, theta: org.apache.spark.sql.Column) =
      when(nMin < K, nMin).otherwise(
        floor(lit((K - 1).toDouble) * lit(HashSpace.toDouble) /
          theta.cast("double")).cast("long"))

    val perSeg = mins.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_min"), max(col("h")).as("theta"))
      .select(col("seg"), estimate(col("n_min"), col("theta")).as("est"))
    val exactSeg = base.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_exact"))
    val segRows = exactSeg.join(perSeg, "seg")
      .select(col("seg").as("set_expr"), col("n_exact"), col("est"))

    // Union/intersection of two priorities from the two minima sets
    // alone (the mergeable-summary property): k smallest of A∪B minima
    // with a both-sides flag.
    val u = mins.where(col("seg").isin(SegA, SegB))
      .groupBy(col("h")).agg(countDistinct(col("seg")).as("nseg"))
      .orderBy(col("h")).limit(K)
    val uAgg = u.agg(
      count(lit(1)).as("n_u"),
      max(col("h")).as("theta_u"),
      sum((col("nseg") === 2).cast("long")).as("rho"))
      .select(
        estimate(col("n_u"), col("theta_u")).as("est_u"),
        col("n_u"), col("rho"))
    val unionExact = base.where(col("seg").isin(SegA, SegB))
      .select(col("o_custkey")).distinct()
      .agg(count(lit(1)).as("n_exact"))
    val interExact = base.where(col("seg").isin(SegA, SegB))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("np"))
      .where(col("np") === 2)
      .agg(count(lit(1)).as("n_exact"))

    val unionRow = unionExact.crossJoin(uAgg).select(
      lit(s"union:$SegA|$SegB").as("set_expr"),
      col("n_exact"),
      col("est_u").as("est"))
    // ρ of n_u union minima land in the intersection ⇒ scale est_u by
    // ρ/k; when the union kept fewer than k minima both sides are
    // complete and ρ IS the exact intersection.
    val interRow = interExact.crossJoin(uAgg).select(
      lit(s"intersect:$SegA|$SegB").as("set_expr"),
      col("n_exact"),
      when(col("n_u") < K, col("rho"))
        .otherwise(expr(s"(rho * est_u) div $K")).as("est"))

    segRows.unionByName(unionRow).unionByName(interRow)
      .orderBy("set_expr")
  }

  def kmvDistinctOracle: String =
    s"""WITH pairs AS (
      |  SELECT DISTINCT o_orderpriority seg,
      |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT h
      |  FROM orders),
      |mins AS (
      |  SELECT seg, h FROM (
      |    SELECT seg, h, ROW_NUMBER() OVER (PARTITION BY seg ORDER BY h) rn
      |    FROM pairs) WHERE rn <= $K),
      |per AS (
      |  SELECT seg, CAST(COUNT(*) AS BIGINT) n_min, MAX(h) theta
      |  FROM mins GROUP BY seg),
      |est AS (
      |  SELECT seg, CASE WHEN n_min < $K THEN n_min
      |    ELSE CAST(FLOOR(${K - 1}.0 * $HashSpace.0 / CAST(theta AS DOUBLE)) AS BIGINT)
      |    END est FROM per),
      |exact AS (
      |  SELECT o_orderpriority seg, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) n_exact
      |  FROM orders GROUP BY 1),
      |u AS (
      |  SELECT h, COUNT(DISTINCT seg) nseg FROM mins
      |  WHERE seg IN ('$SegA', '$SegB') GROUP BY h ORDER BY h LIMIT $K),
      |uagg AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) n_u, MAX(h) theta_u,
      |    CAST(SUM(CASE WHEN nseg = 2 THEN 1 ELSE 0 END) AS BIGINT) rho
      |  FROM u),
      |uest AS (
      |  SELECT n_u, rho, CASE WHEN n_u < $K THEN n_u
      |    ELSE CAST(FLOOR(${K - 1}.0 * $HashSpace.0 / CAST(theta_u AS DOUBLE)) AS BIGINT)
      |    END est_u FROM uagg),
      |uexact AS (
      |  SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) n_exact FROM orders
      |  WHERE o_orderpriority IN ('$SegA', '$SegB')),
      |iexact AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) n_exact FROM (
      |    SELECT o_custkey FROM orders
      |    WHERE o_orderpriority IN ('$SegA', '$SegB')
      |    GROUP BY o_custkey HAVING COUNT(DISTINCT o_orderpriority) = 2))
      |SELECT seg set_expr, n_exact, est FROM exact JOIN est USING (seg)
      |UNION ALL
      |SELECT 'union:$SegA|$SegB', uexact.n_exact, uest.est_u FROM uexact, uest
      |UNION ALL
      |SELECT 'intersect:$SegA|$SegB', iexact.n_exact,
      |  CASE WHEN uest.n_u < $K THEN uest.rho
      |    ELSE (uest.rho * uest.est_u) // $K END
      |FROM iexact, uest
      |ORDER BY set_expr""".stripMargin

  // --- HyperLogLog: register-max cardinality, merge ≡ recompute ---

  private val HllP = 10 // register-index bits
  private val HllM = 1024 // 2^p registers
  private val HllW = 1125899906842624L // 2^50: suffix space below the index

  /** α_m·m²·2⁵¹ / S with S the EXACT integer Σ 2^(51−M_j): every
    * register term 2^(51−M_j) is an int64 (M_j ≤ 51), the sum over
    * 1024 registers is ≤ 2⁶¹, and the one float expression is *,/
    * only — IEEE-correctly-rounded, engine-identical. The small-range
    * (linear counting) branch is the suite's ONE data-dependent
    * logarithm: admissible because its domain is FINITE — V ∈ 1..1024
    * — and floor(1024·ln(1024/V)) was audited EXHAUSTIVELY over all
    * 1024 inputs against DuckDB's libm this session (identical on
    * every input; Wave14Spec re-pins the spot values). α_1024 is
    * spelled as its defining rational so both engines derive the
    * identical double. */
  private val HllEstSql =
    s"""CASE WHEN (0.7213 / (1.0 + 1.079 / 1024.0)) * 1048576.0
       |      * 2251799813685248.0 / CAST(s AS DOUBLE) <= 2560.0
       |    AND v > 0
       |  THEN CAST(floor(1024.0 * ln(1024.0 / CAST(v AS DOUBLE))) AS BIGINT)
       |  ELSE CAST(floor((0.7213 / (1.0 + 1.079 / 1024.0)) * 1048576.0
       |    * 2251799813685248.0 / CAST(s AS DOUBLE)) AS BIGINT) END"""
      .stripMargin.replace('\n', ' ').replaceAll(" +", " ")

  /** `hll_distinct`: HyperLogLog (p=10, 1024 registers) distinct
    * customers per order priority PLUS the union-by-register-max
    * merge — the mergeable-identity discipline of `minhash_merge` /
    * `countmin_merge` applied to the one sketch those two can't
    * replace (KMV `kmv_distinct` gives set ops but needs k minima
    * per group; HLL is 1024 bytes per group, period — the
    * per-dimension distinct-counter you actually ship at 100 TB).
    * Register: bucket = top 10 bits of the 60-bit md5 content hash
    * (the `kmv_distinct` hash), M_j = max over the group of
    * ρ(suffix) = 51 − bitlen(w) (bitlen via length(ltrim(bin(w),
    * '0')) — exact integers, no float anywhere in the register
    * build; w = 0 ⇒ ρ = 51). Union path 'merged' takes register-wise
    * MAX of the two segments' registers; path 'recomputed' rebuilds
    * from the filtered rows — identical by max-associativity, and the
    * hash PINS that identity (both rows must match the oracle).
    * err_ppm sits beside each estimate per the measured-error-gate
    * convention.
    *
    * Scale shape: ONE map-side-combinable aggregate to (seg, bucket)
    * — ≤ 5·1024 rows out of any input size — then arithmetic on the
    * register relation. The exact side is the audit column
    * (count-distinct), not the production path. At 100 TB the sketch
    * build is scan-bound with a 5 KiB reduce state.
    */
  def hllDistinct(spark: SparkSession, dir: String): DataFrame = {
    // ONE distinct (seg, custkey) relation feeds registers and every
    // exact baseline (round 12, the kmv_distinct restructure): the
    // registers are per-(seg, bucket) MAXima, so duplicate rows can't
    // change them — building from distinct keys gives bit-identical
    // registers while scanning orders once instead of four times and
    // hashing once per distinct pair instead of twice per row.
    val base = Tables.read(spark, dir, "orders")
      .select(col("o_orderpriority").as("seg"), col("o_custkey"))
      .distinct()
      .select(col("seg"), col("o_custkey"), custHash.as("h"))
      .localCheckpoint(eager = false) // registers + exact baselines
    val regs = base
      .select(col("seg"), col("h"))
      .select(
        col("seg"),
        expr(s"h div $HllW").as("bucket"),
        expr(s"h % $HllW").as("w"))
      .select(
        col("seg"), col("bucket"),
        when(col("w") === 0, lit(51L))
          .otherwise(lit(51L) - length(ltrim(bin(col("w")), "0")))
          .as("rho"))
      .groupBy(col("seg"), col("bucket"))
      .agg(max(col("rho")).as("mj"))
      .localCheckpoint(eager = false) // per-seg fold + union merge

    // S = Σ_present 2^(51−M_j) + (m − present)·2^51; V = empty registers.
    def fold(
        grouped: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
      grouped
      .agg(
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(51 - mj AS INT))"))
          .as("sp"),
        count(lit(1)).as("present"))
      .select(
        col("*"),
        (col("sp") +
          (lit(HllM.toLong) - col("present")) * lit(2251799813685248L))
          .as("s"),
        (lit(HllM.toLong) - col("present")).as("v"))
      .withColumn("est", expr(HllEstSql))

    val perSeg = fold(regs.groupBy(col("seg")))
      .select(col("seg"), col("est"))
    val exactSeg = base.groupBy(col("seg"))
      .agg(count(lit(1)).as("n_exact"))
    val segRows = exactSeg.join(perSeg, "seg")
      .select(
        col("seg").as("set_expr"), lit("direct").as("path"),
        col("n_exact"), col("est"))

    val uExact = base
      .where(col("seg").isin(SegA, SegB))
      .select(col("o_custkey")).distinct()
      .agg(count(lit(1)).as("n_exact"))
    // merged: register-wise max of the two segments' registers.
    val merged = fold(
      regs.where(col("seg").isin(SegA, SegB))
        .groupBy(col("bucket")).agg(max(col("mj")).as("mj"))
        .groupBy())
      .select(lit(s"union:$SegA|$SegB").as("set_expr"),
        lit("merged").as("path"), col("est"))
      .crossJoin(broadcast(uExact)) // 1-row exact: documented exception
      .select(col("set_expr"), col("path"), col("n_exact"), col("est"))
    // recomputed: registers rebuilt from the filtered (distinct) rows.
    val recomputed = fold(
      base.where(col("seg").isin(SegA, SegB))
        .select(col("h"))
        .select(
          expr(s"h div $HllW").as("bucket"), expr(s"h % $HllW").as("w"))
        .select(
          col("bucket"),
          when(col("w") === 0, lit(51L))
            .otherwise(lit(51L) - length(ltrim(bin(col("w")), "0")))
            .as("rho"))
        .groupBy(col("bucket")).agg(max(col("rho")).as("mj"))
        .groupBy())
      .select(lit(s"union:$SegA|$SegB").as("set_expr"),
        lit("recomputed").as("path"), col("est"))
      .crossJoin(broadcast(uExact))
      .select(col("set_expr"), col("path"), col("n_exact"), col("est"))

    segRows.unionByName(merged).unionByName(recomputed)
      .withColumn(
        "err_ppm",
        expr("abs(est - n_exact) * 1000000 div n_exact"))
      .orderBy("set_expr", "path")
  }

  def hllDistinctOracle: String = {
    val regCte =
      s"""SELECT seg, h // $HllW bucket,
         |    MAX(CASE WHEN h % $HllW = 0 THEN 51
         |      ELSE 51 - length(ltrim(bin(h % $HllW), '0')) END) mj
         |  FROM hashed GROUP BY 1, 2"""
    def foldSql(src: String, key: String) =
      s"""SELECT $key
         |    CAST(SUM(CAST(1 AS BIGINT) << (51 - mj)) AS BIGINT)
         |      + (1024 - CAST(COUNT(*) AS BIGINT)) * 2251799813685248 s,
         |    1024 - CAST(COUNT(*) AS BIGINT) v
         |  FROM $src ${if (key.nonEmpty) "GROUP BY seg" else ""}"""
    s"""WITH hashed AS (
       |  SELECT o_orderpriority seg,
       |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT h
       |  FROM orders),
       |regs AS (
       |  $regCte),
       |folded AS (
       |  ${foldSql("regs", "seg,")}),
       |per AS (SELECT seg, $HllEstSql est FROM folded),
       |exact AS (
       |  SELECT o_orderpriority seg,
       |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) n_exact
       |  FROM orders GROUP BY 1),
       |mregs AS (
       |  SELECT bucket, MAX(mj) mj FROM regs
       |  WHERE seg IN ('$SegA', '$SegB') GROUP BY 1),
       |mfold AS (${foldSql("mregs", "")}),
       |mest AS (SELECT $HllEstSql est FROM mfold),
       |uexact AS (
       |  SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) n_exact
       |  FROM orders WHERE o_orderpriority IN ('$SegA', '$SegB'))
       |SELECT set_expr, path, n_exact, est,
       |  abs(est - n_exact) * 1000000 // n_exact err_ppm
       |FROM (
       |  SELECT seg set_expr, 'direct' path, n_exact, est
       |  FROM exact JOIN per USING (seg)
       |  UNION ALL
       |  SELECT 'union:$SegA|$SegB', 'merged', uexact.n_exact, mest.est
       |  FROM uexact, mest
       |  UNION ALL
       |  SELECT 'union:$SegA|$SegB', 'recomputed', uexact.n_exact, mest.est
       |  FROM uexact, mest)
       |ORDER BY set_expr, path""".stripMargin
  }

  private val D = 3 // Count-Min hash rows
  private val W = 64 // Count-Min cells per row

  private def cmCell(d: org.apache.spark.sql.Column, key: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(d.cast("string"), lit(":"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % W

  /** Count-Min frequency estimates for sampled users: d=3 salted-md5
    * rows × w=64 cells, est(key) = min over rows of its cell sum.
    * Cell counts are plain sums (order-independent ⇒ the estimates are
    * deterministic, unlike sampled counters), so the values hash-pin
    * and the structural guarantee — CM never underestimates — pins as
    * an always-true boolean beside exact counts.
    *
    * Scale shape: one pass over events with a ×d Expand collapsing
    * map-side into ≤ d·w cells per partition; the final sketch is 192
    * rows broadcast to the probe side. The exact-count column is the
    * oracle baseline, not part of the production sketch path.
    */
  def countminFreq(spark: SparkSession, dir: String): DataFrame = {
    // spread tried and REVERTED (round 12, the sample_extrapolate
    // lesson): three salted md5s per event are too cheap to amortize
    // the extra exchange of the raw rows (matched-calibration A/B
    // 0.80 -> 0.99 s); the ×d cells collapse map-side either way
    val ev = Tables.events(spark, dir)
    val ds = array((0 until D).map(lit): _*)
    val cells = ev
      .select(explode(ds).as("d"), col("user_id"))
      .groupBy(col("d"), cmCell(col("d"), col("user_id")).as("cell"))
      .agg(count(lit(1)).as("cnt"))
    val keys = ev.where(col("user_id") % 10 === 0)
      .groupBy(col("user_id")).agg(count(lit(1)).as("exact_cnt"))
    val probes = keys.select(col("user_id"), explode(ds).as("d"))
      .withColumn("cell", cmCell(col("d"), col("user_id")))
    val est = probes.join(broadcast(cells), Seq("d", "cell"))
      .groupBy(col("user_id")).agg(min(col("cnt")).as("cm_est"))
    keys.join(est, "user_id")
      .select(
        col("user_id"), col("exact_cnt"), col("cm_est"),
        (col("cm_est") >= col("exact_cnt")).as("is_overestimate"))
      .orderBy("user_id")
  }

  /** The Count-Min relation's DuckDB CTEs (ds/cells/keys/probes/est),
    * shared by [[countminFreq]]'s oracle and the error-economics gate
    * [[countminError]]'s, so the two can never probe different
    * sketches.
    */
  private def cmCtes: String =
    s"""ds AS (SELECT UNNEST([0, 1, 2]) d),
      |cells AS (
      |  SELECT d,
      |    ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % $W cell,
      |    CAST(COUNT(*) AS BIGINT) cnt
      |  FROM events, ds GROUP BY 1, 2),
      |keys AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) exact_cnt FROM events
      |  WHERE user_id % 10 = 0 GROUP BY 1),
      |probes AS (
      |  SELECT user_id, d,
      |    ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % $W cell
      |  FROM keys, ds),
      |est AS (
      |  SELECT user_id, MIN(cnt) cm_est FROM probes JOIN cells USING (d, cell)
      |  GROUP BY 1)""".stripMargin

  def countminFreqOracle: String =
    s"""WITH $cmCtes
      |SELECT user_id, exact_cnt, cm_est, cm_est >= exact_cnt AS is_overestimate
      |FROM keys JOIN est USING (user_id) ORDER BY user_id""".stripMargin

  /** `countmin_error`: the error ECONOMICS of the Count-Min sketch —
    * the sketch member of the measured answer-quality battery
    * (`bloom_fpp` = what the Bloom bits cost, `minhash_estimate` =
    * what the 8-hash signature costs, this = what the w=$W-cell width
    * costs): over the sampled probe keys, the overestimate
    * distribution (CM never underestimates — pinned per key by
    * countmin_freq) summarized as exact-hit count, max and mean
    * additive error, the classic e·N/w Markov bound in whole counts,
    * and how many keys landed within it (the ≥ 1−1/e^d guarantee made
    * a measured number). e is spliced as the pinned micro literal
    * 2718282 — both engines floor the same integers, no transcendental
    * at eval time.
    *
    * Plan: [[countminFreq]]'s relation (probe-keys-sized) + a 1-row
    * event count, ONE fold. int64: e_micro·N caps at ~3.4·10¹²
    * events — beyond the 100 TB event-table row count only if rows
    * shrink below ~30 bytes; overflow fails loudly under ANSI.
    */
  def countminError(spark: SparkSession, dir: String): DataFrame = {
    val tot = Tables.events(spark, dir).agg(count(lit(1)).as("n_ev"))
    countminFreq(spark, dir)
      .crossJoin(broadcast(tot)) // 1-row total: documented exception
      .select((col("cm_est") - col("exact_cnt")).as("err"), col("n_ev"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("err") === 0, 1L).otherwise(0L)).as("n_exact"),
        max(col("err")).as("max_err"),
        sum(col("err")).as("sum_err"),
        sum(when(expr(s"err * 1000000 * $W <= 2718282 * n_ev"), 1L)
          .otherwise(0L)).as("n_within"),
        max(col("n_ev")).as("n_ev"))
      .select(
        col("n_keys"), col("n_exact"), col("max_err"),
        expr("sum_err * 1000 div n_keys").as("avg_err_milli"),
        expr(s"2718282 * n_ev div (1000000 * $W)").as("bound"),
        col("n_within"))
  }

  def countminErrorOracle: String =
    s"""WITH $cmCtes,
      |pk AS (
      |  SELECT cm_est - exact_cnt err
      |  FROM keys JOIN est USING (user_id)),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) n_ev FROM events)
      |SELECT CAST(COUNT(*) AS BIGINT) n_keys,
      |  CAST(SUM(CASE WHEN err = 0 THEN 1 ELSE 0 END) AS BIGINT) n_exact,
      |  CAST(MAX(err) AS BIGINT) max_err,
      |  CAST(SUM(err) AS BIGINT) * 1000 // COUNT(*) avg_err_milli,
      |  2718282 * n_ev // (1000000 * $W) bound,
      |  CAST(SUM(CASE WHEN err * 1000000 * $W <= 2718282 * n_ev
      |    THEN 1 ELSE 0 END) AS BIGINT) n_within
      |FROM pk CROSS JOIN tot
      |GROUP BY n_ev""".stripMargin

  /** `bitmap_distinct`: EXACT distinct customers per order priority
    * through the mergeable bitmap aggregate
    * ([[graft.functions.BitmapDistinct]]) — the exact sibling of the
    * KMV estimate above, next to the built-in `count(distinct)` the
    * oracle states. Update = set-bit, merge = OR, eval = popcount:
    * order/partitioning-invariant, so the exact answer is
    * reproducible under any merge tree.
    *
    * Plan shape: ONE hash aggregate, map-side combinable — each map
    * task dedups into a local bitset and ships one buffer per
    * (task, priority), where the built-in distinct plans an Expand
    * plus a shuffle of every distinct (priority, custkey) pair. At
    * 100 TB with surrogate-key domains this is the
    * `bitmap_count_distinct` warehouses reach for; BitmapSpec pins
    * agg == count(distinct) and merge-tree invariance across
    * repartitionings.
    */
  def bitmapDistinctQ(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BitmapFunctions.bitmapDistinct
    Tables.read(spark, dir, "orders")
      .groupBy(col("o_orderpriority").as("seg"))
      .agg(bitmapDistinct(col("o_custkey")).as("n_customers"))
      .orderBy("seg")
  }

  def bitmapDistinctOracle: String =
    """SELECT o_orderpriority AS seg,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  /** Slice width for `sliding_distinct`: 6 hours in micros. */
  private val SliceUs = 21600000000L

  /** `sliding_distinct`: exact distinct users per 24-hour window
    * sliding by 6 hours — the classic OVERLAPPING-window distinct,
    * which plain aggregation can't express (distinct counts are
    * non-additive) and naive plans solve by re-scanning the fact
    * table once per overlap factor. Here the fact table is scanned
    * ONCE into per-6h-slice bitmap values ([[graft.functions
    * .BitmapValueAgg]]); each slice then fans out to the 4 windows
    * covering it and an OR-merge + popcount ([[graft.functions
    * .BitmapOrAgg]] / [[graft.functions.BitmapCount]]) produces the
    * exact count — distinct made additive by carrying the SET as a
    * mergeable value (the Snowflake BITMAP_AGG / ClickHouse
    * groupBitmapState pattern).
    *
    * Plan shape: one fact-level aggregate to slice bitmaps
    * (map-side combinable), then everything operates on the
    * slice-count-sized relation (4× explode of ~120 rows). At
    * 100 TB the overlap factor multiplies 16-KB bitmaps, not events.
    */
  def slidingDistinct(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BitmapFunctions._
    val slices = Tables.events(spark, dir)
      .select(
        expr(s"unix_micros(ts) div $SliceUs").as("slice"), col("user_id"))
      .groupBy("slice")
      .agg(
        bitmapAgg(col("user_id")).as("bm"),
        count(lit(1)).as("n_ev"))
    slices
      .select(
        explode(sequence(col("slice") - 3, col("slice"))).as("w"),
        col("bm"), col("n_ev"))
      .groupBy("w")
      .agg(
        bitmapCount(bitmapOr(col("bm"))).as("n_users"),
        sum(col("n_ev")).as("n_events"))
      .select(
        (col("w") * SliceUs).as("window_start_us"),
        col("n_users"), col("n_events"))
      .orderBy("window_start_us")
  }

  def slidingDistinctOracle: String =
    s"""WITH e AS (
       |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // $SliceUs AS s, user_id
       |  FROM events),
       |wx AS (SELECT unnest(range(s - 3, s + 1)) w, user_id FROM e)
       |SELECT w * $SliceUs AS window_start_us,
       |  CAST(count(DISTINCT user_id) AS BIGINT) n_users,
       |  CAST(count(*) AS BIGINT) n_events
       |FROM wx GROUP BY 1 ORDER BY 1""".stripMargin

  /** `minhash_merge`: the map-side-combinability identity of the
    * minwise sketch — the property that makes MinHash usable at
    * 100 TB at all. Each source shard computes its own 4-slot token
    * signature (min of md5(h|token) per hash, lexicographic on the
    * hex — the engine-portable minwise family `minhash_lsh` uses);
    * the corpus signature then arrives TWO ways: (a) elementwise min
    * over the 20 per-shard signatures — a 20-row merge that never
    * re-reads a document — and (b) recomputed directly from the
    * global token relation. Both rows surface, so the oracle pins
    * merge ≡ recompute rather than trusting it. `agree_k` (slots
    * where a shard's signature equals the merged corpus signature,
    * the Broder resemblance estimator's vote count) rides along per
    * shard from a broadcast join against the 1-row merged signature.
    *
    * Plan shape: ONE distinct shuffle over (source, token); the
    * per-shard signature is a 20-row aggregate, and every path after
    * operates on signature-sized relations. At 100 TB new shards
    * extend the corpus signature by merging 32-byte rows.
    */
  def minhashMerge(spark: SparkSession, dir: String): DataFrame = {
    val H = 4
    // materialized ONCE: the per-shard and direct-corpus signature
    // paths both consume it — without the checkpoint each would
    // re-run the scan+explode+distinct
    val toks = Tables.read(spark, dir, "documents")
      .select(
        col("source"),
        explode(filter(split(col("text"), "\\s+"), t => t =!= ""))
          .as("tok"))
      .distinct()
      .localCheckpoint()
    def mh(h: Int) = min(md5(concat(lit(s"$h|"), col("tok")))).as(s"mh$h")
    def mergeMin(h: Int) = min(col(s"mh$h")).as(s"mh$h")
    val per = toks.groupBy(col("source")).agg(mh(0), (1 until H).map(mh): _*)
    val merged = per.groupBy()
      .agg(mergeMin(0), (1 until H).map(mergeMin): _*)
      .select(lit("corpus_merged").as("scope"), col("mh0"), col("mh1"),
        col("mh2"), col("mh3"))
    val direct = toks.groupBy()
      .agg(mh(0), (1 until H).map(mh): _*)
      .select(lit("corpus_direct").as("scope"), col("mh0"), col("mh1"),
        col("mh2"), col("mh3"))
    val mergedSig = merged.select(
      (0 until H).map(h => col(s"mh$h").as(s"c$h")): _*)
    val shardRows = per.crossJoin(broadcast(mergedSig))
      .select(
        col("source").as("scope"), col("mh0"), col("mh1"), col("mh2"),
        col("mh3"),
        (0 until H).map(h =>
          (col(s"mh$h") === col(s"c$h")).cast("long"))
          .reduce(_ + _).as("agree_k"))
    shardRows
      .unionByName(merged.withColumn("agree_k", lit(4L)))
      .unionByName(direct.withColumn("agree_k", lit(4L)))
      .orderBy("scope")
  }

  def minhashMergeOracle: String = {
    val slots = (0 until 4).map(h =>
      s"min(md5('$h|' || tok)) mh$h").mkString(", ")
    val mins = (0 until 4).map(h => s"min(mh$h) mh$h").mkString(", ")
    s"""WITH toks AS (
       |  SELECT DISTINCT source,
       |    unnest(list_filter(regexp_split_to_array(text, '\\s+'),
       |      x -> x <> '')) tok
       |  FROM documents),
       |per AS (SELECT source, $slots FROM toks GROUP BY source),
       |merged AS (SELECT $mins FROM per),
       |direct AS (SELECT $slots FROM toks)
       |SELECT p.source AS scope, p.mh0, p.mh1, p.mh2, p.mh3,
       |  CAST((p.mh0 = m.mh0)::INT + (p.mh1 = m.mh1)::INT +
       |       (p.mh2 = m.mh2)::INT + (p.mh3 = m.mh3)::INT AS BIGINT) agree_k
       |FROM per p, merged m
       |UNION ALL SELECT 'corpus_merged', mh0, mh1, mh2, mh3,
       |  CAST(4 AS BIGINT) FROM merged
       |UNION ALL SELECT 'corpus_direct', mh0, mh1, mh2, mh3,
       |  CAST(4 AS BIGINT) FROM direct
       |ORDER BY scope""".stripMargin
  }

  /** `bitmap_rollup_merge`: distinct-count ROLLUP along the geography
    * hierarchy (nation → region → corpus) where only the LEAF level
    * ever touches the fact table — the upper levels re-merge the 25
    * serialized nation bitmaps (`BitmapOrAgg`), the warehouse pattern
    * for materialized distinct sketches: build per fine slice once,
    * answer every coarser rollup from the stored sketch. The oracle
    * replays all three levels as independent COUNT(DISTINCT) passes,
    * so the rollup path (bitmap OR then popcount) is pinned against
    * the flat recompute at every level, not just the leaves.
    *
    * Plan shape: one fact aggregate to nation bitmaps (map-side
    * combinable containers; customer/nation/region dims broadcast),
    * then region and corpus levels are container arithmetic on a
    * 25-row relation. At 100 TB the rollup cost is bitmap bytes,
    * not events — and the same stored bitmaps answer any other
    * grouping of nations for free.
    */
  def bitmapRollupMerge(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BitmapFunctions._
    val custGeo = Tables.read(spark, dir, "customer")
      .join(
        broadcast(Tables.read(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(
        broadcast(Tables.read(spark, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("n_name"), col("r_name"))
    val nations = Tables.read(spark, dir, "orders")
      .join(broadcast(custGeo), col("o_custkey") === col("c_custkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(bitmapAgg(col("o_custkey")).as("bm"))
    val nationRows = nations.select(
      lit("1_nation").as("lvl"), col("n_name").as("grp"),
      bitmapCount(col("bm")).as("n_customers"))
    val regions = nations.groupBy(col("r_name"))
      .agg(bitmapOr(col("bm")).as("bm"))
    val regionRows = regions.select(
      lit("2_region").as("lvl"), col("r_name").as("grp"),
      bitmapCount(col("bm")).as("n_customers"))
    val corpusRow = regions.groupBy()
      .agg(bitmapCount(bitmapOr(col("bm"))).as("n_customers"))
      .select(lit("3_corpus").as("lvl"), lit("ALL").as("grp"),
        col("n_customers"))
    nationRows.unionByName(regionRows).unionByName(corpusRow)
      .orderBy("lvl", "grp")
  }

  def bitmapRollupMergeOracle: String =
    """WITH base AS (
      |  SELECT r_name, n_name, o_custkey
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey)
      |SELECT '1_nation' lvl, n_name grp,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) n_customers
      |FROM base GROUP BY n_name
      |UNION ALL
      |SELECT '2_region', r_name,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT)
      |FROM base GROUP BY r_name
      |UNION ALL
      |SELECT '3_corpus', 'ALL', CAST(count(DISTINCT o_custkey) AS BIGINT)
      |FROM base
      |ORDER BY lvl, grp""".stripMargin

  /** `countmin_merge`: the third mergeable-sketch identity (after
    * minhash_merge's elementwise-min and bitmap_rollup_merge's OR) —
    * Count-Min merge is CELL-WISE ADDITION, so a corpus CMS equals
    * the sum of per-day shard CMSes. Both paths are emitted as rows
    * (scope = 'sharded_merge' vs 'direct') with the full counter
    * array pinched into exact integer invariants per hash row —
    * occupied cells, Σcnt, Σcell·cnt, Σcnt² — so ANY cell-level
    * divergence between merge and recompute lands in the hash check
    * (Σcnt² in particular breaks if mass moves between cells even
    * when totals agree). This is the property that makes CMS a
    * DISTRIBUTED sketch: map tasks build local arrays, the shuffle
    * carries D·W counters per task, and daily sketches roll up into
    * monthlies without touching raw events again. Plan: one
    * (day, d, cell) aggregate → one (d, cell) re-aggregate, both
    * map-side combinable; `direct` shares the exploded scan.
    */
  def countminMerge(spark: SparkSession, dir: String): DataFrame = {
    val ds = array((0 until D).map(lit): _*)
    val base = Tables.events(spark, dir)
      .select(
        to_date(col("ts")).cast("string").as("day"),
        explode(ds).as("d"), col("user_id"))
      .withColumn("cell", cmCell(col("d"), col("user_id")))
    val shardCells = base.groupBy(col("day"), col("d"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
    val merged = shardCells.groupBy(col("d"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))
      .withColumn("scope", lit("sharded_merge"))
    val direct = base.groupBy(col("d"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("scope", lit("direct"))
    merged.unionByName(direct)
      .groupBy(col("scope"), col("d"))
      .agg(
        count(lit(1)).as("n_cells"),
        sum(col("cnt")).as("total"),
        sum(col("cell") * col("cnt")).as("chk_cell"),
        sum(col("cnt") * col("cnt")).as("chk_sq"))
      .orderBy("scope", "d")
  }

  def countminMergeOracle: String =
    s"""WITH base AS (
       |  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS dt, d, user_id,
       |    ('0x' || substr(md5(CAST(d AS VARCHAR) || ':' ||
       |      CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % $W cell
       |  FROM events, (SELECT UNNEST([0, 1, 2]) d)),
       |shard AS (
       |  SELECT dt, d, cell, CAST(COUNT(*) AS BIGINT) cnt
       |  FROM base GROUP BY 1, 2, 3),
       |merged AS (
       |  SELECT 'sharded_merge' AS scope, d, cell,
       |    CAST(SUM(cnt) AS BIGINT) cnt
       |  FROM shard GROUP BY 2, 3),
       |direct AS (
       |  SELECT 'direct' AS scope, d, cell, CAST(COUNT(*) AS BIGINT) cnt
       |  FROM base GROUP BY 2, 3),
       |u AS (SELECT * FROM merged UNION ALL SELECT * FROM direct)
       |SELECT scope, d, CAST(COUNT(*) AS BIGINT) n_cells,
       |  CAST(SUM(cnt) AS BIGINT) total,
       |  CAST(SUM(cell * cnt) AS BIGINT) chk_cell,
       |  CAST(SUM(cnt * cnt) AS BIGINT) chk_sq
       |FROM u GROUP BY scope, d ORDER BY scope, d""".stripMargin

  /** `bloom_fpp`: the MEASURED false-positive gate for the Bloom
    * family — `bloom_prune_join` uses Spark's built-in filter for
    * pruning, but its error rate there is a hope, not a number. This
    * query builds a PORTABLE Bloom filter (k=3 salted-md5 hashes into
    * m = 8·n bits — the countmin_freq hash discipline, so DuckDB
    * replays it bit-for-bit), probes it with KNOWN NON-MEMBERS
    * (every customer key shifted past the key domain's max — a
    * deterministic negative set the same size as the dimension),
    * and reports the measured false-positive rate beside the
    * occupancy-based expectation. Both in integer ppm: fp_ppm is
    * exact; theory_ppm is the deterministic nested-floor form of
    * (set_bits/m)³ — both engines compute the identical expression,
    * so even the approximation is hash-pinned. The filter is
    * represented as its SET of occupied bit positions (≤ k·n rows) —
    * semantically identical to the bitmap, and the membership test
    * (all k positions occupied) becomes a positions join.
    *
    * Plan shape: one distinct over members, a 1-row max broadcast
    * manufactures the negative set (dim-sized), positions explode ×k, and ONE
    * position-keyed join probe-side; the per-probe all-k test is a
    * count==k aggregate co-partitioned with the join. At 100 TB the
    * filter side is k·|members| positions — the same order as the
    * bloom blob the built-in broadcasts, but queryable and mergeable
    * as a relation (shard filters union by... union).
    */
  def bloomFpp(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    val seeds = Seq(1, 2, 3)
    def posOf(key: Column, seed: Int): Column =
      conv(
        substring(
          md5(concat(lit(seed.toString), lit(":"), key.cast("string"))),
          1, 15),
        16, 10).cast("long")
    val members = Tables.read(spark, dir, "orders")
      .select(col("o_custkey").as("k")).distinct()
      .localCheckpoint(eager = false) // count + positions + anti join
    val maxK = members.agg(max(col("k")).as("mx"))
    val probes = Tables.read(spark, dir, "customer")
      .crossJoin(broadcast(maxK))
      .select((col("c_custkey") + col("mx")).as("k"))
      .localCheckpoint(eager = false) // count + probe positions
    val nM = members.agg(count(lit(1)).as("n_members"))
    val withM = nM.withColumn("m_bits", col("n_members") * 8L)
    // spread tried and REVERTED (round 12): the ×k seeded-md5 explode
    // is too cheap to amortize repartitioning the checkpointed inputs
    // (matched-calibration A/B 0.87 -> 1.09 s)
    def positions(df: DataFrame): DataFrame =
      df.crossJoin(broadcast(withM))
        .select(
          col("k"), col("m_bits"),
          explode(array(seeds.map(s =>
            pmod(posOf(col("k"), s), col("m_bits"))): _*)).as("pos"))
    val occupied = positions(members).select(col("pos")).distinct()
      .localCheckpoint(eager = false) // set-bit count + probe join
    val setBits = occupied.agg(count(lit(1)).as("set_bits"))
    val fp = positions(probes)
      .join(occupied, Seq("pos"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("hits"))
      .where(col("hits") === seeds.length)
      .agg(count(lit(1)).as("fp_count"))
    val nP = probes.agg(count(lit(1)).as("n_probes"))
    withM.crossJoin(broadcast(nP))
      .crossJoin(broadcast(setBits))
      .crossJoin(broadcast(fp))
      .select(
        col("n_members"), col("n_probes"), col("m_bits"), col("set_bits"),
        col("fp_count"),
        expr("fp_count * 1000000 div n_probes").as("fp_ppm"),
        expr("((set_bits * 1000000 div m_bits) * set_bits div m_bits)" +
          " * set_bits div m_bits").as("theory_ppm"))
  }

  def bloomFppOracle: String =
    """WITH members AS (SELECT DISTINCT o_custkey k FROM orders),
      |nm AS (SELECT CAST(COUNT(*) AS BIGINT) n_members,
      |    CAST(COUNT(*) AS BIGINT) * 8 m_bits FROM members),
      |mk AS (SELECT MAX(k) mx FROM members),
      |probes AS (SELECT c_custkey + mx k FROM customer, mk),
      |seeds AS (SELECT unnest([1, 2, 3]) s),
      |mpos AS (SELECT DISTINCT
      |    ('0x' || substr(md5(CAST(s AS VARCHAR) || ':' ||
      |      CAST(k AS VARCHAR)), 1, 15))::BIGINT % m_bits pos
      |  FROM members, seeds, nm),
      |sb AS (SELECT CAST(COUNT(*) AS BIGINT) set_bits FROM mpos),
      |ppos AS (SELECT k,
      |    ('0x' || substr(md5(CAST(s AS VARCHAR) || ':' ||
      |      CAST(k AS VARCHAR)), 1, 15))::BIGINT % m_bits pos
      |  FROM probes, seeds, nm),
      |fp AS (SELECT CAST(COUNT(*) AS BIGINT) fp_count FROM (
      |    SELECT p.k FROM ppos p JOIN mpos ON p.pos = mpos.pos
      |    GROUP BY p.k HAVING COUNT(*) = 3)),
      |np AS (SELECT CAST(COUNT(*) AS BIGINT) n_probes FROM probes)
      |SELECT n_members, n_probes, m_bits, set_bits, fp_count,
      |  fp_count * 1000000 // n_probes fp_ppm,
      |  ((set_bits * 1000000 // m_bits) * set_bits // m_bits)
      |    * set_bits // m_bits theory_ppm
      |FROM nm, np, sb, fp""".stripMargin

  /** `sample_extrapolate`: approximate query processing by
    * content-hash Bernoulli sampling — the 100 TB "answer in one
    * minute, not one hour" mode. A deterministic 1/16 sample (the
    * [[ContentHash]] bucket rule on the lineitem primary key — never
    * `rand()`, so the sample is identical across engines, runs, and
    * cluster sizes) rides the SAME scan as the exact aggregate via
    * conditional sums; the scaled estimates sit beside the exact
    * per-flag revenue with their signed-magnitude error in ppm. The
    * point of the query is the measured-error discipline applied to
    * sampling: the estimate is only as good as the error column says,
    * per group, and the hash pins both.
    *
    * Plan shape: ONE lineitem scan, one map-side-combinable hash
    * aggregate (the sample adds two conditional sums, not a second
    * scan); at 100 TB a real AQP deployment would PARTITION by the
    * sample bucket and read 1/16 of the files — the estimator and its
    * error surface are identical.
    */
  def sampleExtrapolate(spark: SparkSession, dir: String): DataFrame = {
    // NOT spread (round 12, measured): repartitioning the raw rows
    // before the per-row md5 bucket costs more than the hash
    // parallelization buys (1.17 -> 1.36 s A/B) — one md5 of a short
    // key string is too cheap to amortize an exchange of the rows,
    // unlike join_size_est's x4-exploded double-width hash.
    val li = Tables.read(spark, dir, "lineitem")
      .select(
        col("l_returnflag"),
        Quantize.cents(col("l_extendedprice")).as("cents"),
        (ContentHash.bucket(
          concat(col("l_orderkey"), lit(":"), col("l_linenumber")), 16) === 0)
          .as("s"))
    li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_exact"),
        sum(col("cents")).as("rev_exact"),
        (sum(when(col("s"), 1L).otherwise(0L)) * 16).as("n_est"),
        (sum(when(col("s"), col("cents")).otherwise(0L)) * 16).as("rev_est"))
      .select(
        col("l_returnflag"), col("n_exact"), col("n_est"),
        col("rev_exact"), col("rev_est"),
        expr("abs(n_est - n_exact) * 1000000 div n_exact").as("n_err_ppm"),
        expr("abs(rev_est - rev_exact) * 1000000 div rev_exact")
          .as("rev_err_ppm"))
      .orderBy("l_returnflag")
  }

  def sampleExtrapolateOracle: String = {
    val bucket = ContentHash.bucketSql(
      "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)",
      16)
    s"""WITH s AS (
       |  SELECT l_returnflag, ${Quantize.centsSql("l_extendedprice")} cents,
       |    $bucket = 0 s
       |  FROM lineitem),
       |g AS (
       |  SELECT l_returnflag,
       |    CAST(count(*) AS BIGINT) n_exact,
       |    CAST(SUM(cents) AS BIGINT) rev_exact,
       |    CAST(16 * SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) n_est,
       |    CAST(16 * SUM(CASE WHEN s THEN cents ELSE 0 END) AS BIGINT) rev_est
       |  FROM s GROUP BY 1)
       |SELECT l_returnflag, n_exact, n_est, rev_exact, rev_est,
       |  abs(n_est - n_exact) * 1000000 // n_exact n_err_ppm,
       |  abs(rev_est - rev_exact) * 1000000 // rev_exact rev_err_ppm
       |FROM g ORDER BY l_returnflag""".stripMargin
  }

  private val JsD = 4 // join-size sketch: independent hash rows
  private val JsW = 512 // join-size sketch: cells per row

  /** `join_size_est`: join-cardinality estimation from per-side
    * Count-Min rows. DISTINCT from `join_size_estimate`
    * ([[graft.queries.Statistics.joinSizeEstimate]]): that one is the
    * textbook |A|·|B|/max(d_A,d_B) formula from exact per-side
    * stats; this one estimates via the sketch inner product without
    * exact distinct counts — the sub-linear-memory variant of the
    * same planner question. The optimizer-statistics question ("how big is
    * events ⋈ orders on the customer key?") answered WITHOUT running
    * the join, by the sketch inner product Σ_b e[b]·o[b] (Alon-
    * Matias-Szegedy / Count-Min join-size estimator: an overestimate
    * for every hash row, tightest at the min over the $JsD rows). The
    * exact join count sits beside the d=min estimate and the
    * worst-row estimate, overshoot in ppm — the measured-error
    * discipline applied to the planner statistic itself.
    *
    * Plan shape: each side folds to a ≤ $JsD·$JsW-row sketch in ONE
    * map-side-combinable aggregate (never shuffling the fact rows by
    * key), the sketches broadcast-join on (row, cell), and the exact
    * side is one key-join count. At 100 TB the sketch pass reads each
    * side once with a 2048-cell accumulator — this is how a planner
    * would cost the join before committing to its shuffle.
    */
  def joinSizeEst(spark: SparkSession, dir: String): DataFrame = {
    val ds = array((0 until JsD).map(lit): _*)
    def cell(d: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
      conv(
        substring(
          md5(concat(d.cast("string"), lit(":"), k.cast("string"))), 1, 8),
        16, 10).cast("long") % JsW
    val e = Tables.events(spark, dir).select(col("user_id").as("k"))
    val o = Tables.read(spark, dir, "orders").select(col("o_custkey").as("k"))
    // spread the 1-col key relation before the ×4 explode + per-row
    // md5 (guide §2.5 heavy per-row map work in a single-row-group
    // scan; the filter_lang discipline) — identity at real scale
    def sketch(df: DataFrame, cnt: String) =
      Tables.spread(df.sparkSession, df)
        .select(explode(ds).as("d"), col("k"))
        .groupBy(col("d"), cell(col("d"), col("k")).as("cell"))
        .agg(count(lit(1)).as(cnt))
    val ests = sketch(e, "ce")
      .join(sketch(o, "co"), Seq("d", "cell"))
      .groupBy(col("d")).agg(sum(col("ce") * col("co")).as("ip"))
      .agg(min(col("ip")).as("est_min"), max(col("ip")).as("est_max"))
    val exact = e.join(o, "k").agg(count(lit(1)).as("exact_sz"))
    ests.crossJoin(broadcast(exact)) // 1-row exact: documented exception
      .select(
        col("exact_sz"), col("est_min"), col("est_max"),
        expr("(est_min - exact_sz) * 1000000 div exact_sz").as("over_min_ppm"),
        expr("(est_max - exact_sz) * 1000000 div exact_sz").as("over_max_ppm"))
  }

  def joinSizeEstOracle: String = {
    def cellSql(k: String) =
      s"('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || CAST($k AS VARCHAR)), 1, 8))::BIGINT % $JsW"
    s"""WITH ds AS (SELECT UNNEST([0, 1, 2, 3]) d),
       |se AS (
       |  SELECT d, ${cellSql("user_id")} cell, CAST(count(*) AS BIGINT) ce
       |  FROM events, ds GROUP BY 1, 2),
       |so AS (
       |  SELECT d, ${cellSql("o_custkey")} cell, CAST(count(*) AS BIGINT) co
       |  FROM orders, ds GROUP BY 1, 2),
       |ip AS (
       |  SELECT d, CAST(SUM(ce * co) AS BIGINT) ip
       |  FROM se JOIN so USING (d, cell) GROUP BY 1),
       |est AS (
       |  SELECT CAST(MIN(ip) AS BIGINT) est_min,
       |    CAST(MAX(ip) AS BIGINT) est_max FROM ip),
       |ex AS (
       |  SELECT CAST(count(*) AS BIGINT) exact_sz
       |  FROM events e JOIN orders o ON e.user_id = o.o_custkey)
       |SELECT exact_sz, est_min, est_max,
       |  (est_min - exact_sz) * 1000000 // exact_sz over_min_ppm,
       |  (est_max - exact_sz) * 1000000 // exact_sz over_max_ppm
       |FROM est CROSS JOIN ex""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef("bloom_fpp", bloomFpp, Some(bloomFppOracle)),
    QueryDef("ams_f2", amsF2, Some(amsF2Oracle)),
    QueryDef(
      "sample_extrapolate", sampleExtrapolate, Some(sampleExtrapolateOracle)),
    QueryDef("join_size_est", joinSizeEst, Some(joinSizeEstOracle)),
    QueryDef("countmin_merge", countminMerge, Some(countminMergeOracle)),
    QueryDef("minhash_merge", minhashMerge, Some(minhashMergeOracle)),
    QueryDef(
      "bitmap_rollup_merge", bitmapRollupMerge,
      Some(bitmapRollupMergeOracle)),
    QueryDef("kmv_distinct", kmvDistinct, Some(kmvDistinctOracle)),
    QueryDef("hll_distinct", hllDistinct, Some(hllDistinctOracle)),
    QueryDef("countmin_freq", countminFreq, Some(countminFreqOracle)),
    QueryDef("countmin_error", countminError, Some(countminErrorOracle)),
    QueryDef("bitmap_distinct", bitmapDistinctQ, Some(bitmapDistinctOracle)),
    QueryDef("sliding_distinct", slidingDistinct, Some(slidingDistinctOracle)),
    QueryDef(
      "bitmap_retention", bitmapRetention, Some(bitmapRetentionOracle)),
    QueryDef(
      "audience_overlap", audienceOverlap, Some(audienceOverlapOracle)),
    QueryDef("user_churn", userChurn, Some(userChurnOracle)))

  /** `ams_f2`: the AMS (Alon–Matias–Szegedy) tug-of-war sketch for
    * the SECOND frequency moment F₂ = Σf² of the per-user event
    * counts — the self-join-size / skewness statistic, and the fifth
    * member of the measured answer-quality battery (bloom_fpp = bits,
    * minhash_estimate = signature, countmin_error = width,
    * feature_hash_collisions = buckets, this = moment estimation):
    * eight independent ±1 hash estimators Z_j = Σ_x f_x·s_j(x), each
    * Z_j² an unbiased F₂ estimate, averaged; every Z_j accumulates as
    * an exact int64 conditional sum (md5-bit signs, the countmin hash
    * discipline), so sketch AND truth are integer-exact and the
    * SIGNED estimator error sits inside the hash check beside the
    * per-estimator spread (z2_min/z2_max — the variance the 2F₂²/8
    * bound prices).
    *
    * Plan shape: the eight sign sums ride ONE event-grain conditional
    * aggregate (map-side combinable — this is why AMS works on
    * streams); the exact F₂ is one user-grain count + one fold.
    */
  def amsF2(spark: SparkSession, dir: String): DataFrame = {
    def sign(j: Int) =
      when(
        conv(
          substring(md5(concat(lit(s"$j:"), col("user_id").cast("string"))),
            1, 1), 16, 10).cast("long") % 2 === 0,
        lit(1L)).otherwise(lit(-1L))
    val zs = Tables.events(spark, dir)
      .select(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (0 until 8).map(j => sum(sign(j)).as(s"z$j")): _*)
    val exact = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("f"))
      .agg(
        count(lit(1)).as("n_users"),
        sum((col("f") * col("f")).cast("decimal(38,0)")).as("f2x"))
      .select(col("n_users"), expr("cast(f2x as bigint)").as("f2_exact"))
    zs.crossJoin(broadcast(exact))
      .select(
        col("n_events"), col("n_users"), col("f2_exact"),
        expr("""(z0*z0 + z1*z1 + z2*z2 + z3*z3 + z4*z4 + z5*z5
          |  + z6*z6 + z7*z7) div 8""".stripMargin).as("f2_est"),
        expr("""least(z0*z0, z1*z1, z2*z2, z3*z3, z4*z4, z5*z5,
          |  z6*z6, z7*z7)""".stripMargin).as("z2_min"),
        expr("""greatest(z0*z0, z1*z1, z2*z2, z3*z3, z4*z4, z5*z5,
          |  z6*z6, z7*z7)""".stripMargin).as("z2_max"))
      .withColumn(
        // deviation × 10⁶ can cross 2^63 when an estimator misses
        // badly (Z² is bounded only by n_events²) ⇒ DECIMAL/HUGEINT
        "err_ppm",
        expr("""CASE WHEN f2_est - f2_exact < 0
          |THEN -cast((cast(f2_exact - f2_est as decimal(38,0)) * 1000000)
          |  div f2_exact as bigint)
          |ELSE cast((cast(f2_est - f2_exact as decimal(38,0)) * 1000000)
          |  div f2_exact as bigint)
          |END""".stripMargin))
  }

  def amsF2Oracle: String = {
    def sign(j: Int) =
      s"""(CASE WHEN ('0x' || substr(md5('$j:' ||
         | CAST(user_id AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
         | THEN 1 ELSE -1 END)""".stripMargin.replace("\n", "")
    val zCols = (0 until 8)
      .map(j => s"CAST(sum(${sign(j)}) AS BIGINT) z$j").mkString(",\n    ")
    """WITH zs AS (
      |  SELECT CAST(count(*) AS BIGINT) n_events,
      |    ZCOLS
      |  FROM events),
      |ex AS (
      |  SELECT CAST(count(*) AS BIGINT) n_users,
      |    CAST(sum(CAST(f AS HUGEINT) * f) AS BIGINT) f2_exact
      |  FROM (SELECT CAST(count(*) AS BIGINT) f FROM events GROUP BY user_id)),
      |j AS (SELECT * FROM zs, ex)
      |SELECT n_events, n_users, f2_exact,
      |  (z0*z0 + z1*z1 + z2*z2 + z3*z3 + z4*z4 + z5*z5 + z6*z6 + z7*z7)
      |    // 8 AS f2_est,
      |  least(z0*z0, z1*z1, z2*z2, z3*z3, z4*z4, z5*z5, z6*z6, z7*z7)
      |    AS z2_min,
      |  greatest(z0*z0, z1*z1, z2*z2, z3*z3, z4*z4, z5*z5, z6*z6, z7*z7)
      |    AS z2_max,
      |  CASE WHEN (z0*z0 + z1*z1 + z2*z2 + z3*z3 + z4*z4 + z5*z5 + z6*z6
      |      + z7*z7) // 8 - f2_exact < 0
      |    THEN -CAST((CAST(f2_exact - (z0*z0 + z1*z1 + z2*z2 + z3*z3 + z4*z4
      |      + z5*z5 + z6*z6 + z7*z7) // 8 AS HUGEINT) * 1000000 // f2_exact)
      |      AS BIGINT)
      |    ELSE CAST((CAST((z0*z0 + z1*z1 + z2*z2 + z3*z3 + z4*z4 + z5*z5
      |      + z6*z6 + z7*z7) // 8 - f2_exact AS HUGEINT) * 1000000
      |      // f2_exact) AS BIGINT)
      |  END err_ppm
      |FROM j""".stripMargin.replace("ZCOLS", zCols)
  }

  /** `user_churn`: the day-over-day churn panel — retained, NEW
    * (present tomorrow only) and LOST (present today only) users —
    * through the ANDNOT third of the bitmap algebra
    * (`bitmap_andnot`, `functions/BitmapExpressions.scala`), beside
    * bitmap_retention's AND. Same scale shape: one fact-level
    * aggregate builds a user bitmap per day, the day×(day+1) panel is
    * pure 8-KiB-container arithmetic on the ~30-row daily relation —
    * the three counts obey new = next − retained and lost = day −
    * retained, and emitting them from the algebra itself (not that
    * arithmetic) means the oracle's anti-join replay independently
    * verifies the container difference kernel. Churn rate in ppm of
    * the first day's users.
    */
  def userChurn(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BitmapFunctions._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(bitmapAgg(col("user_id")).as("bm"))
    val next = daily.select(
      date_sub(col("d"), 1).as("d"), col("bm").as("bm_next"))
    daily.join(next, "d")
      .select(
        col("d"),
        bitmapCount(col("bm")).as("day_users"),
        bitmapCount(bitmapAnd(col("bm"), col("bm_next"))).as("retained"),
        bitmapCount(bitmapAndNot(col("bm_next"), col("bm"))).as("n_new"),
        bitmapCount(bitmapAndNot(col("bm"), col("bm_next"))).as("n_lost"))
      .withColumn("churn_ppm", expr("n_lost * 1000000 div day_users"))
      .orderBy("d")
  }

  def userChurnOracle: String =
    """WITH ud AS (
      |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) d, user_id
      |  FROM events),
      |daily AS (
      |  SELECT d, CAST(count(*) AS BIGINT) day_users FROM ud GROUP BY 1),
      |ret AS (
      |  SELECT a.d, CAST(count(*) AS BIGINT) retained
      |  FROM ud a JOIN ud b ON b.d = a.d + 1 AND a.user_id = b.user_id
      |  GROUP BY 1),
      |new_u AS (
      |  SELECT a.d - 1 AS d, CAST(count(*) AS BIGINT) n_new
      |  FROM ud a
      |  WHERE NOT EXISTS (SELECT 1 FROM ud b
      |      WHERE b.d = a.d - 1 AND b.user_id = a.user_id)
      |    AND EXISTS (SELECT 1 FROM daily x WHERE x.d = a.d - 1)
      |  GROUP BY 1),
      |lost AS (
      |  SELECT a.d, CAST(count(*) AS BIGINT) n_lost
      |  FROM ud a
      |  WHERE NOT EXISTS (SELECT 1 FROM ud b
      |      WHERE b.d = a.d + 1 AND b.user_id = a.user_id)
      |    AND EXISTS (SELECT 1 FROM daily y WHERE y.d = a.d + 1)
      |  GROUP BY 1)
      |SELECT a.d, a.day_users,
      |  COALESCE(r.retained, 0) retained,
      |  COALESCE(n.n_new, 0) n_new,
      |  COALESCE(l.n_lost, 0) n_lost,
      |  COALESCE(l.n_lost, 0) * 1000000 // a.day_users churn_ppm
      |FROM daily a
      |JOIN daily b ON b.d = a.d + 1
      |LEFT JOIN ret r ON r.d = a.d
      |LEFT JOIN new_u n ON n.d = a.d
      |LEFT JOIN lost l ON l.d = a.d
      |ORDER BY a.d""".stripMargin

  /** `bitmap_retention`: exact day-over-day retained users via the
    * AND half of the bitmap algebra — the canonical production use
    * of user bitmaps (OR makes distincts additive across slices;
    * AND answers "in BOTH sets": retention, audience overlap). One
    * fact-level aggregate builds a user bitmap per day; consecutive
    * days join on the ~30-row daily relation and
    * popcount(bitmap_and(d, d+1)) is pure 8-KiB-container
    * arithmetic — the day×day comparison never touches event rows
    * again, which is what makes N-day retention triangles affordable
    * at 100 TB. Rates in integer ppm.
    */
  def bitmapRetention(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BitmapFunctions._
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(bitmapAgg(col("user_id")).as("bm"))
    val next = daily.select(
      date_sub(col("d"), 1).as("d"), col("bm").as("bm_next"))
    daily.join(next, "d")
      .select(
        col("d"),
        bitmapCount(col("bm")).as("day_users"),
        bitmapCount(col("bm_next")).as("next_day_users"),
        bitmapCount(bitmapAnd(col("bm"), col("bm_next"))).as("retained"))
      .withColumn(
        "retained_ppm", expr("retained * 1000000 div day_users"))
      .orderBy("d")
  }

  /** `audience_overlap`: pairwise user-set overlap between event
    * types — the audience/segment-intersection matrix (who clicks AND
    * purchases) every targeting decision reads, as pure bitmap
    * arithmetic: one fact-level aggregate builds a user bitmap per
    * type (5 rows), then all 10 type pairs AND/popcount on the
    * broadcast 5-row relation — overlap and integer-ppm Jaccard
    * without ever re-touching event rows, the same property that
    * makes bitmap_retention's day×day matrix affordable.
    */
  def audienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.BitmapFunctions._
    val byType = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(bitmapAgg(col("user_id")).as("bm"))
    val a = byType.select(col("event_type").as("t1"), col("bm").as("bm1"))
    val b = byType.select(col("event_type").as("t2"), col("bm").as("bm2"))
    a.join(broadcast(b), col("t1") < col("t2"))
      .select(
        col("t1"), col("t2"),
        bitmapCount(col("bm1")).as("n1"),
        bitmapCount(col("bm2")).as("n2"),
        bitmapCount(bitmapAnd(col("bm1"), col("bm2"))).as("overlap"))
      .withColumn(
        "jacc_ppm", expr("overlap * 1000000 div (n1 + n2 - overlap)"))
      .orderBy("t1", "t2")
  }

  def audienceOverlapOracle: String =
    """WITH ut AS (
      |  SELECT DISTINCT event_type t, user_id FROM events),
      |n AS (SELECT t, CAST(count(*) AS BIGINT) n FROM ut GROUP BY 1),
      |ov AS (
      |  SELECT a.t t1, b.t t2, CAST(count(*) AS BIGINT) overlap
      |  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.t < b.t
      |  GROUP BY 1, 2)
      |SELECT na.t t1, nb.t t2, na.n n1, nb.n n2,
      |  COALESCE(ov.overlap, 0) overlap,
      |  COALESCE(ov.overlap, 0) * 1000000
      |    // (na.n + nb.n - COALESCE(ov.overlap, 0)) jacc_ppm
      |FROM n na JOIN n nb ON na.t < nb.t
      |LEFT JOIN ov ON ov.t1 = na.t AND ov.t2 = nb.t
      |ORDER BY t1, t2""".stripMargin

  def bitmapRetentionOracle: String =
    """WITH ud AS (
      |  SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) d, user_id
      |  FROM events),
      |daily AS (
      |  SELECT d, CAST(count(*) AS BIGINT) day_users FROM ud GROUP BY 1),
      |ret AS (
      |  SELECT a.d, CAST(count(*) AS BIGINT) retained
      |  FROM ud a JOIN ud b
      |    ON b.d = a.d + 1 AND a.user_id = b.user_id
      |  GROUP BY 1)
      |SELECT a.d, a.day_users, b.day_users next_day_users,
      |  COALESCE(r.retained, 0) retained,
      |  COALESCE(r.retained, 0) * 1000000 // a.day_users retained_ppm
      |FROM daily a
      |JOIN daily b ON b.d = a.d + 1
      |LEFT JOIN ret r ON r.d = a.d
      |ORDER BY a.d""".stripMargin
}
