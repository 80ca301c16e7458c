package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Association-rule mining (the market-basket family: frequent
  * itemsets, confidence, lift) — the classic "what co-occurs"
  * operator every behavioral/training-data pipeline runs to find
  * correlated labels, tags, or event types. Metrics are integer ppm
  * (floor division), so the DuckDB oracle pins exact values.
  */
object Association {

  /** `assoc_rules`: frequent event-type PAIRS over per-user baskets
    * (basket = the set of event types a user ever fired), with
    * support, directional confidence and lift.
    *
    * Plan shape: ONE hash shuffle total. `groupBy(user).collect_set`
    * builds baskets (map-side partial sets — the distinct (user,
    * type) relation never materializes row-per-pair), then pair
    * expansion, per-type supports and the user count are all NARROW
    * over the persisted basket relation, and the pair/support
    * aggregates that follow run over explode output bounded by
    * |users| · |types|² — at 100 TB the only big exchange is the one
    * basket build. Baskets are bounded by the type DOMAIN (not event
    * volume); for an unbounded item domain you'd cap baskets
    * (`slice` after `sort_array`) and mine top items only.
    *
    * support_ppm = users(a,b)·10⁶ div users,
    * conf_ppm (a→b) = users(a,b)·10⁶ div users(a),
    * lift_milli = users(a,b)·users·10³ div (users(a)·users(b)) —
    * lift > 1000 ⇒ positively associated.
    */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("types"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val nu = baskets.agg(count(lit(1)).as("nu"))
      val supp = baskets
        .select(explode(col("types")).as("t"))
        .groupBy(col("t"))
        .agg(count(lit(1)).as("s"))
      val pairs = baskets
        .select(col("types"), explode(col("types")).as("a"))
        .select(col("a"), explode(col("types")).as("b"))
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("cnt"))
      val out = pairs
        .join(
          broadcast(supp.select(col("t").as("a"), col("s").as("sa"))), "a")
        .join(
          broadcast(supp.select(col("t").as("b"), col("s").as("sb"))), "b")
        .crossJoin(broadcast(nu))
        .select(
          col("a"), col("b"), col("cnt"),
          expr("cnt * 1000000 div nu").as("support_ppm"),
          expr("cnt * 1000000 div sa").as("conf_ppm"),
          expr("(cnt * nu * 1000) div (sa * sb)").as("lift_milli"))
        .orderBy(col("lift_milli").desc, col("a"), col("b"))
        .localCheckpoint() // materialize before the basket unpersist
      out
    } finally baskets.unpersist()
  }

  def assocRulesOracle: String =
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
      |       FROM events),
      |supp AS (SELECT event_type AS t, CAST(count(*) AS BIGINT) AS s
      |         FROM ut GROUP BY 1),
      |pairs AS (
      |  SELECT x.event_type AS a, y.event_type AS b,
      |         CAST(count(*) AS BIGINT) AS cnt
      |  FROM ut x JOIN ut y
      |    ON x.user_id = y.user_id AND x.event_type < y.event_type
      |  GROUP BY 1, 2)
      |SELECT p.a, p.b, p.cnt,
      |       p.cnt * 1000000 // nu.nu AS support_ppm,
      |       p.cnt * 1000000 // sa.s AS conf_ppm,
      |       (p.cnt * nu.nu * 1000) // (sa.s * sb.s) AS lift_milli
      |FROM pairs p
      |JOIN supp sa ON p.a = sa.t
      |JOIN supp sb ON p.b = sb.t
      |CROSS JOIN nu
      |ORDER BY lift_milli DESC, a, b""".stripMargin

  /** `markov_transitions`: the order-SENSITIVE complement to
    * [[assocRules]] — the first-order Markov transition matrix of
    * user journeys. Consecutive events per user (by ts, event_id
    * tie-break) form (prev → next) steps; output is each transition's
    * count and row-normalized probability in ppm.
    *
    * Plan shape: one shuffle(user) + in-partition sort for the lag
    * window (user cardinality ≫ executors ⇒ even spread, the
    * `window_lag` shape), then a tiny (types²) aggregate; the
    * per-prev totals come from a second aggregation over the
    * ALREADY-AGGREGATED transition counts (types² rows), broadcast
    * back — never a second pass over events.
    */
  def markovTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .select(
        col("user_id"),
        lag(col("event_type"), 1).over(w).as("prev"),
        col("event_type").as("next"))
      .where(col("prev").isNotNull)
      .groupBy(col("prev"), col("next"))
      .agg(count(lit(1)).as("cnt"))
    val totals = steps.groupBy(col("prev")).agg(sum(col("cnt")).as("tot"))
    steps
      .join(broadcast(totals), "prev")
      .select(
        col("prev"), col("next"), col("cnt"),
        expr("cnt * 1000000 div tot").as("prob_ppm"))
      .orderBy(col("prev"), col("next"))
  }

  def markovTransitionsOracle: String =
    """WITH steps AS (
      |  SELECT prev, event_type AS next
      |  FROM (SELECT user_id, event_type,
      |               lag(event_type) OVER (
      |                 PARTITION BY user_id
      |                 ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |                 AS prev
      |        FROM events)
      |  WHERE prev IS NOT NULL),
      |cnts AS (
      |  SELECT prev, next, CAST(count(*) AS BIGINT) AS cnt
      |  FROM steps GROUP BY 1, 2),
      |tot AS (
      |  SELECT prev, CAST(sum(cnt) AS BIGINT) AS tot
      |  FROM cnts GROUP BY 1)
      |SELECT cnts.prev, next, cnt, cnt * 1000000 // tot AS prob_ppm
      |FROM cnts JOIN tot ON cnts.prev = tot.prev
      |ORDER BY cnts.prev, next""".stripMargin

  /** `seq_support`: sequential-pattern SUPPORT mining — for every
    * ordered event-type pair (a, b), the number of users whose stream
    * contains some `a` strictly before some `b` (a subsequence match,
    * any gap). The order-sensitive mining complement to
    * [[assocRules]] (unordered co-occurrence) and the support-counting
    * step under [[markovTransitions]] (which only sees ADJACENT
    * steps): this is the PrefixSpan length-2 support table, the
    * candidate generator every sequence miner prunes from. a = b rows
    * count users who repeated the type. Exists-before reduces exactly
    * to per-user extrema: ∃ tsₐ < ts_b  ⇔  min(tsₐ) < max(ts_b) —
    * so support needs only the (user, type, min_ts, max_ts) relation,
    * never a row-level self-join.
    *
    * Plan shape: ONE hash shuffle (user, type) builds the extrema
    * relation; the per-user pair join is a self-join on user_id of
    * that SAME aggregated relation (co-partitioned — Spark reuses the
    * exchange), output bounded by |users|·|types|², then a tiny
    * (types²) aggregate. At 100 TB: event volume only touches the
    * first aggregate (map-side combinable extrema); everything after
    * is domain-bounded. support_ppm = users(a≺b)·10⁶ div users.
    */
  def seqSupport(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .localCheckpoint(eager = false) // both sides of the self-join
    val nu = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("nu"))
    ut.as("x")
      .join(ut.as("y"), "user_id")
      .where(col("x.mn") < col("y.mx"))
      .groupBy(
        col("x.event_type").as("a"), col("y.event_type").as("b"))
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(nu))
      .select(
        col("a"), col("b"), col("support"),
        expr("support * 1000000 div nu").as("support_ppm"))
      .orderBy(col("a"), col("b"))
  }

  def seqSupportOracle: String =
    """WITH ut AS (
      |  SELECT user_id, event_type,
      |         MIN(CAST(ts AS TIMESTAMP)) AS mn,
      |         MAX(CAST(ts AS TIMESTAMP)) AS mx
      |  FROM events GROUP BY 1, 2),
      |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
      |       FROM events),
      |pairs AS (
      |  SELECT x.event_type AS a, y.event_type AS b,
      |         CAST(count(*) AS BIGINT) AS support
      |  FROM ut x JOIN ut y ON x.user_id = y.user_id
      |  WHERE x.mn < y.mx
      |  GROUP BY 1, 2)
      |SELECT a, b, support, support * 1000000 // nu AS support_ppm
      |FROM pairs CROSS JOIN nu
      |ORDER BY a, b""".stripMargin

  /** `seq_support3`: length-3 sequential-pattern support — users
    * whose stream contains a ≺ b ≺ c as a subsequence (strict
    * timestamp order, any gaps). The extrema identity behind
    * [[seqSupport]] no longer suffices (the middle element needs a
    * WITNESS between the endpoints); the exact reduction is GREEDY
    * matching, the same left-most-match argument every subsequence
    * algorithm rests on: a ≺ b ≺ c exists  ⇔  taking e₁ = min(tsₐ),
    * then e₂ = min(ts_b > e₁), some c has ts_c > e₂. (⇐ is a witness
    * directly; ⇒ because any witness tsₐ<ts_b<ts_c has e₁ ≤ tsₐ,
    * hence e₂ ≤ ts_b < ts_c ≤ max(ts_c).) So support needs one
    * event-level pass to find each user's earliest-b-after-first-a,
    * never an |E|³ pattern join.
    *
    * Plan shape: the (user, type) extrema relation (one shuffle);
    * the e₂ pass joins raw events against the per-user first-a table
    * CO-PARTITIONED on user_id — row expansion bounded by the type
    * DOMAIN (|E|·|types|, the assoc-rules basket bound), aggregated
    * straight back to (user, a, b) grain in the same exchange; the
    * final c-side join is again user-co-partitioned against extrema,
    * output bounded by |users|·|types|³, then a tiny (types³)
    * aggregate. At 100 TB event volume touches exactly two map-side-
    * combinable aggregates; everything else is domain-bounded.
    * support_ppm = users(a≺b≺c)·10⁶ div users.
    */
  def seqSupport3(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val ut = ev
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("mn"), max(col("ts")).as("mx"))
      .localCheckpoint(eager = false) // firstA + c-side + user count
    val nu = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("nu"))
    val firstA = ut.select(
      col("user_id"), col("event_type").as("a"), col("mn").as("e1"))
    val e2 = ev
      .join(firstA, "user_id")
      .where(col("ts") > col("e1"))
      .groupBy(col("user_id"), col("a"), col("event_type").as("b"))
      .agg(min(col("ts")).as("e2"))
    e2
      .join(
        ut.select(
          col("user_id"), col("event_type").as("c"), col("mx")),
        "user_id")
      .where(col("mx") > col("e2"))
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(nu))
      .select(
        col("a"), col("b"), col("c"), col("support"),
        expr("support * 1000000 div nu").as("support_ppm"))
      .orderBy(col("a"), col("b"), col("c"))
  }

  def seqSupport3Oracle: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) ts
      |  FROM events),
      |ut AS (
      |  SELECT user_id, event_type, MIN(ts) AS mn, MAX(ts) AS mx
      |  FROM ev GROUP BY 1, 2),
      |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
      |       FROM ev),
      |e2 AS (
      |  SELECT ev.user_id, f.a, ev.event_type AS b, MIN(ev.ts) AS e2
      |  FROM ev JOIN (SELECT user_id, event_type AS a, mn AS e1
      |                FROM ut) f
      |    ON ev.user_id = f.user_id AND ev.ts > f.e1
      |  GROUP BY 1, 2, 3),
      |trip AS (
      |  SELECT e2.a, e2.b, u.event_type AS c,
      |         CAST(count(*) AS BIGINT) AS support
      |  FROM e2 JOIN ut u
      |    ON e2.user_id = u.user_id AND u.mx > e2.e2
      |  GROUP BY 1, 2, 3)
      |SELECT a, b, c, support, support * 1000000 // nu AS support_ppm
      |FROM trip CROSS JOIN nu
      |ORDER BY a, b, c""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("assoc_rules", assocRules, Some(assocRulesOracle)),
    QueryDef(
      "markov_transitions", markovTransitions, Some(markovTransitionsOracle)),
    QueryDef("seq_support", seqSupport, Some(seqSupportOracle)),
    QueryDef("seq_support3", seqSupport3, Some(seqSupport3Oracle)))
}
