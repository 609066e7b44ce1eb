package graft.operators

import graft.{Exact, QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Second relational wave: as-of join, grouping sets, pivot,
  * range-frame and value windows, approximate distinct, math/array/
  * conditional scalar functions, IN-subquery.
  */
object Relational2 {
  import Exact._

  private def tb(s: org.apache.spark.sql.SparkSession, d: String) = new Tables(s, d)

  val queries: Seq[QueryDef] = Seq(

    // ----- q25: AS-OF JOIN (time-series join Spark lacks natively).
    // Implemented the scalable way: union both sides, one shuffle on
    // the key, a running last-non-null over (ts, side) — instead of a
    // per-row range probe. DuckDB's native ASOF JOIN is the oracle.
    QueryDef(
      "q25_asof_join",
      (s, d) => {
        val t = tb(s, d)
        // one order per (custkey, date) so the as-of match is unique
        val ord = t.orders.groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("o_orderkey"),
            max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
        val a = ord.select(col("o_custkey").as("k"),
          col("o_orderdate").cast("timestamp").as("ts"), lit(0).as("side"),
          col("o_orderkey"), col("o_totalprice"),
          lit(null).cast(LongType).as("event_id"))
        val b = t.events.select(col("user_id").as("k"), col("ts"),
          lit(1).as("side"), lit(null).cast(LongType).as("o_orderkey"),
          lit(null).cast(DoubleType).as("o_totalprice"), col("event_id"))
        val w = Window.partitionBy(col("k"))
          .orderBy(col("ts"), col("side"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        a.unionByName(b)
          .withColumn("matched_orderkey",
            last(col("o_orderkey"), ignoreNulls = true).over(w))
          .withColumn("matched_totalprice",
            last(col("o_totalprice"), ignoreNulls = true).over(w))
          .filter(col("side") === 1)
          .select(col("event_id"), col("k").as("user_id"),
            col("matched_orderkey"), col("matched_totalprice"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ord AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
            ARG_MAX(o_totalprice, o_orderkey) AS o_totalprice
          FROM orders GROUP BY 1, 2)
        SELECT e.event_id, e.user_id,
          o.o_orderkey AS matched_orderkey,
          o.o_totalprice AS matched_totalprice
        FROM events e ASOF LEFT JOIN ord o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id""")),

    // ----- q39: the same AS-OF JOIN through the custom physical
    // operator (graft.plans.AsOfJoinExec — logical node + planner
    // strategy + co-partitioned sort-merge exec) instead of the
    // union+window composition. Same oracle as q25: DuckDB's native
    // ASOF LEFT JOIN must hash-match the custom exec's output.
    QueryDef(
      "q39_asof_join_custom_exec",
      (s, d) => {
        val t = tb(s, d)
        val ord = t.orders.groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(max(col("o_orderkey")).as("o_orderkey"),
            max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
          .select(col("o_custkey"),
            col("o_orderdate").cast("timestamp").as("ots"),
            col("o_orderkey"), col("o_totalprice"))
        val ev = t.events.select(col("event_id"), col("user_id"), col("ts"))
        graft.plans.AsOf.join(s, ev, ord,
            col("user_id"), col("o_custkey"), col("ts"), col("ots"))
          .select(col("event_id"), col("user_id"),
            col("o_orderkey").as("matched_orderkey"),
            col("o_totalprice").as("matched_totalprice"))
          .orderBy(col("event_id"))
      },
      Some("""WITH ord AS (
          SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
            ARG_MAX(o_totalprice, o_orderkey) AS o_totalprice
          FROM orders GROUP BY 1, 2)
        SELECT e.event_id, e.user_id,
          o.o_orderkey AS matched_orderkey,
          o.o_totalprice AS matched_totalprice
        FROM events e ASOF LEFT JOIN ord o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        ORDER BY e.event_id""")),

    // ----- q26: GROUPING SETS (explicit set list, not rollup/cube).
    QueryDef(
      "q26_grouping_sets",
      (s, d) => tb(s, d).lineitem
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n_rows"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus")),
      Some(s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
          COALESCE(l_linestatus, 'ALL') AS linestatus,
          COUNT(*) AS n_rows, ${sqlSum("l_quantity", 2)} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY returnflag, linestatus""")),

    // ----- q27: PIVOT (wide aggregation; fixed value list so the
    // output schema is static — the scalable form).
    QueryDef(
      "q27_pivot",
      (s, d) => tb(s, d).orders
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice"), 2))
        .orderBy(col("o_orderpriority")),
      Some(s"""SELECT o_orderpriority,
          ${sqlSum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 2)} AS F,
          ${sqlSum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 2)} AS O,
          ${sqlSum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", 2)} AS P
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ----- q28: RANGE window frame (value-based, not row-based):
    // orders within $10k below each order's price, same priority.
    QueryDef(
      "q28_window_range_frame",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice"))
          .rangeBetween(-10000L, Window.currentRow)
        tb(s, d).orders
          .withColumn("n_in_band", count(lit(1)).over(w))
          .withColumn("band_spend",
            sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
              .cast(DoubleType))
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"), col("n_in_band"), col("band_spend"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
          COUNT(*) OVER w AS n_in_band,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
            AS band_spend
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
          RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
        ORDER BY o_orderkey""")),

    // ----- q29: first_value / last_value / nth_value over full frames.
    QueryDef(
      "q29_window_value_functions",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        tb(s, d).orders
          .withColumn("first_order", first(col("o_orderkey")).over(w))
          .withColumn("last_order", last(col("o_orderkey")).over(w))
          .withColumn("second_order", nth_value(col("o_orderkey"), 2).over(w))
          .select(col("o_custkey"), col("o_orderkey"), col("first_order"),
            col("last_order"), col("second_order"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      Some("""SELECT o_custkey, o_orderkey,
          FIRST_VALUE(o_orderkey) OVER w AS first_order,
          LAST_VALUE(o_orderkey) OVER w AS last_order,
          NTH_VALUE(o_orderkey, 2) OVER w AS second_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        ORDER BY o_custkey, o_orderkey""")),

    // ----- q30: approximate distinct (HLL). The sketch value itself is
    // engine-specific, so the oracle-able output is the exact count plus
    // a deterministic accuracy bound: rsd=0.01 makes |approx−exact|/exact
    // < 0.05 hold with overwhelming margin, and DuckDB asserts the same
    // boolean as a constant. This upgrades q30 from rows-only to a full
    // hash-checked row.
    QueryDef(
      "q30_approx_count_distinct",
      (s, d) => tb(s, d).lineitem
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")) <
            col("exact_parts") * 0.05).as("approx_within_5pct"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
          CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
          TRUE AS approx_within_5pct
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ----- q31: math scalar functions (only operations with exact
    // cross-engine IEEE semantics: sqrt, abs, floor, ceil, sign,
    // integer round, greatest/least, modulo).
    QueryDef(
      "q31_math_functions",
      (s, d) => tb(s, d).lineitem
        .filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"),
          sqrt(col("l_extendedprice")).as("price_sqrt"),
          abs(col("l_extendedprice") - lit(30000.0)).as("dev_from_30k"),
          floor(col("l_quantity")).as("qty_floor"),
          ceil(col("l_discount") * 100).as("disc_pct_ceil"),
          signum(col("l_extendedprice") - lit(30000.0)).as("price_sign"),
          round(col("l_extendedprice")).as("price_round"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("g"),
          least(col("l_quantity"), col("l_tax") * 100).as("l"),
          (col("l_orderkey") % 7).as("key_mod"))
        .orderBy(col("l_orderkey"))
        .limit(2000),
      Some("""SELECT l_orderkey,
          sqrt(l_extendedprice) AS price_sqrt,
          abs(l_extendedprice - 30000.0) AS dev_from_30k,
          CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
          CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
          CASE WHEN l_extendedprice > 30000.0 THEN 1.0
               WHEN l_extendedprice < 30000.0 THEN -1.0 ELSE 0.0 END
            AS price_sign,
          round(l_extendedprice) AS price_round,
          greatest(l_quantity, l_discount * 100) AS g,
          least(l_quantity, l_tax * 100) AS l,
          l_orderkey % 7 AS key_mod
        FROM lineitem WHERE l_linenumber = 1
        ORDER BY l_orderkey LIMIT 2000""")),

    // ----- q32: lateral array explode with position (posexplode /
    // UNNEST WITH ORDINALITY).
    QueryDef(
      "q32_posexplode",
      (s, d) => tb(s, d).part
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
        .orderBy(col("p_partkey"), col("pos")),
      Some("""SELECT p_partkey, CAST(i - 1 AS INT) AS pos, toks[i] AS word
        FROM (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part),
             UNNEST(generate_series(1, len(toks))) AS u(i)
        ORDER BY p_partkey, pos""")),

    // ----- q34: conditional scalar functions.
    QueryDef(
      "q34_conditional_functions",
      (s, d) => tb(s, d).orders
        .select(col("o_orderkey"),
          nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
            .as("status_label"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "med")
            .otherwise("small").as("size_class"),
          (col("o_orderstatus") === "F").as("is_finished"))
        .orderBy(col("o_orderkey"))
        .limit(3000),
      Some("""SELECT o_orderkey,
          NULLIF(o_orderstatus, 'O') AS status_or_null,
          COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_label,
          CASE WHEN o_totalprice > 200000 THEN 'big'
               WHEN o_totalprice > 100000 THEN 'med'
               ELSE 'small' END AS size_class,
          o_orderstatus = 'F' AS is_finished
        FROM orders ORDER BY o_orderkey LIMIT 3000""")),

    // ----- q35: IN-subquery (planned as a left-semi broadcast join).
    QueryDef(
      "q35_in_subquery",
      (s, d) => {
        val t = tb(s, d)
        t.lineitem
          .join(broadcast(t.part.filter(col("p_size") > 45)
            .select(col("p_partkey"))),
            col("l_partkey") === col("p_partkey"), "left_semi")
          .agg(count(lit(1)).as("n_rows"),
            dsum(col("l_quantity"), 2).as("sum_qty"),
            countDistinct(col("l_partkey")).as("n_parts"))
      },
      Some(s"""SELECT COUNT(*) AS n_rows, ${sqlSum("l_quantity", 2)} AS sum_qty,
          COUNT(DISTINCT l_partkey) AS n_parts
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 45)""")),

    // ----- q64: pivot with MULTIPLE aggregates per pivot value — the
    // cross-tab shape q27 covers for one measure, generalized: Spark
    // names the columns {value}_{aggAlias}; the oracle builds the same
    // grid with conditional aggregation. Missing (priority, status)
    // combos yield NULL spend in both engines; counts are zero-filled
    // on the Spark side to match SQL COUNT's 0-for-empty.
    QueryDef(
      "q64_pivot_multi_agg",
      (s, d) => tb(s, d).orders
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice"), 2).as("spend"),
          count(lit(1)).as("n"))
        .na.fill(0L, Seq("F_n", "O_n", "P_n"))
        .orderBy(col("o_orderpriority")),
      Some(s"""SELECT o_orderpriority,
          ${sqlSum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END", 2)}
            AS F_spend,
          COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F_n,
          ${sqlSum("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END", 2)}
            AS O_spend,
          COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O_n,
          ${sqlSum("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END", 2)}
            AS P_spend,
          COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P_n
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""))
  )
}
