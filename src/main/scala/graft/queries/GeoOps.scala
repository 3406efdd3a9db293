package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Geometric types/operators (`/root/reference/src/backend/utils/adt/
  * geo_ops.c` — point/box families; regress `src/test/regress/sql/
  * {point,box}.sql`). The reference models geometry as typed values with
  * operator classes; here a point is two numeric columns and a box is
  * four (the canonical lo/hi form `box.c` maintains), every operator a
  * plain codegen'd expression:
  *
  *  - `<->` point-point distance (euclidean + manhattan variants),
  *  - `@>` / `<@` containment, `&&` overlap (interval logic per axis),
  *  - `@@` center, area, diagonal,
  *  - `<->` point-box gap distance (0 inside, else distance to the
  *    nearest edge/corner — greatest(lo-p, p-hi, 0) per axis).
  *
  * The JOIN analogue of a spatial index (`gist` on box ops) is GRID
  * BUCKETING: boxes explode to the grid cells they cover, points land in
  * exactly one cell, and candidates come from a (cx, cy) equi-join —
  * the O(n·m) theta join becomes O(candidates), shuffled on cell keys.
  * Each box covers a bounded cell count (box extent / cell size), and a
  * point lives in ONE cell, so the pair (box, point) meets at most once:
  * no DISTINCT needed, recall is exact by construction. The oracle
  * cross-checks with the direct theta join, proving the decomposition
  * lossless and duplicate-free.
  */
object GeoOps extends QueryModule {

  /** Deterministic point/box synthesis from key columns (same spirit as
    * q_range_ops): integer coordinates, box in canonical lo<=hi form. */
  private def boxes(df: DataFrame, key: Column, key2: Column): DataFrame =
    df.withColumn("xl", key % 50)
      .withColumn("xh", col("xl") + 10 + key2 % 7)
      .withColumn("yl", key2 % 40)
      .withColumn("yh", col("yl") + 8)

  /** Haversine great-circle km between (lat,lon) columns/literals — the
    * contrib/earthdistance formula (`/root/reference/contrib/
    * earthdistance/earthdistance.c` geo_distance; earth radius 6378168 m
    * per earth()), written ONCE as SQL text shared verbatim by the Spark
    * plan (expr) and the DuckDB oracle so the IEEE op sequence is
    * identical; results are rounded to 3 decimals, ~9 orders of
    * magnitude above any libm last-ulp divergence. */
  private def haversineSql(lat: String, lon: String,
                           plat: Double, plon: Double): String =
    s"round(2 * 6378.168 * asin(sqrt(" +
      s"pow(sin(radians($lat - ($plat)) / 2), 2) + " +
      s"cos(radians($plat)) * cos(radians($lat)) * " +
      s"pow(sin(radians($lon - ($plon)) / 2), 2))), 3)"

  private val anchors = Seq(("sfo", 37.77, -122.42), ("fra", 50.03, 8.57),
                            ("syd", -33.95, 151.18))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // contrib/earthdistance: great-circle distances from synthetic
    // per-customer coordinates to three anchor points, range predicate,
    // and nearest-anchor classification (argmin over the ROUNDED
    // distances, so the tie-break sees identical values cross-engine).
    // Pure map-side trigonometry inside codegen.
    "q_earth_distance" -> ((s, dir) => {
      val base = t(s, dir, "customer").filter(col("c_custkey") <= 200)
        .withColumn("lat",
          (pmod(col("c_custkey"), lit(180)) - 90 + 0.5).cast("double"))
        .withColumn("lon",
          (pmod(col("c_custkey") * 7, lit(360)) - 180 + 0.5).cast("double"))
      val withD = anchors.foldLeft(base) { case (df, (n, la, lo)) =>
        df.withColumn(s"d_$n", expr(haversineSql("lat", "lon", la, lo)))
      }
      withD.select(col("c_custkey"), col("lat"), col("lon"),
          col("d_sfo"), col("d_fra"), col("d_syd"),
          (col("d_sfo") < 1000.0).as("near_sfo"),
          array_min(array(anchors.map { case (n, _, _) =>
            struct(col(s"d_$n").as("d"), lit(n).as("n")) }: _*))
            .getField("n").as("nearest"))
        .orderBy(col("c_custkey"))
    }),

    // contrib/cube: n-dimensional boxes (`/root/reference/contrib/cube/
    // cube.c` — cube_contains/cube_overlap/cube_distance/cube_union/
    // cube_enlarge, tests sql/cube.sql). 4-D integer-grid cubes derived
    // from order keys; containment/overlap are dimension-folds, the
    // center distance is a fixed-order double fold (mirrored token-for-
    // token in the oracle, then rounded), union volume stays integer.
    // All per-row array expressions — no shuffle.
    "q_cube_ops" -> ((s, dir) => {
      val dims = sequence(lit(0), lit(3))
      def ll1 = transform(dims, i => pmod(col("o_orderkey") * (i + 1), lit(50)))
      def ur1 = zip_with(ll1, dims, (l, i) => l + 5 + i)
      def ll2 = transform(dims, i => pmod(col("o_custkey") * (i + 3), lit(50)))
      def ur2 = transform(ll2, l => l + 7)
      def fAnd(c: Column): Column = aggregate(c, lit(true), (a, x) => a && x)
      val contains = fAnd(zip_with(zip_with(ll1, ll2, (a, b) => a <= b),
        zip_with(ur2, ur1, (a, b) => a <= b), (x, y) => x && y))
      val overlap = fAnd(zip_with(zip_with(ll1, ur2, (a, b) => a <= b),
        zip_with(ll2, ur1, (a, b) => a <= b), (x, y) => x && y))
      val c1 = zip_with(ll1, ur1, (a, b) => (a + b).cast("double") / 2.0)
      val c2 = zip_with(ll2, ur2, (a, b) => (a + b).cast("double") / 2.0)
      val dist = round(sqrt(aggregate(
        zip_with(c1, c2, (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)), 6)
      val uVol = aggregate(zip_with(
          zip_with(ll1, ll2, (a, b) => least(a, b)),
          zip_with(ur1, ur2, (a, b) => greatest(a, b)),
          (l, u) => u - l),
        lit(1L), (acc, x) => acc * x)
      val enlarged = fAnd(zip_with(
        zip_with(transform(ll1, x => x - 3), ll2, (a, b) => a <= b),
        zip_with(ur2, transform(ur1, x => x + 3), (a, b) => a <= b),
        (x, y) => x && y))
      t(s, dir, "orders").filter(col("o_orderkey") <= 300)
        .select(col("o_orderkey"),
          contains.as("contains"), overlap.as("overlap"),
          dist.as("center_dist"), uVol.as("union_vol"),
          enlarged.as("contains_enlarged"))
        .orderBy(col("o_orderkey"))
    }),

    // scalar operator family over synthesized points + boxes
    "q_geo_ops" -> ((s, dir) => {
      val d = boxes(t(s, dir, "orders").filter(col("o_orderkey") <= 500),
          col("o_orderkey"), col("o_custkey"))
        .withColumn("xp", col("o_orderkey") % 97)
        .withColumn("yp", col("o_custkey") % 89)
      val dx = greatest(col("xl") - col("xp"), col("xp") - col("xh"), lit(0L))
      val dy = greatest(col("yl") - col("yp"), col("yp") - col("yh"), lit(0L))
      d.select(col("o_orderkey"),
          col("xp"), col("yp"), col("xl"), col("xh"), col("yl"), col("yh"),
          round(sqrt(((col("xp") - 48) * (col("xp") - 48) +
                      (col("yp") - 44) * (col("yp") - 44)).cast("double")), 6)
            .as("dist_center"),
          (abs(col("xp") - 48) + abs(col("yp") - 44)).as("dist_manhattan"),
          ((col("xh") - col("xl")) * (col("yh") - col("yl"))).as("area"),
          ((col("xl") + col("xh")) / 2.0).as("center_x"),
          ((col("yl") + col("yh")) / 2.0).as("center_y"),
          (col("xp").between(col("xl"), col("xh")) &&
           col("yp").between(col("yl"), col("yh"))).as("contains_pt"),
          (col("xl") <= 60 && lit(20) <= col("xh") &&
           col("yl") <= 50 && lit(10) <= col("yh")).as("overlaps_fixed"),
          round(sqrt((dx * dx + dy * dy).cast("double")), 6).as("pt_box_dist"),
          round(sqrt(((col("xh") - col("xl")) * (col("xh") - col("xl")) +
                      (col("yh") - col("yl")) * (col("yh") - col("yl")))
            .cast("double")), 6).as("diagonal"))
        .orderBy(col("o_orderkey"))
    }),

    // grid-bucketed containment join (the gist-index analogue): points
    // equi-join boxes on covered grid cells, exact filter after
    "q_geo_grid_join" -> ((s, dir) => {
      val cell = 16
      val pts = t(s, dir, "customer").filter(col("c_custkey") <= 2000)
        .select(col("c_custkey").as("pid"),
          (col("c_custkey") % 101).as("px"),
          (col("c_custkey") * 7 % 103).as("py"))
        .withColumn("cx", expr(s"px div $cell"))
        .withColumn("cy", expr(s"py div $cell"))
      val bx = boxes(t(s, dir, "orders").filter(col("o_orderkey") <= 200),
          col("o_orderkey"), col("o_custkey"))
        .select(col("o_orderkey").as("bid"),
          col("xl"), col("xh"), col("yl"), col("yh"))
      // one row per covered cell: bounded by (extent/cell + 1)^2 per box
      val cells = bx.select(col("bid"), col("xl"), col("xh"), col("yl"), col("yh"),
        explode(expr(
          s"""flatten(transform(sequence(xl div $cell, xh div $cell),
             |  cx -> transform(sequence(yl div $cell, yh div $cell),
             |    cy -> struct(cx as cx, cy as cy))))""".stripMargin)).as("c"))
        .select(col("bid"), col("xl"), col("xh"), col("yl"), col("yh"),
          col("c.cx").as("cx"), col("c.cy").as("cy"))
      cells.join(pts, Seq("cx", "cy"))
        .filter(col("px").between(col("xl"), col("xh")) &&
                col("py").between(col("yl"), col("yh")))
        .groupBy(col("bid"))
        .agg(count(lit(1)).as("n_points"), sum(col("pid")).as("sum_pid"))
        .orderBy(col("bid"))
    }),

    // PG circle + lseg operator families (geo_ops.c circle_*:4700-5100,
    // lseg_*:2000-2400; regress sql/circle.sql + sql/lseg.sql). Per-row
    // circles/segments at integer coordinates so every PREDICATE
    // (contain_pt, overlap, strict left, parallel, perpendicular,
    // intersect) is decided in EXACT integer arithmetic — equivalent to
    // PG's EPSILON=1e-6 fuzzy compares at this coordinate range because
    // the smallest nonzero discriminant (>=1, or >=4e-6 for slope
    // cross-differences at +-500) exceeds the fuzz — while lengths,
    // areas, and distances are micros-FLOORed doubles whose formula text
    // is shared VERBATIM by both engines (identical IEEE op sequence).
    // circle_box is the INSCRIBED box (radius/sqrt(2), geo_ops.c:5073) —
    // not the bounding box. Segment intersection is the exact
    // orientation predicate incl. collinear-touch; point-segment
    // distance picks its branch (end1/end2/perpendicular foot) by
    // integer compare before any float op. All map-side HOF-free scalar
    // codegen; the only shuffle is the final ORDER BY.
    "q_circle_lseg_ops" -> ((s, dir) => {
      t(s, dir, "part").filter("p_partkey <= 160")
        .selectExpr(ClsShared.base: _*)
        .selectExpr(ClsShared.derived: _*)
        .selectExpr(ClsShared.outputs: _*)
        .orderBy(col("pk"))
    }),

    // PG infinite-line type (geo_ops.c line_*:1056-1330 — construct_pp,
    // intersect ?#, parallel ?||, perp ?-|, vertical ?|, horizontal ?-,
    // line_eq =, line_distance <->, line_interpt #, line_sl/invsl,
    // line_closept_point ##, line_contain_point @>; regress
    // sql/line.sql). A line is the coefficient triple {A,B,C} of
    // Ax+By+C=0; the reference normalizes to slope form (A=m, B=-1) via
    // float slope, here construction from two integer points keeps the
    // EXACT integer cross form (A=y2-y1, B=x1-x2, C=x2*y1-x1*y2) — the
    // same line, scale-invariant under every operator below, so all
    // PREDICATES (parallel A1*B2=A2*B1, perpendicular A1*A2+B1*B2=0,
    // eq as three proportionality cross-products, vertical B=0,
    // horizontal A=0, containment A*qx+B*qy+C=0) decide in exact
    // integer arithmetic — equivalent to PG's EPSILON fuzz at this
    // coordinate range — while interpt (Cramer), point/line and
    // parallel-line distances (PG's ratio-scaled |C1-rC2|/hypot), the
    // perpendicular foot, and slopes are micros-FLOORed doubles whose
    // formula text both engines run VERBATIM. pk mod 8 steers rare
    // branches: 0 -> parallel pair, 1 -> perpendicular pair, 2 ->
    // IDENTICAL lines (PG: eq, and interpt reports NO intersection),
    // 3 -> vertical, 4 -> horizontal, 5 -> query point exactly on the
    // line. Vertical slope (DBL_MAX in PG) surfaces as NULL. Pure
    // map-side scalar codegen; the only shuffle is the final ORDER BY.
    "q_line_ops" -> ((s, dir) => {
      t(s, dir, "part").filter("p_partkey <= 160")
        .selectExpr(LineShared.base: _*)
        .selectExpr(LineShared.points: _*)
        .selectExpr(LineShared.steer: _*)
        .selectExpr(LineShared.coeffs: _*)
        .selectExpr(LineShared.outputs: _*)
        .orderBy(col("pk"))
    })
  )

  val oracle: Map[String, String] = Map(
    // the same dimension folds over DuckDB list comprehensions; the
    // center-distance fold runs in the same element order before ROUND
    "q_cube_ops" ->
      """WITH b AS (SELECT o_orderkey,
        |    [(o_orderkey * (i + 1)) % 50 for i in range(0, 4)] AS ll1,
        |    [(o_orderkey * (i + 1)) % 50 + 5 + i for i in range(0, 4)] AS ur1,
        |    [(o_custkey * (i + 3)) % 50 for i in range(0, 4)] AS ll2,
        |    [(o_custkey * (i + 3)) % 50 + 7 for i in range(0, 4)] AS ur2
        |  FROM orders WHERE o_orderkey <= 300)
        |SELECT o_orderkey,
        |  list_reduce(list_prepend(true,
        |    [ll1[i] <= ll2[i] AND ur2[i] <= ur1[i] for i in range(1, 5)]),
        |    (a, x) -> a AND x) AS contains,
        |  list_reduce(list_prepend(true,
        |    [ll1[i] <= ur2[i] AND ll2[i] <= ur1[i] for i in range(1, 5)]),
        |    (a, x) -> a AND x) AS overlap,
        |  ROUND(sqrt(list_reduce(list_prepend(0.0,
        |    [(CAST(ll1[i] + ur1[i] AS DOUBLE) / 2.0
        |      - CAST(ll2[i] + ur2[i] AS DOUBLE) / 2.0)
        |     * (CAST(ll1[i] + ur1[i] AS DOUBLE) / 2.0
        |        - CAST(ll2[i] + ur2[i] AS DOUBLE) / 2.0)
        |     for i in range(1, 5)]), (a, x) -> a + x)), 6) AS center_dist,
        |  CAST(list_reduce(list_prepend(CAST(1 AS BIGINT),
        |    [greatest(ur1[i], ur2[i]) - least(ll1[i], ll2[i])
        |     for i in range(1, 5)]), (a, x) -> a * x) AS BIGINT) AS union_vol,
        |  list_reduce(list_prepend(true,
        |    [ll1[i] - 3 <= ll2[i] AND ur2[i] <= ur1[i] + 3
        |     for i in range(1, 5)]),
        |    (a, x) -> a AND x) AS contains_enlarged
        |FROM b ORDER BY o_orderkey""".stripMargin,

    // the same shared haversine text; nearest via the same rounded argmin
    "q_earth_distance" ->
      s"""WITH b AS (SELECT c_custkey,
         |    CAST(c_custkey % 180 - 90 + 0.5 AS DOUBLE) AS lat,
         |    CAST((c_custkey * 7) % 360 - 180 + 0.5 AS DOUBLE) AS lon
         |  FROM customer WHERE c_custkey <= 200),
         |d AS (SELECT c_custkey, lat, lon,
         |    ${haversineSql("lat", "lon", 37.77, -122.42)} AS d_sfo,
         |    ${haversineSql("lat", "lon", 50.03, 8.57)} AS d_fra,
         |    ${haversineSql("lat", "lon", -33.95, 151.18)} AS d_syd
         |  FROM b)
         |SELECT c_custkey, lat, lon, d_sfo, d_fra, d_syd,
         |  d_sfo < 1000.0 AS near_sfo,
         |  (list_sort([{'d': d_sfo, 'n': 'sfo'}, {'d': d_fra, 'n': 'fra'},
         |              {'d': d_syd, 'n': 'syd'}]))[1].n AS nearest
         |FROM d ORDER BY c_custkey""".stripMargin,

    "q_geo_ops" ->
      """WITH d AS (SELECT o_orderkey,
        |    o_orderkey % 97 AS xp, o_custkey % 89 AS yp,
        |    o_orderkey % 50 AS xl,
        |    o_orderkey % 50 + 10 + o_custkey % 7 AS xh,
        |    o_custkey % 40 AS yl, o_custkey % 40 + 8 AS yh
        |  FROM orders WHERE o_orderkey <= 500)
        |SELECT o_orderkey, xp, yp, xl, xh, yl, yh,
        |  ROUND(sqrt(CAST((xp-48)*(xp-48) + (yp-44)*(yp-44) AS DOUBLE)), 6)
        |    AS dist_center,
        |  abs(xp-48) + abs(yp-44) AS dist_manhattan,
        |  (xh-xl) * (yh-yl) AS area,
        |  (xl + xh) / 2.0 AS center_x,
        |  (yl + yh) / 2.0 AS center_y,
        |  xp BETWEEN xl AND xh AND yp BETWEEN yl AND yh AS contains_pt,
        |  xl <= 60 AND 20 <= xh AND yl <= 50 AND 10 <= yh AS overlaps_fixed,
        |  ROUND(sqrt(CAST(
        |    greatest(xl-xp, xp-xh, 0) * greatest(xl-xp, xp-xh, 0) +
        |    greatest(yl-yp, yp-yh, 0) * greatest(yl-yp, yp-yh, 0) AS DOUBLE)), 6)
        |    AS pt_box_dist,
        |  ROUND(sqrt(CAST((xh-xl)*(xh-xl) + (yh-yl)*(yh-yl) AS DOUBLE)), 6)
        |    AS diagonal
        |FROM d ORDER BY o_orderkey""".stripMargin,

    // direct theta join — independent of the grid decomposition
    "q_geo_grid_join" ->
      """WITH p AS (SELECT c_custkey AS pid,
        |    c_custkey % 101 AS px, c_custkey * 7 % 103 AS py
        |  FROM customer WHERE c_custkey <= 2000),
        |b AS (SELECT o_orderkey AS bid,
        |    o_orderkey % 50 AS xl,
        |    o_orderkey % 50 + 10 + o_custkey % 7 AS xh,
        |    o_custkey % 40 AS yl, o_custkey % 40 + 8 AS yh
        |  FROM orders WHERE o_orderkey <= 200)
        |SELECT bid, COUNT(*) AS n_points, CAST(SUM(pid) AS BIGINT) AS sum_pid
        |FROM b JOIN p ON px BETWEEN xl AND xh AND py BETWEEN yl AND yh
        |GROUP BY bid ORDER BY bid""".stripMargin,

    // the identical shared formula text over the identical CTE ladder
    "q_circle_lseg_ops" ->
      s"""WITH s0 AS (SELECT ${ClsShared.base.mkString(", ")}
         |  FROM part WHERE p_partkey <= 160),
         |s1 AS (SELECT ${ClsShared.derived.mkString(", ")} FROM s0)
         |SELECT ${ClsShared.outputs.mkString(", ")}
         |FROM s1 ORDER BY pk""".stripMargin,

    "q_line_ops" ->
      s"""WITH s0 AS (SELECT ${LineShared.base.mkString(", ")}
         |  FROM part WHERE p_partkey <= 160),
         |s1 AS (SELECT ${LineShared.points.mkString(", ")} FROM s0),
         |s2 AS (SELECT ${LineShared.steer.mkString(", ")} FROM s1),
         |s3 AS (SELECT ${LineShared.coeffs.mkString(", ")} FROM s2)
         |SELECT ${LineShared.outputs.mkString(", ")}
         |FROM s3 ORDER BY pk""".stripMargin
  )
}

/** Shared-verbatim formula text for q_line_ops — every string is run
  * unchanged by Spark (selectExpr ladder) and DuckDB (CTE ladder); see
  * the query's scaladoc for the semantics map to geo_ops.c line_*. */
private[queries] object LineShared {

  /** Micros-FLOOR of a double expression. */
  private def u(x: String): String =
    s"CAST(FLOOR(($x) * 1000000.0) AS BIGINT)"
  private def dbl(x: String): String = s"CAST($x AS DOUBLE)"

  val base: Seq[String] = Seq(
    "p_partkey AS pk",
    "CAST((p_partkey * 13) % 601 - 300 AS BIGINT) AS x1",
    "CAST((p_partkey * 29) % 601 - 300 AS BIGINT) AS y1",
    "CAST(p_partkey % 41 + 1 AS BIGINT) AS sdx",
    "CAST((p_partkey * 7) % 83 - 41 AS BIGINT) AS sdy",
    "CAST((p_partkey * 31) % 601 - 300 AS BIGINT) AS x3",
    "CAST((p_partkey * 43) % 601 - 300 AS BIGINT) AS y3",
    "CAST(p_partkey % 37 - 18 AS BIGINT) AS tdx",
    "CAST((p_partkey * 5) % 79 - 39 AS BIGINT) AS tdy",
    "CAST((p_partkey * 89) % 601 - 300 AS BIGINT) AS qx",
    "CAST((p_partkey * 97) % 601 - 300 AS BIGINT) AS qy")

  // line 1 endpoints: mod-8 cases 3/4 force exactly-vertical/horizontal
  // (line_vertical/line_horizontal need a true B=0 / A=0 row)
  val points: Seq[String] = Seq(
    "pk", "x3", "y3", "tdx", "tdy", "qx", "qy", "x1", "y1",
    "x1 + (CASE WHEN pk % 8 = 3 THEN 0 WHEN pk % 8 = 4 THEN 5 " +
      "ELSE sdx END) AS x2",
    "y1 + (CASE WHEN pk % 8 = 3 THEN 5 WHEN pk % 8 = 4 THEN 0 " +
      "ELSE sdy END) AS y2")

  // line 2 endpoints + query point, steered per pk mod 8: 0 -> same
  // direction (parallel), 1 -> rotated 90 degrees (perpendicular),
  // 2 -> two OTHER points of line 1 (identical line, scaled x3
  // coefficients), 5 -> q moved onto line 1; the generic arm guards the
  // one dead direction (tdx=tdy=0) to keep the endpoints distinct
  val steer: Seq[String] = Seq(
    "pk", "x1", "y1", "x2", "y2",
    "CASE WHEN pk % 8 = 2 THEN x1 + 2 * (x2 - x1) ELSE x3 END AS x3",
    "CASE WHEN pk % 8 = 2 THEN y1 + 2 * (y2 - y1) ELSE y3 END AS y3",
    "CASE WHEN pk % 8 = 0 THEN x3 + (x2 - x1) " +
      "WHEN pk % 8 = 1 THEN x3 - (y2 - y1) " +
      "WHEN pk % 8 = 2 THEN x1 + 5 * (x2 - x1) " +
      "ELSE x3 + (CASE WHEN tdx = 0 AND tdy = 0 THEN 1 ELSE tdx END) " +
      "END AS x4",
    "CASE WHEN pk % 8 = 0 THEN y3 + (y2 - y1) " +
      "WHEN pk % 8 = 1 THEN y3 + (x2 - x1) " +
      "WHEN pk % 8 = 2 THEN y1 + 5 * (y2 - y1) " +
      "ELSE y3 + tdy END AS y4",
    "CASE WHEN pk % 8 = 5 THEN x1 + 3 * (x2 - x1) ELSE qx END AS qx",
    "CASE WHEN pk % 8 = 5 THEN y1 + 3 * (y2 - y1) ELSE qy END AS qy")

  // exact integer coefficient triples: the cross form of the two-point
  // construction (scale-invariant vs the reference's slope form)
  val coeffs: Seq[String] = Seq(
    "pk", "qx", "qy",
    "y2 - y1 AS a1", "x1 - x2 AS b1", "x2 * y1 - x1 * y2 AS c1",
    "y4 - y3 AS a2", "x3 - x4 AS b2", "x4 * y3 - x3 * y4 AS c2")

  val outputs: Seq[String] = {
    val par = "a1 * b2 = a2 * b1"
    val den = dbl("a1 * b2 - a2 * b1")
    val hyp1 = s"sqrt(${dbl("a1 * a1 + b1 * b1")})"
    // PG line_distance ratio: prefer the A pair, fall back to B
    val ratio = s"CASE WHEN a1 <> 0 AND a2 <> 0 THEN ${dbl("a1")} / a2 " +
      s"ELSE ${dbl("b1")} / b2 END"
    val dd = "a1 * a1 + b1 * b1"
    Seq(
      "pk", "a1", "b1", "c1",
      "b1 = 0 AS l_vertical",
      "a1 = 0 AS l_horizontal",
      s"$par AS l_parallel",
      "a1 * a2 + b1 * b2 = 0 AS l_perp",
      s"$par AND a1 * c2 = a2 * c1 AND b1 * c2 = b2 * c1 AS l_eq",
      s"NOT ($par) AS l_intersect",
      s"CASE WHEN NOT ($par) THEN " +
        s"${u(s"${dbl("b1 * c2 - b2 * c1")} / ($den)")} " +
        "ELSE NULL END AS interpt_x_u",
      s"CASE WHEN NOT ($par) THEN " +
        s"${u(s"${dbl("a2 * c1 - a1 * c2")} / ($den)")} " +
        "ELSE NULL END AS interpt_y_u",
      s"CASE WHEN NOT ($par) THEN 0 ELSE " +
        s"${u(s"abs(${dbl("c1")} - ($ratio) * c2) / $hyp1")} " +
        "END AS dist_ll_u",
      u(s"abs(${dbl("a1 * qx + b1 * qy + c1")}) / $hyp1") + " AS dist_pl_u",
      "a1 * qx + b1 * qy + c1 = 0 AS contain_pt",
      u(s"${dbl("b1 * (b1 * qx - a1 * qy) - a1 * c1")} / ($dd)") +
        " AS closept_x_u",
      u(s"${dbl("a1 * (a1 * qy - b1 * qx) - b1 * c1")} / ($dd)") +
        " AS closept_y_u",
      "CASE WHEN a1 = 0 THEN 0 WHEN b1 = 0 THEN NULL " +
        s"ELSE ${u(s"${dbl("a1")} / (0 - ${dbl("b1")})")} END AS slope_u",
      "CASE WHEN a1 = 0 THEN NULL WHEN b1 = 0 THEN 0 " +
        s"ELSE ${u(s"${dbl("b1")} / ${dbl("a1")}")} END AS invslope_u")
  }
}

/** Shared-verbatim formula text for q_circle_lseg_ops — every string here
  * is executed unchanged by both Spark (selectExpr ladder) and DuckDB
  * (CTE ladder), so the engines agree by construction on operator choice
  * and IEEE op order; see the query's scaladoc for the semantics map to
  * geo_ops.c. */
private[queries] object ClsShared {

  /** Micros-FLOOR of a double expression. */
  private def u(x: String): String =
    s"CAST(FLOOR(($x) * 1000000.0) AS BIGINT)"
  private def dbl(x: String): String = s"CAST($x AS DOUBLE)"

  val base: Seq[String] = Seq(
    "p_partkey AS pk",
    "CAST((p_partkey * 13) % 1001 - 500 AS BIGINT) AS ax",
    "CAST((p_partkey * 37) % 1001 - 500 AS BIGINT) AS ay",
    "CAST(p_partkey % 19 + 1 AS BIGINT) AS ra",
    "CAST((p_partkey * 53) % 1001 - 500 AS BIGINT) AS bx",
    "CAST((p_partkey * 71) % 1001 - 500 AS BIGINT) AS by",
    "CAST(p_partkey % 23 + 2 AS BIGINT) AS rb",
    "CAST((p_partkey * 89) % 1001 - 500 AS BIGINT) AS qx",
    "CAST((p_partkey * 97) % 1001 - 500 AS BIGINT) AS qy",
    "CAST((p_partkey * 11) % 601 - 300 AS BIGINT) AS x1",
    "CAST((p_partkey * 17) % 601 - 300 AS BIGINT) AS y1",
    "CAST((p_partkey * 19) % 601 - 300 AS BIGINT) AS x3",
    "CAST((p_partkey * 23) % 601 - 300 AS BIGINT) AS y3",
    "CAST(p_partkey % 41 + 1 AS BIGINT) AS sdx",
    "CAST((p_partkey * 7) % 83 - 41 AS BIGINT) AS sdy",
    "CAST(p_partkey % 37 - 18 AS BIGINT) AS tdx",
    "CAST((p_partkey * 5) % 79 - 39 AS BIGINT) AS tdy")

  // pk mod 8 steers rows into the rare-branch shapes so every predicate
  // fires both ways: 0 -> parallel segments, 1 -> perpendicular,
  // 2 -> point strictly inside circle A, 6 -> point EXACTLY on the rim
  // (PG's FPle makes tangency contained), 3 -> circles overlapping,
  // 7 -> circles exactly tangent (overlap per FPle)
  val derived: Seq[String] = Seq(
    "pk", "ax", "ay", "ra", "rb",
    "CASE WHEN pk % 8 = 3 THEN ax + ra + rb - 1 " +
      "WHEN pk % 8 = 7 THEN ax + ra + rb ELSE bx END AS bx",
    "CASE WHEN pk % 8 IN (3, 7) THEN ay ELSE by END AS by",
    "CASE WHEN pk % 8 = 2 THEN ax WHEN pk % 8 = 6 THEN ax + ra " +
      "ELSE qx END AS qx",
    "CASE WHEN pk % 8 = 2 THEN ay + ra - 1 WHEN pk % 8 = 6 THEN ay " +
      "ELSE qy END AS qy",
    "x1", "y1", "x3", "y3",
    "x1 + sdx AS x2", "y1 + sdy AS y2",
    "x3 + (CASE WHEN pk % 8 = 0 THEN sdx WHEN pk % 8 = 1 THEN -sdy " +
      "ELSE tdx END) AS x4",
    "y3 + (CASE WHEN pk % 8 = 0 THEN sdy WHEN pk % 8 = 1 THEN sdx " +
      "ELSE tdy END) AS y4")

  // exact-integer cross product of (b-a) x (c-a)
  private def cross(axx: String, ayy: String, bxx: String, byy: String,
                    cxx: String, cyy: String): String =
    s"(($bxx) - ($axx)) * (($cyy) - ($ayy)) - " +
      s"(($byy) - ($ayy)) * (($cxx) - ($axx))"

  private def onSeg(axx: String, ayy: String, bxx: String, byy: String,
                    cxx: String, cyy: String): String =
    s"($cxx) BETWEEN LEAST($axx, $bxx) AND GREATEST($axx, $bxx) AND " +
      s"($cyy) BETWEEN LEAST($ayy, $byy) AND GREATEST($ayy, $byy)"

  val outputs: Seq[String] = {
    val d2ab = "(bx-ax)*(bx-ax) + (by-ay)*(by-ay)"
    val dq1 = "(qx-x1)*(qx-x1) + (qy-y1)*(qy-y1)"
    val dq2 = "(qx-x2)*(qx-x2) + (qy-y2)*(qy-y2)"
    val tNum = "(qx-x1)*(x2-x1) + (qy-y1)*(y2-y1)"
    val den = "(x2-x1)*(x2-x1) + (y2-y1)*(y2-y1)"
    val crossQ = "(x2-x1)*(qy-y1) - (y2-y1)*(qx-x1)"
    val d1 = cross("x3", "y3", "x4", "y4", "x1", "y1")
    val d2 = cross("x3", "y3", "x4", "y4", "x2", "y2")
    val d3 = cross("x1", "y1", "x2", "y2", "x3", "y3")
    val d4 = cross("x1", "y1", "x2", "y2", "x4", "y4")
    Seq(
      "pk",
      "2 * ra AS c_diameter",
      u(s"pi() * ${dbl("ra * ra")}") + " AS c_area_u",
      "ax + qx AS addpt_x", "ay + qy AS addpt_y",
      s"(qx-ax)*(qx-ax) + (qy-ay)*(qy-ay) <= ra * ra AS contain_pt",
      s"$d2ab <= (ra + rb) * (ra + rb) AS c_overlap",
      u(s"GREATEST(0.0, sqrt(${dbl(d2ab)}) - ${dbl("ra + rb")})") +
        " AS c_dist_u",
      "(ax + ra) < (bx - rb) AS c_left",
      u(s"${dbl("ax")} - ${dbl("ra")} / sqrt(2.0)") + " AS ibox_x1_u",
      u(s"${dbl("ay")} + ${dbl("ra")} / sqrt(2.0)") + " AS ibox_y2_u",
      u(s"sqrt(${dbl(den)})") + " AS s_len_u",
      "(x1 + x2) * 500000 AS mid_x_u",
      "(y1 + y2) * 500000 AS mid_y_u",
      "(y2-y1)*(x4-x3) = (y4-y3)*(x2-x1) AS s_parallel",
      "(x2-x1)*(x4-x3) + (y2-y1)*(y4-y3) = 0 AS s_perp",
      s"((($d1) > 0 AND ($d2) < 0 OR ($d1) < 0 AND ($d2) > 0) AND " +
        s"(($d3) > 0 AND ($d4) < 0 OR ($d3) < 0 AND ($d4) > 0)) OR " +
        s"(($d1) = 0 AND ${onSeg("x3", "y3", "x4", "y4", "x1", "y1")}) OR " +
        s"(($d2) = 0 AND ${onSeg("x3", "y3", "x4", "y4", "x2", "y2")}) OR " +
        s"(($d3) = 0 AND ${onSeg("x1", "y1", "x2", "y2", "x3", "y3")}) OR " +
        s"(($d4) = 0 AND ${onSeg("x1", "y1", "x2", "y2", "x4", "y4")}) " +
        "AS s_intersect",
      s"CASE WHEN ($tNum) <= 0 THEN ${u(s"sqrt(${dbl(dq1)})")} " +
        s"WHEN ($tNum) >= ($den) THEN ${u(s"sqrt(${dbl(dq2)})")} " +
        s"ELSE ${u(s"abs(${dbl(crossQ)}) / sqrt(${dbl(den)})")} END " +
        "AS dist_ps_u")
  }
}
