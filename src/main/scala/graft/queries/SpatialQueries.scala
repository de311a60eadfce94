package graft.queries

import graft.Tables
import graft.ops.TextOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 extension operators, geospatial family (SURVEY.md §2.13
  * X249+): spherical-distance joins and hierarchical spatial rollups
  * over hash-synthesized coordinates (the testdata carries no lat/lon;
  * md5-derived positions let both engines reconstruct identical
  * geography, same idiom as the deterministic-sampling hashes).
  * Positions are clamped to lat ∈ ±60° so a FIXED grid-cell width
  * works at every band (cos(60°) = 0.5 bounds the lon shrink) — the
  * standard mid-latitude simplification; a polar corpus would switch
  * to per-band widths or an S2/H3-style cell scheme.
  */
object SpatialQueries {
  type Q = (SparkSession, String) => DataFrame

  private val R = 6371.0088 // IUGG mean Earth radius, km

  /** Deterministic synthetic position for a key: lat ∈ [−60, 60),
    * lon ∈ [−180, 180), from the engine-portable md5 hash32. */
  private def synthGeo(key: Column): (Column, Column) = (
    (pmod(TextOps.hash32(key.cast("string"), "lat:"), lit(1200000)) /
      10000.0) - 60.0,
    (pmod(TextOps.hash32(key.cast("string"), "lon:"), lit(3600000)) /
      10000.0) - 180.0)

  private val synthGeoSql =
    """(('0x' || substr(md5('lat:' || c_custkey::VARCHAR), 1, 8))
      |      ::BIGINT % 1200000) / 10000.0 - 60.0 AS lat,
      |    (('0x' || substr(md5('lon:' || c_custkey::VARCHAR), 1, 8))
      |      ::BIGINT % 3600000) / 10000.0 - 180.0 AS lon""".stripMargin

  private def haversine(lat1: Column, lon1: Column, lat2: Column,
      lon2: Column): Column =
    lit(2 * R) * asin(sqrt(
      pow(sin(radians(lat2 - lat1) / 2), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) *
          pow(sin(radians(lon2 - lon1) / 2), 2)))

  /** q320_haversine_join — all customer pairs within 250 km
    * great-circle distance, via a COMPLETE fixed-grid spatial join:
    * cells are 2.25° lat × 4.5° lon (both chosen ≥ the 250 km angular
    * extent at the worst permitted latitude — 250/111.19 = 2.2484°
    * and 250/(111.19·cos 60°) = 4.4968° — so candidate pairs can
    * never straddle more than one cell boundary per axis), the probe
    * side explodes its 3×3 neighborhood with MODULAR lon wrap
    * ((cell + off + 80) mod 80 — 80 cells tile 360° exactly, so
    * antimeridian pairs are kept), and the shuffled EQUI-join on the
    * cell id carries O(n·density) candidates — never the n² cross
    * product the DuckDB oracle deliberately runs, which makes the
    * oracle hash-match a PROOF of candidate completeness, not just of
    * the distance math (q213's pattern, on a sphere).
    */
  def q320HaversineJoin(s: SparkSession, dir: String): DataFrame = {
    val radiusKm = 250.0
    val (dlat, dlon, nlon) = (2.25, 4.5, 80)
    val (la, lo) = synthGeo(col("c_custkey"))
    val pts = Tables.customer(s, dir)
      .select(col("c_custkey").as("id"), la.as("lat"), lo.as("lon"))
      .withColumn("__cla", floor((col("lat") + 90.0) / dlat).cast("int"))
      .withColumn("__clo",
        floor((col("lon") + 180.0) / dlon).cast("int"))
    val probe = pts
      .withColumn("__o", explode(typedLit(Seq(-1, 0, 1))))
      .withColumn("__o2", explode(typedLit(Seq(-1, 0, 1))))
      .select(col("id").as("id_a"), col("lat").as("__lat_a"),
        col("lon").as("__lon_a"),
        (col("__cla") + col("__o")).as("__cla"),
        pmod(col("__clo") + col("__o2") + nlon, lit(nlon)).as("__clo"))
    probe.join(pts.select(col("id").as("id_b"),
        col("lat").as("__lat_b"), col("lon").as("__lon_b"),
        col("__cla"), col("__clo")), Seq("__cla", "__clo"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("__d", haversine(col("__lat_a"), col("__lon_a"),
        col("__lat_b"), col("__lon_b")))
      .filter(col("__d") < radiusKm)
      .select(col("id_a"), col("id_b"),
        round(col("__d"), 2).as("dist_km"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** q321_spatial_rollup — hierarchical multi-resolution spatial
    * aggregation (the H3/geohash-pyramid shape): customer positions
    * are aggregated ONCE into the finest 0.75° grid cells (count +
    * balance sum), then each coarser level (3°, 12°) is derived by
    * re-aggregating the CELL frame with integer-divided cell indices
    * (0.75·4 = 3, 3·4 = 12 — dyadic nesting makes floor alignment
    * exact) — the corpus is scanned exactly once no matter how many
    * pyramid levels are published, the algebraic-rollup contract
    * (q211) in two dimensions. Per level: occupied cells, max cell
    * occupancy, and the busiest cell id (count-desc, id tiebreak).
    */
  def q321SpatialRollup(s: SparkSession, dir: String): DataFrame = {
    val (la, lo) = synthGeo(col("c_custkey"))
    val fine = Tables.customer(s, dir)
      .select(la.as("lat"), lo.as("lon"), col("c_acctbal"))
      .withColumn("__la", floor((col("lat") + 90.0) / 0.75).cast("long"))
      .withColumn("__lo", floor((col("lon") + 180.0) / 0.75).cast("long"))
      .groupBy(col("__la"), col("__lo"))
      .agg(count(lit(1)).as("__n"), sum(col("c_acctbal")).as("__bal"))
      .localCheckpoint()
    def level(res: Int, div: Int): DataFrame = {
      val cells = fine
        .withColumn("__cla", (col("__la") / div).cast("long"))
        .withColumn("__clo", (col("__lo") / div).cast("long"))
        .groupBy(col("__cla"), col("__clo"))
        .agg(sum(col("__n")).as("n"), sum(col("__bal")).as("bal"))
      // top cell via a lexicographic min(struct) aggregate, NOT a
      // row_number window: the cell frame grows toward the full grid
      // (round-10 WindowVolumeProbe: 13,606 single-task rows at sf0.1
      // and rising), and a top-1 under the total order
      // (n desc, __cla, __clo) is min(struct(-n, __cla, __clo)) — one
      // map-side-combined hash aggregate, no global sort
      cells
        .groupBy()
        .agg(count(lit(1)).as("n_cells"), max(col("n")).as("max_n"),
          (round(sum(col("bal")), 2) + lit(0.0)).as("total_bal"),
          min(struct((-col("n")).as("__negn"), col("__cla"),
            col("__clo"), concat_ws(":", col("__cla"), col("__clo"))
              .as("__lbl"))).as("__top"))
        .select(lit(res).as("res_deg_x100"), col("n_cells"),
          col("max_n"), col("total_bal"),
          col("__top.__lbl").as("top_cell"))
    }
    level(75, 1).unionByName(level(300, 4)).unionByName(level(1200, 16))
      .orderBy(col("res_deg_x100"))
  }

  val queries: Map[String, Q] = Map(
    "q320_haversine_join" -> (q320HaversineJoin _),
    "q321_spatial_rollup" -> (q321SpatialRollup _),
  )

  val oracle: Map[String, String] = Map(
    // exact all-pairs: completeness proof for the grid join
    "q320_haversine_join" ->
      s"""WITH g AS (SELECT c_custkey AS id, $synthGeoSql
        |  FROM customer),
        |p AS (SELECT a.id AS id_a, b.id AS id_b,
        |    2 * $R * asin(sqrt(
        |      pow(sin(radians(b.lat - a.lat) / 2), 2) +
        |      cos(radians(a.lat)) * cos(radians(b.lat)) *
        |        pow(sin(radians(b.lon - a.lon) / 2), 2))) AS d
        |  FROM g a JOIN g b ON a.id < b.id)
        |SELECT id_a, id_b, round(d, 2) AS dist_km FROM p
        |WHERE d < 250.0 ORDER BY id_a, id_b""".stripMargin,
    "q321_spatial_rollup" ->
      s"""WITH g AS (SELECT c_custkey AS id, c_acctbal, $synthGeoSql
        |  FROM customer),
        |fine AS (SELECT floor((lat + 90.0) / 0.75)::BIGINT AS la,
        |    floor((lon + 180.0) / 0.75)::BIGINT AS lo,
        |    count(*)::BIGINT AS n, sum(c_acctbal) AS bal
        |  FROM g GROUP BY 1, 2),
        |lv AS (
        |${Seq((75, 1), (300, 4), (1200, 16)).map { case (res, div) =>
        s"""  SELECT $res AS res_deg_x100, cla, clo, n, bal FROM (
           |    SELECT (la // $div) AS cla, (lo // $div) AS clo,
           |      sum(n)::BIGINT AS n, sum(bal) AS bal
           |    FROM fine GROUP BY 1, 2)"""
          .stripMargin }.mkString("\n  UNION ALL\n")}),
        |rk AS (SELECT *, row_number() OVER (
        |    PARTITION BY res_deg_x100
        |    ORDER BY n DESC, cla, clo) AS rk FROM lv)
        |SELECT res_deg_x100, count(*)::BIGINT AS n_cells,
        |  max(n)::BIGINT AS max_n, (round(sum(bal), 2) + 0.0) AS total_bal,
        |  max(CASE WHEN rk = 1 THEN cla::VARCHAR || ':' || clo::VARCHAR
        |    END) AS top_cell
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
