package graft.operators

import graft.{H, Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Geospatial operator family — the capability class every
  * location-bearing curation pipeline needs (store/sensor/geo-tagged
  * crawl data): grid density rollups, radius joins, and
  * nearest-neighbor joins, all expressed with the SAME bucket-block
  * pattern the llm dedup family uses, because a planet-scale radius
  * join has exactly the near-dup shape: map each point to a grid cell,
  * equi-join candidates cell-to-neighbor-cell, re-check the exact
  * predicate inside the join. Candidate volume is Σ per-cell density²
  * over 9 cells — linear for bounded density — never the |C|·|S|
  * cartesian a theta-join would plan.
  *
  * Coordinates: the fixture tables carry no lat/lon, so points are
  * MINTED deterministically from the integer keys (multiplicative
  * hash mod a 0.01°-granular grid). Everything downstream is pure IEEE
  * arithmetic (+, −, ×, /, floor) — correctly rounded and therefore
  * bit-identical in Spark and DuckDB; no transcendental is ever hashed.
  * The metric is squared degree distance on the flat plate carrée
  * plane. That is the honest choice for a hash-compared contract: a
  * haversine surface distance hashes libm's last ulp, and at the ±60°
  * band the flat metric is monotone in the true metric at radius-join
  * scales (lon wraparound at ±180° splits a <R° sliver of candidates —
  * documented, not handled, same as the production geohash systems
  * that shard on cell prefix).
  *
  * 100 TB: cells are the partition key. A planet grid at R=5° is 1 728
  * cells — coarse; production would drop R with density (H3/S2-style
  * hierarchical cells) but the JOIN SHAPE is unchanged: explode the
  * probe side into its ≤9 neighbor cells, shuffle both sides on cell,
  * hash-join, exact re-check. Skewed mega-cities = salted cells, same
  * recipe as q_join_salted.
  */
object Geo {

  /** Radius (degrees) for the join keys; cell size = R so a distance-R
    * ball always lands in the 3×3 neighbor block (|Δ| ≤ R ⇒ cell index
    * differs by ≤ 1 — exact, because d2 ≥ Δlat² rules out any
    * float-slack escape). */
  private val R = 5.0

  /** Deterministic point mint: lat ∈ [−60, 60), lon ∈ [−180, 180) on a
    * 0.01° grid via multiplicative hashing of the entity key. Integer
    * arithmetic up to the single exact division — bit-identical in both
    * engines. */
  private def mint(key: Column, mLat: Int, mLon: Int): (Column, Column) = (
    lit(-60.0) + (key * mLat % 12000) / lit(100.0),
    lit(-180.0) + (key * mLon % 36000) / lit(100.0))

  private def custPts(s: SparkSession, dir: String): DataFrame = {
    val (la, lo) = mint(col("c_custkey"), 7919, 104729)
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal"), la.as("lat"), lo.as("lon"))
  }

  private def suppPts(s: SparkSession, dir: String): DataFrame = {
    val (la, lo) = mint(col("s_suppkey"), 6271, 94907)
    Tables.supplier(s, dir)
      .select(col("s_suppkey"), la.as("lat"), lo.as("lon"))
  }

  /** Oracle-side spelling of [[mint]]. */
  private def oMint(key: String, mLat: Int, mLon: Int): String =
    s"-60.0 + ($key * $mLat % 12000) / 100.0 AS lat, " +
    s"-180.0 + ($key * $mLon % 36000) / 100.0 AS lon"

  private val oD2 =
    "(c.lat - s.lat) * (c.lat - s.lat) + (c.lon - s.lon) * (c.lon - s.lon)"

  /** Candidate pairs within R: customer cells explode into the 3×3
    * neighbor block, equi-join supplier on the exact cell, exact d2
    * re-check inside the join. Shared by the radius join and the
    * nearest-neighbor join. */
  private def radiusCandidates(s: SparkSession, dir: String): DataFrame = {
    val c = custPts(s, dir)
      .withColumn("cx", floor(col("lat") / R).cast("long"))
      .withColumn("cy", floor(col("lon") / R).cast("long"))
      // one generator per projection: two explodes = two steps
      .withColumn("dx", explode(lit(Array(-1L, 0L, 1L))))
      .withColumn("dy", explode(lit(Array(-1L, 0L, 1L))))
      .select(col("c_custkey"), col("lat").as("clat"), col("lon").as("clon"),
              (col("cx") + col("dx")).as("jx"), (col("cy") + col("dy")).as("jy"))
    val sp = suppPts(s, dir)
      .select(col("s_suppkey"), col("lat").as("slat"), col("lon").as("slon"),
              floor(col("lat") / R).cast("long").as("jx"),
              floor(col("lon") / R).cast("long").as("jy"))
    val d2 = (col("clat") - col("slat")) * (col("clat") - col("slat")) +
             (col("clon") - col("slon")) * (col("clon") - col("slon"))
    c.join(sp, Seq("jx", "jy"))
      .select(col("c_custkey"), col("s_suppkey"), d2.as("d2"))
      .filter(col("d2") <= lit(R * R))
  }

  private def oCand: String =
    s"""c AS (SELECT c_custkey, ${oMint("c_custkey", 7919, 104729)} FROM customer),
        s AS (SELECT s_suppkey, ${oMint("s_suppkey", 6271, 94907)} FROM supplier),
        cand AS (SELECT c_custkey, s_suppkey, $oD2 AS d2
                 FROM c, s WHERE $oD2 <= ${R * R})"""

  val qs: Seq[(String, Q)] = Seq(

    // Grid density rollup (the heatmap every geo dashboard starts
    // from): 10°-cell counts + exact-decimal balance totals over the
    // minted customer points. One map-combined aggregate on (cx, cy) —
    // the partition key a 100 TB point lake would already be laid out
    // on, so this rollup is shuffle-light cell-local work there.
    "q_geo_cell_stats" -> Q(
      (s, dir) => {
        custPts(s, dir)
          .groupBy(floor(col("lat") / 10.0).cast("long").as("cx"),
                   floor(col("lon") / 10.0).cast("long").as("cy"))
          .agg(count(lit(1)).as("n_pts"), H.dsum(col("c_acctbal")).as("bal"))
          .orderBy(col("cx"), col("cy"))
      },
      Some(s"""WITH c AS (SELECT c_acctbal,
                                 ${oMint("c_custkey", 7919, 104729)}
                          FROM customer)
               SELECT CAST(FLOOR(lat / 10.0) AS BIGINT) AS cx,
                      CAST(FLOOR(lon / 10.0) AS BIGINT) AS cy,
                      COUNT(*) AS n_pts, ${H.oSum("c_acctbal")} AS bal
               FROM c GROUP BY 1, 2 ORDER BY cx, cy""")),

    // Radius join: every (customer, supplier) pair within R degrees —
    // grid-cell candidates, exact re-check, never a cartesian. The
    // oracle IS the naive theta-join (fine at oracle scale), which is
    // exactly the point: same rows, linear plan.
    "q_join_geo" -> Q(
      (s, dir) => radiusCandidates(s, dir)
        .orderBy(col("c_custkey"), col("s_suppkey")),
      Some(s"""WITH $oCand
               SELECT c_custkey, s_suppkey, d2 FROM cand
               ORDER BY c_custkey, s_suppkey""")),

    // Nearest-neighbor join: closest supplier within R per customer
    // (top-1 over the same candidate set; d2 ties break on s_suppkey).
    // Customers with no supplier in the R-ball drop out — the honest
    // semantics for a bounded-search NN join (unbounded NN needs an
    // expanding-ring probe; the cell mechanism is identical).
    "q_geo_nearest" -> Q(
      (s, dir) => {
        val w = Window.partitionBy(col("c_custkey"))
                      .orderBy(col("d2"), col("s_suppkey"))
        radiusCandidates(s, dir)
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("c_custkey"), col("s_suppkey"), col("d2"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""WITH $oCand,
                    r AS (SELECT c_custkey, s_suppkey, d2,
                                 ROW_NUMBER() OVER (PARTITION BY c_custkey
                                                    ORDER BY d2, s_suppkey) AS rk
                          FROM cand)
               SELECT c_custkey, s_suppkey, d2 FROM r WHERE rk = 1
               ORDER BY c_custkey"""))
  )
}
