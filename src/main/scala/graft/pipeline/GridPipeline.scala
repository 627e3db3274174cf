package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ScalarFns
import graft.operators.{Ops, SpatialOps}

/** Transmission-grid chain — the reference's entry point 2:
  * `clean_GridKit_Europe` (code/lib/correction_functions.py:566-683) then
  * `generate_transmission` (code/lib/generate_intermediate_files.py:400-546),
  * re-expressed as two pure DataFrame stages.
  *
  * Scale posture: the grid table is the fact side (10⁵ rows at reference
  * scale, arbitrarily large in general); every lookup side (voltage
  * classes, assumptions, region polygons) is broadcast. The only shuffles
  * are the two per-line aggregations — both keyed on line/edge ids.
  */
object GridPipeline {

  /** Default voltage → loadability classes, from the reference's
    * `dict_line_voltage` (code/config.py; thresholds end at inf).
    * (voltage_kV_threshold, loadability_factor, surge_impedance_ohm)
    */
  def defaultVoltageLimits(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      (150.0, 3.15, 400.0),
      (220.0, 2.95, 395.0),
      (300.0, 2.50, 390.0),
      (380.0, 2.20, 375.0),
      (500.0, 1.80, 325.0),
      (Double.PositiveInfinity, 1.45, 275.0))
      .toDF("voltage_limit_kv", "loadability", "surge_impedance")
  }

  /** Stage 1 — clean the raw GridKit export.
    *
    * Input columns (FIXTURES.md §1.3): l_id, wkt_srid_4326, length_m,
    * voltage, wires, cables, frequency (the last four are ";"-multivalued).
    *
    * Reproduces: WKT endpoint parse (chars 21..-1, split on " |,");
    * explode-zip of multivalued cells; drop rows with no voltage anywhere;
    * mode imputation of voltage 0/null per line type; loadability range
    * lookup; SIL and capacity physics; per-line aggregation.
    */
  def cleanGridKit(raw: DataFrame, voltageLimits: DataFrame): DataFrame = {
    // WKT "SRID=4326;LINESTRING(lon lat,lon lat)" → 4 coordinate columns
    // (code/lib/correction_functions.py:591-594).
    val coords = raw
      .withColumn("__pts", split(expr("substring(wkt_srid_4326, 22, length(wkt_srid_4326) - 22)"), " |,"))
      .withColumn("V1_long", element_at(col("__pts"), 1).cast("double"))
      .withColumn("V1_lat", element_at(col("__pts"), 2).cast("double"))
      .withColumn("V2_long", element_at(col("__pts"), 3).cast("double"))
      .withColumn("V2_lat", element_at(col("__pts"), 4).cast("double"))
      .drop("__pts", "wkt_srid_4326")

    // R1: explode the ";"-multivalued electrical columns in lockstep
    // (code/lib/correction_functions.py:603-605 via util.expand_dataframe).
    val exploded = Ops.explodeZip(coords, Seq("voltage", "wires", "cables", "frequency"))
      .withColumn("voltage_kv", col("voltage").cast("double") / 1000.0)
      .withColumn("frequency_hz", col("frequency").cast("double"))

    // tr_type: DC if frequency 0, else AC (code/lib/correction_functions.py:631-636).
    val typed = exploded.withColumn("tr_type",
      when(col("frequency_hz") === 0.0, "DC").otherwise("AC"))

    // A5: impute missing/zero voltage with the per-type mode
    // (code/lib/correction_functions.py:617-623).
    val withMode = typed.join(
      broadcast(Ops.modePerGroup(
        typed.filter(col("voltage_kv") > 0), Seq("tr_type"), "voltage_kv")),
      Seq("tr_type"), "left")
      .withColumn("voltage_kv",
        when(col("voltage_kv").isNull || col("voltage_kv") === 0.0, col("voltage_kv_mode"))
          .otherwise(col("voltage_kv")))
      .drop("voltage_kv_mode")
      .filter(col("voltage_kv").isNotNull)

    // J7: loadability + surge impedance by smallest voltage class >= v
    // (code/lib/util.py:228-252; correction_functions.py:639-644).
    val classed = Ops.rangeLookup(withMode, "voltage_kv", broadcast(voltageLimits),
      "voltage_limit_kv")

    // Physics: SIL and capacity (code/lib/correction_functions.py:642-646):
    // SIL_MW = V² / Z_surge; Capacity_MVA = SIL * loadability.
    val physic = classed
      .withColumn("length_km", col("length_m").cast("double") / 1000.0)
      .withColumn("sil_mw", col("voltage_kv") * col("voltage_kv") / col("surge_impedance"))
      .withColumn("capacity_mva", col("sil_mw") * col("loadability"))

    // A1: collapse back to one row per (l_id, tr_type) with summed capacity
    // across parallel circuits (code/lib/correction_functions.py:652-657).
    // max, not first: a multi-circuit line (220;380) must collapse
    // deterministically — first() depends on partition delivery order.
    physic.groupBy(col("l_id"), col("tr_type"),
        col("V1_long"), col("V1_lat"), col("V2_long"), col("V2_lat"))
      .agg(max(col("voltage_kv")).as("voltage_kv"),
        max(col("length_km")).as("length_km"),
        sum(col("capacity_mva")).as("capacity_mva"))
  }

  /** Stage 2 — regionalized transmission edges.
    *
    * regions: (region, wkt) polygon table (small, broadcast).
    * assumptions: per (tr_type): efficiency per 1000 km, cost per MW·km.
    *
    * Reproduces: endpoint spatial joins (J5, twice); intra-regional drop
    * (P6); canonical edge orientation (reverse_lines); per-edge aggregation;
    * centroid distance (haversine, the declared geodesic approximation);
    * assumption join (J1); efficiency = eff_1000km ^ (length/1000)
    * (code/lib/generate_intermediate_files.py:437-533).
    */
  /** J9: candidate neighbor pairs — Queen contiguity (EXACT touches, not a
    * bbox probe) over the region polygons, canonically ordered a < b.
    * Reference: pysal Queen weights loop,
    * code/lib/generate_intermediate_files.py:476-483.
    */
  def candidateNeighbors(regions: DataFrame): DataFrame = {
    import graft.geo.GeoFns
    val a = regions.select(col("region").as("region_start"), col("wkt").as("__wa"))
    val b = regions.select(col("region").as("region_end"), col("wkt").as("__wb"))
    a.join(broadcast(b),
        col("region_start") < col("region_end") &&
          GeoFns.stTouches(col("__wa"), col("__wb")))
      .select(col("region_start"), col("region_end"))
  }

  def generateTransmission(grid: DataFrame, regions: DataFrame,
      assumptions: DataFrame): DataFrame = {
    // J5 twice: tag both endpoints with their containing region.
    val startTagged = SpatialOps.pointInPolygonJoin(
      grid, "V1_long", "V1_lat", regions.withColumnRenamed("region", "region_start"), "wkt")
    val bothTagged = SpatialOps.pointInPolygonJoin(
      startTagged, "V2_long", "V2_lat", regions.withColumnRenamed("region", "region_end"), "wkt")

    // P6: keep inter-regional lines only (intra-regional carry no
    // cross-border capacity; generate_intermediate_files.py:449-460).
    val inter = bothTagged.filter(col("region_start") =!= col("region_end"))

    // Canonical orientation so (A,B) and (B,A) merge (util.py:139-155).
    val canon = Ops.canonicalEdge(inter, "region_start", "region_end")

    // A1: aggregate parallel lines per directed-canonical edge.
    val agged = canon.groupBy(col("region_start"), col("region_end"), col("tr_type"))
      .agg(sum(col("capacity_mva")).as("capacity_mva"),
        avg(col("length_km")).as("length_km"),
        count(lit(1)).as("n_lines"))

    // J9→J3: full outer join against the Queen-adjacency candidate pairs so
    // adjacent-but-unconnected regions appear as expandable zero-capacity AC
    // edges (generate_intermediate_files.py:476-491; cap fillna(0)).
    val cand = candidateNeighbors(regions).withColumn("tr_type", lit("AC"))
    val edges = agged.join(cand, Seq("region_start", "region_end", "tr_type"), "full_outer")
      .na.fill(0.0, Seq("capacity_mva")).na.fill(0L, Seq("n_lines"))

    // Centroid distance between the two regions (haversine stands in for
    // geodesic — declared <0.5% difference, SURVEY §2.8).
    import graft.geo.GeoFns
    val cents = regions.select(col("region"),
      GeoFns.stCentroidX(col("wkt")).as("cx"), GeoFns.stCentroidY(col("wkt")).as("cy"))
    val withDist = edges
      .join(broadcast(cents.withColumnRenamed("region", "region_start")
        .withColumnRenamed("cx", "cx1").withColumnRenamed("cy", "cy1")), Seq("region_start"))
      .join(broadcast(cents.withColumnRenamed("region", "region_end")
        .withColumnRenamed("cx", "cx2").withColumnRenamed("cy", "cy2")), Seq("region_end"))
      .withColumn("centroid_km",
        ScalarFns.haversineKm(col("cy1"), col("cx1"), col("cy2"), col("cx2")))
      // candidate-only edges carry no line geometry: their length is the
      // centroid distance (reference computes `length` from centroids for
      // the joined frame, generate_intermediate_files.py:492-498).
      .withColumn("length_km", coalesce(col("length_km"), col("centroid_km")))
      .drop("cx1", "cy1", "cx2", "cy2")

    // J1: broadcast assumption join + derived efficiency/cost
    // (generate_intermediate_files.py:515-533).
    withDist.join(broadcast(assumptions), Seq("tr_type"), "left")
      .withColumn("efficiency", pow(col("eff_per_1000km"), col("length_km") / 1000.0))
      .withColumn("inv_cost", col("cost_per_mw_km") * col("length_km") * col("capacity_mva"))
  }
}
