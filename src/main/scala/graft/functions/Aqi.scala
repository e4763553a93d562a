package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** EPA AQI piecewise-linear interpolation (SURVEY §2.10; reference
  * `doc/archive/AQI Calculation Implementation Plan.md:36-73`) as pure
  * Column expressions — fully whole-stage-codegen'd `when` chains, no
  * UDF. The reference planned this as a Python UDF; the declarative
  * form is the 100TB-scale answer (stays inside Tungsten, null-safe).
  *
  * Formula: AQI = (Ahi-Alo)/(Chi-Clo)*(C-Clo)+Alo over the pollutant's
  * breakpoint row; >highest range extrapolates uncapped (plan :73);
  * negative/null → null (plan :69-72).
  */
object Aqi {

  type Breakpoints = Seq[(Double, Double, Double, Double)]

  /** (concLo, concHi, aqiLo, aqiHi) — PM2.5 µg/m³ 24h breakpoints
    * (plan :42-49).
    */
  val pm25Breakpoints: Breakpoints = Seq(
    (0.0, 12.0, 0.0, 50.0),
    (12.1, 35.4, 51.0, 100.0),
    (35.5, 55.4, 101.0, 150.0),
    (55.5, 150.4, 151.0, 200.0),
    (150.5, 250.4, 201.0, 300.0),
    (250.5, 500.4, 301.0, 500.0))

  /** Published EPA breakpoint tables for the remaining pollutants the
    * reference pivots (µg/m³ for PM10; ppb for O3-8h/NO2-1h/SO2-1h;
    * ppm for CO-8h; BC has no EPA index — treated like PM2.5, the
    * usual practice for black-carbon reporting).
    */
  val pm10Breakpoints: Breakpoints = Seq(
    (0.0, 54.0, 0.0, 50.0),
    (55.0, 154.0, 51.0, 100.0),
    (155.0, 254.0, 101.0, 150.0),
    (255.0, 354.0, 151.0, 200.0),
    (355.0, 424.0, 201.0, 300.0),
    (425.0, 604.0, 301.0, 500.0))

  val o3Breakpoints: Breakpoints = Seq(
    (0.0, 54.0, 0.0, 50.0),
    (55.0, 70.0, 51.0, 100.0),
    (71.0, 85.0, 101.0, 150.0),
    (86.0, 105.0, 151.0, 200.0),
    (106.0, 200.0, 201.0, 300.0),
    (201.0, 604.0, 301.0, 500.0))

  val no2Breakpoints: Breakpoints = Seq(
    (0.0, 53.0, 0.0, 50.0),
    (54.0, 100.0, 51.0, 100.0),
    (101.0, 360.0, 101.0, 150.0),
    (361.0, 649.0, 151.0, 200.0),
    (650.0, 1249.0, 201.0, 300.0),
    (1250.0, 2049.0, 301.0, 500.0))

  val so2Breakpoints: Breakpoints = Seq(
    (0.0, 35.0, 0.0, 50.0),
    (36.0, 75.0, 51.0, 100.0),
    (76.0, 185.0, 101.0, 150.0),
    (186.0, 304.0, 151.0, 200.0),
    (305.0, 604.0, 201.0, 300.0),
    (605.0, 1004.0, 301.0, 500.0))

  val coBreakpoints: Breakpoints = Seq(
    (0.0, 4.4, 0.0, 50.0),
    (4.5, 9.4, 51.0, 100.0),
    (9.5, 12.4, 101.0, 150.0),
    (12.5, 15.4, 151.0, 200.0),
    (15.5, 30.4, 201.0, 300.0),
    (30.5, 50.4, 301.0, 500.0))

  val breakpointsByPollutant: Map[String, Breakpoints] = Map(
    "pm25" -> pm25Breakpoints, "pm10" -> pm10Breakpoints,
    "o3" -> o3Breakpoints, "no2" -> no2Breakpoints,
    "so2" -> so2Breakpoints, "co" -> coBreakpoints,
    "bc" -> pm25Breakpoints)

  private def interp(c: Column, lo: Double, hi: Double, alo: Double, ahi: Double): Column =
    lit((ahi - alo) / (hi - lo)) * (c - lit(lo)) + lit(alo)

  /** Piecewise AQI over an arbitrary breakpoint table. */
  def aqiFor(c: Column, bps: Breakpoints): Column = {
    val last = bps.last
    val chain = bps.init.foldRight(
      // above the top range: extrapolate on the last segment, uncapped
      interp(c, last._1, last._2, last._3, last._4)) {
      case ((lo, hi, alo, ahi), tail) => when(c <= hi, interp(c, lo, hi, alo, ahi)).otherwise(tail)
    }
    when(c.isNull || c < 0, lit(null)).otherwise(chain)
  }

  /** Piecewise AQI for a pm2.5-like concentration column. */
  def pm25Aqi(c: Column): Column = aqiFor(c, pm25Breakpoints)

  /** AQI for a named pollutant using its own EPA table. */
  def pollutantAqi(name: String, c: Column): Column =
    aqiFor(c, breakpointsByPollutant.getOrElse(name, pm25Breakpoints))

  /** AQI → category label (plan :42-49,64). */
  def aqiLevel(aqi: Column): Column =
    when(aqi.isNull, lit("Unknown"))
      .when(aqi <= 50, "Good")
      .when(aqi <= 100, "Moderate")
      .when(aqi <= 150, "Unhealthy for Sensitive Groups")
      .when(aqi <= 200, "Unhealthy")
      .when(aqi <= 300, "Very Unhealthy")
      .otherwise("Hazardous")

  /** Row AQI = max over per-pollutant AQIs computed with each
    * pollutant's own EPA table (plan :38); null-skipping via
    * `greatest`.
    */
  def rowAqi(named: (String, Column)*): Column = {
    val aqis = named.map { case (n, c) => pollutantAqi(n, c) }
    // Spark's greatest() demands >= 2 args — a one-pollutant caller
    // should get that pollutant's AQI, not an analysis error
    if (aqis.size == 1) aqis.head else greatest(aqis: _*)
  }

  /** Dominant pollutant = argmax by AQI (plan :63), as a when-chain. */
  def dominantPollutant(named: (String, Column)*): Column = {
    val aqis = named.map { case (n, c) => n -> pollutantAqi(n, c) }
    val overall =
      if (aqis.size == 1) aqis.head._2 else greatest(aqis.map(_._2): _*)
    aqis.foldRight(lit(null).cast("string")) { case ((n, a), tail) =>
      when(a.isNotNull && a === overall, lit(n)).otherwise(tail)
    }
  }

  /** A Scala double as a DuckDB literal that parses as DOUBLE.
    * CRITICAL: a bare decimal literal (`0.9259259259259259`) parses as
    * DECIMAL(17,16) in DuckDB, and its decimal→double CONVERSION can
    * land one ulp away from the directly-parsed double (observed:
    * 50.000000000000007 vs 50.0 at the o3 54.0 breakpoint) — flipping
    * boundary comparisons vs Spark. E-notation (`…e0`) forces a direct
    * double parse, bit-identical to the JVM's.
    */
  def sqlDouble(x: Double): String = {
    val s = x.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }

  /** [[aqiFor]] as DuckDB SQL text over an arbitrary value expression —
    * IDENTICAL arithmetic expression order to the Column form, so both
    * engines produce bit-identical IEEE doubles (the slope constant is
    * pre-computed in Scala for both and emitted via [[sqlDouble]]).
    */
  def sqlAqiFor(v: String, bps: Breakpoints): String = {
    def seg(lo: Double, hi: Double, alo: Double, ahi: Double) =
      s"(${sqlDouble((ahi - alo) / (hi - lo))}) * (($v) - ${sqlDouble(lo)}) + ${sqlDouble(alo)}"
    val last = bps.last
    val chain = bps.init.foldRight(seg(last._1, last._2, last._3, last._4)) {
      case ((lo, hi, alo, ahi), tail) =>
        s"CASE WHEN ($v) <= ${sqlDouble(hi)} THEN ${seg(lo, hi, alo, ahi)} ELSE $tail END"
    }
    s"CASE WHEN ($v) IS NULL OR ($v) < 0 THEN NULL ELSE $chain END"
  }

  /** [[rowAqi]] as SQL over already-computed per-pollutant AQI columns:
    * Spark's `greatest` skips nulls; SQL mirrors with a coalesce floor
    * (real AQIs are ≥ 0) nullified back out.
    */
  def sqlRowAqi(aqiCols: Seq[String]): String =
    s"NULLIF(greatest(${aqiCols.map(c => s"coalesce($c, -1e9)").mkString(", ")}), -1e9)"

  /** [[dominantPollutant]] as SQL: the same first-match when-chain over
    * the same pollutant order.
    */
  def sqlDominantPollutant(named: Seq[(String, String)], overall: String): String =
    named.foldRight("NULL") { case ((n, a), tail) =>
      s"CASE WHEN ($a) IS NOT NULL AND ($a) = ($overall) THEN '$n' ELSE $tail END"
    }

  /** [[aqiLevel]] as SQL over an AQI expression. */
  def sqlAqiLevel(aqi: String): String =
    s"""CASE WHEN ($aqi) IS NULL THEN 'Unknown'
       |     WHEN ($aqi) <= 50 THEN 'Good'
       |     WHEN ($aqi) <= 100 THEN 'Moderate'
       |     WHEN ($aqi) <= 150 THEN 'Unhealthy for Sensitive Groups'
       |     WHEN ($aqi) <= 200 THEN 'Unhealthy'
       |     WHEN ($aqi) <= 300 THEN 'Very Unhealthy'
       |     ELSE 'Hazardous' END""".stripMargin

  /** The same pm2.5 chain + level as DuckDB SQL over `events.value`
    * (identical arithmetic expression order ⇒ identical IEEE doubles).
    */
  val oracleSql: String = {
    val aqi = sqlAqiFor("value", pm25Breakpoints)
    s"""SELECT event_id, value, ${DetRound.sqlR4(aqi)} AS aqi,
       |  ${sqlAqiLevel(aqi)} AS aqi_level
       |FROM events ORDER BY event_id""".stripMargin
  }
}
