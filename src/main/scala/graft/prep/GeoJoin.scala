package graft.prep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The upstream capability the reference dataset implies but does not
  * ship: "Weather-Hotels data joined by 4-characters geohash"
  * (`m13sparkstreaming/DataDescription.md:1` in
  * Mamba369x/M13_SparkStreaming_PYTHON_AZURE). The shipped table is the
  * *output* of that join; re-creating it is SURVEY §7 step 5.
  *
  * Scale design: geohash prefixes are a natural spatial bucketing — the
  * join key IS the bucket, so the equi-join shuffles both sides once on
  * a well-distributed 4-char key (32^4 buckets — geohash is base-32,
  * 0-9 plus 22 letters). A weather side that is
  * much smaller than hotels (typical: stations × days ≪ hotel rows)
  * should be broadcast by the caller; otherwise AQE handles skewed
  * cells (dense cities) via skew-join splitting.
  */
object GeoJoin {

  /** First `len` characters of a geohash — the spatial bucket key. */
  def geohashPrefix(c: Column, len: Int = 4): Column =
    substring(c, 1, len)

  /** hotels ⋈ weather on 4-char geohash prefix (inner, the reference's
    * semantic: only hotels with a matching weather cell survive).
    *
    * @param hotels  (id, name, address, city, country, geoHash, …)
    * @param weather (geoHash or finer, avg_tmpr_c, avg_tmpr_f,
    *                wthr_date, latitude, longitude, …)
    */
  def hotelWeatherJoin(hotels: DataFrame, weather: DataFrame,
      prefixLen: Int = 4): DataFrame = {
    val h = hotels.withColumn("geo_bucket",
      geohashPrefix(col("geoHash"), prefixLen))
    val w = weather.withColumn("geo_bucket",
      geohashPrefix(col("geoHash"), prefixLen))
      .drop("geoHash")
    h.join(w, Seq("geo_bucket"), "inner").drop("geo_bucket")
  }
}
