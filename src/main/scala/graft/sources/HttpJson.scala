package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The HTTP half of SURVEY.md §2.1 S4: the reference fetches a US-states
  * GeoJSON over HTTP and joins it to the report frame
  * (`weekly-report.py:140-147`). The engine analog fetches the document
  * ON THE DRIVER — it is a bounded config/dimension artifact (a few
  * hundred KB), not data, so a driver-side GET + parallelize is the
  * correct scale posture; the 100 TB side only ever sees the resulting
  * tiny DataFrame (broadcast-join it like any dim).
  *
  * The transport is an injectable `String => String` so the pipeline is
  * testable in a zero-egress environment: `httpTransport` is the real
  * JDK `java.net.http.HttpClient` implementation (no external
  * dependencies), and specs inject an in-memory fake — the same
  * real-plumbing/stub-boundary pattern as Multimodal's decode. */
object HttpJson {

  type Transport = String => String

  /** Real transport: blocking GET via the JDK HttpClient, following
    * redirects, failing loudly on non-2xx. */
  def httpTransport(timeoutSeconds: Long = 30): Transport = { url =>
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
      .GET()
      .build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2, s"HTTP ${resp.statusCode()} fetching $url")
    resp.body()
  }

  /** One fetched JSON document as a single-row (url, payload) frame. */
  def fetchRaw(s: SparkSession, url: String, transport: Transport): DataFrame = {
    import s.implicits._
    Seq((url, transport(url))).toDF("url", "payload")
  }

  /** Schema of the GeoJSON slice the report join needs: feature id +
    * display name + geometry type (the geometry coordinates stay opaque
    * — the engine joins on id/name; rendering is the viz layer's job). */
  val geoFeatureSchema: StructType = StructType(Seq(
    StructField("type", StringType),
    StructField("features", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("properties", StructType(Seq(
        StructField("name", StringType)))),
      StructField("geometry", StructType(Seq(
        StructField("type", StringType))))))))))

  /** Fetch + flatten a GeoJSON FeatureCollection to one row per feature:
    * (feature_id, name, geometry_type). This is the exact shape the
    * reference's choropleth join consumes (state id → name).
    *
    * Fails LOUDLY on bad payloads, matching the transport's non-2xx
    * posture: FAILFAST parse mode throws on malformed JSON (a 200 HTML
    * maintenance page), and a valid-JSON document that is not a
    * FeatureCollection raises instead of silently exploding to zero
    * rows — an empty dim would quietly drop every geo feature from the
    * downstream left join. */
  def geoFeatures(s: SparkSession, url: String,
      transport: Transport = httpTransport()): DataFrame =
    fetchRaw(s, url, transport)
      .select(col("url"),
        from_json(col("payload"), geoFeatureSchema,
          Map("mode" -> "FAILFAST")).as("g"))
      .select(explode(when(col("g.features").isNotNull, col("g.features"))
        .otherwise(raise_error(
          concat(lit("not a GeoJSON FeatureCollection: "), col("url"))))).as("f"))
      .select(col("f.id").as("feature_id"),
        col("f.properties.name").as("name"),
        col("f.geometry.type").as("geometry_type"))
}
