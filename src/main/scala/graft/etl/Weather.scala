package graft.etl

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Date
import java.time.{Duration, LocalDate}
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.DurationInt
import scala.util.Try
import scala.util.matching.Regex

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One hourly observation — the join-side row shape of J1
  * (`/root/reference/supercourier_etl/core/transform.py:82-85,103`).
  */
final case class WeatherRow(date: Date, Hour: Int, Weather_Condition: String)

/** S9 + O4 — weather acquisition as a driver-side, pluggable source.
  *
  * The reference fans out one HTTP GET per distinct pickup date
  * (`core/transform.py:67-92`, ThreadPoolExecutor(10)) against
  * api.weatherapi.com and builds a tiny lookup table. We keep that a
  * DRIVER-side pre-step producing a broadcastable DataFrame — never an
  * executor-side UDF (non-determinism, retries, rate limits at 1000
  * executors). Failed dates are dropped; their rows get null weather via
  * the left join, exactly like the reference.
  */
trait WeatherSource {
  /** Hourly conditions for the given dates; missing (date, hour) pairs are
    * allowed and surface as null `Weather_Condition` after the join. */
  def hourly(dates: Seq[LocalDate]): Seq[WeatherRow]
}

object WeatherSource {

  /** Deterministic offline stub (the default in this zero-egress env; the
    * reference's own tests rely on the equivalent graceful-failure path,
    * `tests/test_pipeline.py:44`). Conditions cover all four regex classes
    * of P11 plus the mixed "rain with fog" string and an unmatched one.
    */
  final class Stub(
      conditions: IndexedSeq[String] = Stub.DefaultConditions)
      extends WeatherSource {
    def hourly(dates: Seq[LocalDate]): Seq[WeatherRow] =
      for {
        d <- dates
        h <- 0 until 24
      } yield {
        val idx = math.floorMod(d.toEpochDay.toInt * 31 + h * 7, conditions.length)
        WeatherRow(Date.valueOf(d), h, conditions(idx))
      }
  }
  object Stub {
    val DefaultConditions: IndexedSeq[String] = IndexedSeq(
      "Sunny", "Light rain", "Heavy snow", "Fog", "Mist",
      "Patchy light drizzle", "Blizzard", "Sleet showers", "Cloudy",
      "Patchy light rain with fog", "Overcast")
  }

  /** No weather at all — every row gets the typed-null column (P14). */
  object Disabled extends WeatherSource {
    def hourly(dates: Seq[LocalDate]): Seq[WeatherRow] = Nil
  }

  /** Live WeatherAPI client (`utils/api_client.py:17-42`): GET
    * `/v1/history.json?q=Paris&dt=YYYY-MM-DD`, 3 attempts, fixed 2 s wait,
    * 10 s timeout, per-date failure isolation, ≤10 concurrent requests.
    * Unusable in the offline container; kept for API parity.
    */
  final class Http(
      apiKey: String,
      baseUrl: String = "https://api.weatherapi.com/v1",
      location: String = "Paris",
      maxWorkers: Int = 10,
      retries: Int = 3,
      retryWaitMs: Long = 2000,
      timeoutMs: Long = 10000)
      extends WeatherSource {
    require(apiKey.nonEmpty, "WEATHERAPI_KEY must be set for the HTTP weather source")

    private val client =
      HttpClient.newBuilder().connectTimeout(Duration.ofMillis(timeoutMs)).build()
    // hour entries look like {"time":"2025-09-04 13:00", ..., "condition":{"text":"Sunny", ...}}
    private val hourRe: Regex =
      """"time"\s*:\s*"\d{4}-\d{2}-\d{2} (\d{2}):\d{2}"[^{]*?"condition"\s*:\s*\{\s*"text"\s*:\s*"([^"]+)"""".r

    private def fetchDate(d: LocalDate): Seq[WeatherRow] = {
      val uri = URI.create(s"$baseUrl/history.json?key=$apiKey&q=$location&dt=$d")
      val req = HttpRequest.newBuilder(uri)
        .timeout(Duration.ofMillis(timeoutMs)).GET().build()
      var attempt = 0
      while (attempt < retries) {
        attempt += 1
        val res = Try(client.send(req, HttpResponse.BodyHandlers.ofString()))
        res.toOption.filter(_.statusCode() == 200) match {
          case Some(ok) =>
            return hourRe.findAllMatchIn(ok.body()).map { m =>
              WeatherRow(Date.valueOf(d), m.group(1).toInt, m.group(2))
            }.toSeq
          case None if attempt < retries => Thread.sleep(retryWaitMs)
          case None                      => ()
        }
      }
      Nil // graceful failure: date dropped → null weather after left join
    }

    def hourly(dates: Seq[LocalDate]): Seq[WeatherRow] = {
      val pool = Executors.newFixedThreadPool(maxWorkers)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try {
        val fs = dates.map(d => Future(Try(fetchDate(d)).getOrElse(Nil)))
        Await.result(Future.sequence(fs), 1.hour).flatten
      } finally pool.shutdown()
    }
  }

  /** Materialize a source into the broadcastable join-side table. Returns
    * None when the source yields nothing so callers take the typed-null
    * path (P14) instead of joining an empty frame.
    */
  def toDF(spark: SparkSession, source: WeatherSource, dates: Seq[LocalDate]): Option[DataFrame] = {
    val rows = source.hourly(dates)
    if (rows.isEmpty) None
    else {
      import spark.implicits._
      Some(spark.createDataset(rows).toDF())
    }
  }
}
