package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One graded operator from SURVEY.md §3.
  *
  * `name` keys both `SparkEntry.queries` and (when `oracle` is defined)
  * `SparkEntry.oracleSql`. Operators whose semantics are not portably
  * SQL-expressible (SURVEY §3 "✘" rows — e.g. approx sketches, geomedian)
  * carry `oracle = None` and are covered by ScalaTest/ScalaCheck specs
  * instead; the driver records a rows-only check for them.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)
