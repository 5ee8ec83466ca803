package graft.core

import java.sql.Timestamp
import java.time.{Instant, LocalDate, ZoneOffset}

/** Injectable clock. Every reference query anchors on `CURRENT_DATE()` /
  * `CURRENT_TIMESTAMP()` (see SURVEY §2.8, e.g. reference
  * `monitoring/detectors/feed_detector.py:39,97`); a fixed clock makes every
  * operator deterministic and oracle-testable. All date math is UTC — the
  * Spark session timezone is pinned UTC in build.sbt / session factory.
  */
trait Clock {
  def now: Instant
  def today: LocalDate = now.atZone(ZoneOffset.UTC).toLocalDate
  def nowTs: Timestamp = Timestamp.from(now)
}

/** Production clock. */
object SystemClock extends Clock {
  def now: Instant = Instant.now()
}

/** Test / oracle clock pinned to a fixed instant. */
final case class FixedClock(now: Instant) extends Clock

object FixedClock {
  def atDate(isoDate: String): FixedClock =
    FixedClock(LocalDate.parse(isoDate).atStartOfDay(ZoneOffset.UTC).toInstant)
  def at(isoInstant: String): FixedClock = FixedClock(Instant.parse(isoInstant))
}
