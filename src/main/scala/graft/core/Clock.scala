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

/** Fixed-but-advancing clock: a wall clock whose time the TEST controls.
  * This is how wall-clock behavior (staleness emerging from silence, deadline
  * passage) is asserted deterministically — production passes [[SystemClock]],
  * tests advance this one and watch the same code transition. */
final class StepClock(start: Instant) extends Clock {
  @volatile private var t: Instant = start
  def now: Instant = t
  def set(i: Instant): Unit = { t = i }
  def advance(d: java.time.Duration): Unit = { t = t.plus(d) }
  def advanceMinutes(m: Long): Unit = advance(java.time.Duration.ofMinutes(m))
}

object FixedClock {
  def atDate(isoDate: String): FixedClock =
    FixedClock(LocalDate.parse(isoDate).atStartOfDay(ZoneOffset.UTC).toInstant)
  def at(isoInstant: String): FixedClock = FixedClock(Instant.parse(isoInstant))
}
