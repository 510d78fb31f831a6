package graft.scheduler

import java.time.{LocalDate, LocalDateTime, LocalTime}

/** Schedule next-fire computation (SURVEY.md §2.10 C6 — reference
  * `ScheduleRunner.java:74-111` incl. the month-length clamp at
  * `:96-98`).
  *
  * daily: next occurrence of HH:mm (today if still ahead, else +1d);
  * weekly: next `dayOfWeek` (0=Sunday..6) at HH:mm;
  * monthly: next `dayOfMonth` at HH:mm, clamped to the month's length
  * (Jan 31 → Feb 28/29).
  */
object Schedules {

  def computeNextRun(scheduleType: String, runAtTime: String,
                     dayOfWeek: Int, dayOfMonth: Int,
                     now: LocalDateTime): LocalDateTime = {
    val parts = runAtTime.split(":")
    val at = LocalTime.of(parts(0).toInt, parts(1).toInt)

    scheduleType.toLowerCase match {
      case "daily" =>
        val today = now.toLocalDate.atTime(at)
        if (today.isAfter(now)) today else today.plusDays(1)

      case "weekly" =>
        // java DayOfWeek: MONDAY=1..SUNDAY=7; reference uses 0=Sunday..6
        val targetJava = if (dayOfWeek == 0) 7 else dayOfWeek
        var cand = now.toLocalDate.atTime(at)
        while (cand.getDayOfWeek.getValue != targetJava || !cand.isAfter(now))
          cand = cand.plusDays(1)
        cand

      case "monthly" =>
        def clamped(d: LocalDate): LocalDateTime = {
          val dom = math.min(dayOfMonth, d.lengthOfMonth())
          d.withDayOfMonth(dom).atTime(at)
        }
        val thisMonth = clamped(now.toLocalDate.withDayOfMonth(1))
        if (thisMonth.isAfter(now)) thisMonth
        else clamped(now.toLocalDate.withDayOfMonth(1).plusMonths(1))

      case other => throw new IllegalArgumentException(s"unknown schedule type: $other")
    }
  }
}
