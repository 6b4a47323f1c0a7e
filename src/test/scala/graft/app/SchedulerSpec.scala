package graft.app

import java.time.LocalDateTime
import org.scalatest.funspec.AnyFunSpec
import graft.app.Scheduler._

class SchedulerSpec extends AnyFunSpec {
  private def t(s: String) = LocalDateTime.parse(s)

  describe("cron parse + nextFire") {
    it("the reference schedule '0 9 * * *' fires daily at 09:00") {
      val c = parseCron("0 9 * * *")
      assert(c.nextFire(t("2025-01-01T08:00:00")) == t("2025-01-01T09:00:00"))
      assert(c.nextFire(t("2025-01-01T09:00:00")) == t("2025-01-02T09:00:00"))
      assert(c.nextFire(t("2025-01-31T09:30:00")) == t("2025-02-01T09:00:00"))
    }

    it("steps, ranges, and lists") {
      val c = parseCron("*/15 1-2 * * *")
      assert(c.nextFire(t("2025-06-01T01:16:00")) == t("2025-06-01T01:30:00"))
      assert(c.nextFire(t("2025-06-01T02:45:00")) == t("2025-06-02T01:00:00"))
      val l = parseCron("0,30 9 * * *")
      assert(l.nextFire(t("2025-06-01T09:00:00")) == t("2025-06-01T09:30:00"))
      // bare value with step extends to the field max (Vixie)
      assert(parseCron("3/20 * * * *").min == Set(3, 23, 43))
      intercept[IllegalArgumentException](parseCron("0 24 * * *"))
      intercept[IllegalArgumentException](parseCron("0 9 * *"))
    }

    it("Vixie day rule: both dom and dow restricted -> OR") {
      val c = parseCron("0 0 13 * 5") // 13th OR Friday
      // 2025-06-06 is a Friday before the 13th
      assert(c.nextFire(t("2025-06-01T00:00:00")) == t("2025-06-06T00:00:00"))
      assert(c.nextFire(t("2025-06-06T00:00:00")) == t("2025-06-13T00:00:00"))
      // dom=* restricted dow only
      val fri = parseCron("0 0 * * 5")
      assert(fri.nextFire(t("2025-06-07T00:00:00")) == t("2025-06-13T00:00:00"))
    }

    it("Vixie day rule: a '*/n' day field is star-flagged (AND path), not OR") {
      // dom='*/2' starts with '*' → Vixie star-flags it: the day rule
      // is dom AND dow (the step still filters), not the both-
      // restricted OR. Fridays: 2025-06-06 (even, cut by the step),
      // 2025-06-13 (odd, fires). The OR reading would fire 06-03.
      val c = parseCron("0 0 */2 * 5")
      assert(c.nextFire(t("2025-06-01T00:00:00")) == t("2025-06-13T00:00:00"))
      // mirrored: dow='*/3' star-flagged → 13th AND dow∈{0,3,6}; June
      // 13 2025 is a Friday (cut), July 13 is a Sunday (fires). The OR
      // reading would fire June 4 (Wednesday).
      val m = parseCron("0 0 13 * */3")
      assert(m.nextFire(t("2025-06-01T00:00:00")) == t("2025-07-13T00:00:00"))
    }

    it("dow 7 is Sunday, same as 0") {
      assert(parseCron("0 0 * * 7").nextFire(t("2025-06-06T00:00:00")) ==
        t("2025-06-08T00:00:00"))
      assert(parseCron("0 0 * * 0").nextFire(t("2025-06-06T00:00:00")) ==
        t("2025-06-08T00:00:00"))
    }

    it("a never-matching spec throws instead of spinning") {
      intercept[IllegalArgumentException](
        parseCron("0 0 30 2 *").nextFire(t("2025-01-01T00:00:00")))
    }
  }

  describe("nextFire vs brute-force minute scan (property)") {
    it("agrees with a linear scan for a spread of field grammars") {
      // deterministic pseudo-random corpus: crons over every field
      // grammar × start instants across month/DST-free UTC boundaries
      val crons = Seq(
        "0 9 * * *", "*/7 * * * *", "30 1-3 * * *", "15 12 1 * *",
        "0 0 13 * 5", "45 6 * * 1-5", "5,35 8,20 * * 0",
        "59 23 28-31 * *", "10 4 */9 * *", "0 */5 * * 6,7",
        "20 7 15 3,6,9,12 *")
      val starts = Seq(
        "2025-01-01T00:00:00", "2025-02-27T23:58:00", "2025-03-31T12:34:00",
        "2025-06-13T00:00:00", "2024-02-28T09:00:00", "2025-12-31T23:59:00")
      for (cs <- crons; st <- starts) {
        val c = parseCron(cs)
        val t0 = t(st)
        // brute force: scan minute-by-minute up to 500 days
        var bf = t0.withSecond(0).withNano(0).plusMinutes(1)
        var n = 0
        while (!c.matches(bf) && n < 500 * 24 * 60) {
          bf = bf.plusMinutes(1); n += 1
        }
        assert(c.matches(bf), s"no match within horizon for '$cs' from $st")
        assert(c.nextFire(t0) == bf, s"cron '$cs' from $st")
        // and firing again from the result gives a strictly later match
        assert(c.nextFire(bf).isAfter(bf))
      }
    }

    it("Feb 29 jumps to the next leap year (past the scan horizon)") {
      assert(parseCron("0 0 29 2 *").nextFire(t("2025-01-01T00:00:00")) ==
        t("2028-02-29T00:00:00"))
    }
  }

  describe("dueRun (catchup=False)") {
    val c = parseCron("0 9 * * *")
    val start = t("2025-01-01T00:00:00")

    it("skips missed intervals, runs only the latest") {
      assert(dueRun(c, start, Some(t("2025-03-01T09:00:00")),
        t("2025-03-05T10:00:00")) == Some(t("2025-03-05T09:00:00")))
    }

    it("nothing due between fires") {
      assert(dueRun(c, start, Some(t("2025-03-05T09:00:00")),
        t("2025-03-06T08:59:00")).isEmpty)
    }

    it("fresh deployment backfills exactly one run") {
      assert(dueRun(c, start, None, t("2025-03-05T10:00:00")) ==
        Some(t("2025-03-05T09:00:00")))
      // before the first fire after startDate: nothing
      assert(dueRun(c, t("2025-03-05T09:30:00"), None,
        t("2025-03-05T10:00:00")).isEmpty)
    }
  }

  describe("runDag") {
    it("linear chain runs in declared order with all successes") {
      val log = collection.mutable.ArrayBuffer[String]()
      def task(id: String, up: Seq[String]) = Task(id, up)(() => { log += id; () })
      val runs = runDag(Seq(task("a", Nil), task("b", Seq("a")),
        task("c", Seq("b")), task("d", Seq("c"))))
      assert(log.toSeq == Seq("a", "b", "c", "d"))
      assert(runs.map(_.state).forall(_ == Success))
      assert(runs.map(_.attempts).forall(_ == 1))
    }

    it("a flaky task succeeds on its 3rd attempt; sleep sees the retry delay") {
      var n = 0
      val slept = collection.mutable.ArrayBuffer[Long]()
      val runs = runDag(
        Seq(Task("flaky", Nil, retries = 2)(() =>
          { n += 1; if (n < 3) sys.error("boom") })),
        retryDelayMs = 120000L, sleep = slept += _)
      assert(runs == Seq(TaskRun("flaky", Success, 3)))
      assert(slept.toSeq == Seq(120000L, 120000L))
    }

    it("an exhausted failure marks downstream upstream_failed, untouched") {
      var cRan = false
      val runs = runDag(Seq(
        Task("a", Nil)(() => ()),
        Task("b", Seq("a"), retries = 1)(() => sys.error("dead")),
        Task("c", Seq("b"))(() => { cRan = true; () })))
      assert(runs == Seq(TaskRun("a", Success, 1), TaskRun("b", Failed, 2),
        TaskRun("c", UpstreamFailed, 0)))
      assert(!cRan)
    }

    it("diamond topology: both branches before the join, declaration order") {
      val log = collection.mutable.ArrayBuffer[String]()
      def task(id: String, up: Seq[String]) = Task(id, up)(() => { log += id; () })
      runDag(Seq(task("a", Nil), task("l", Seq("a")), task("r", Seq("a")),
        task("j", Seq("l", "r"))))
      assert(log.toSeq == Seq("a", "l", "r", "j"))
    }

    it("a duplicated upstream id is one dependency, not a phantom cycle") {
      val log = collection.mutable.ArrayBuffer[String]()
      val runs = runDag(Seq(
        Task("a")(() => { log += "a"; () }),
        Task("b", Seq("a", "a"))(() => { log += "b"; () })))
      assert(log.toSeq == Seq("a", "b"))
      assert(runs.forall(_.state == Success))
    }

    it("cycles and unknown upstreams throw") {
      intercept[IllegalArgumentException](runDag(Seq(
        Task("a", Seq("b"))(() => ()), Task("b", Seq("a"))(() => ()))))
      intercept[IllegalArgumentException](runDag(Seq(
        Task("a", Seq("ghost"))(() => ()))))
    }
  }
}
