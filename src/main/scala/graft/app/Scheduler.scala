package graft.app

import java.time.LocalDateTime
import scala.collection.mutable

/** Orchestration capability twin of the reference's Airflow deployment
  * (`dags/supplier_pipeline_dag.py:27-57`): a 5-field cron schedule
  * ("0 9 * * *", daily 09:00), `catchup=False`, linear task chain
  * generate → load → kpis → risk, and per-task `retries=2` with a
  * fixed `retry_delay` (`:12-16`). This module implements exactly the
  * scheduling SEMANTICS — when a run fires, which missed runs are
  * skipped, the order tasks execute, how many attempts a failing task
  * gets, and what happens downstream of a dead task — as a
  * deterministic, dependency-free library. Time and sleep are
  * injected, so every behavior is unit-testable without wall-clock;
  * the stage bodies themselves are the idempotent [[Pipeline]] stages
  * (atomic publish via `AtomicWarehouse`, so blind retry is safe —
  * the same property Airflow relies on when it re-runs a
  * `BashOperator`).
  *
  * What is deliberately NOT here: a resident daemon, a metadata
  * database, and a web UI — those are deployment infrastructure (the
  * reference runs them via `docker-compose.airflow.yml`), not engine
  * capability. A caller loops `nextFire` + `runDag` from whatever
  * process supervisor they already operate.
  */
object Scheduler {

  /** One field of a 5-field cron expression: `*`, `N`, `A-B`, `∗/S`,
    * `A-B/S`, and comma lists thereof (the Vixie grammar subset the
    * reference's `"0 9 * * *"` lives in).
    */
  private[app] def parseField(s: String, lo: Int, hi: Int): Set[Int] = {
    def one(part: String): Seq[Int] = {
      val (rangePart, step) = part.split("/") match {
        case Array(r)    => (r, 1)
        case Array(r, k) => (r, k.toInt)
        case _ => throw new IllegalArgumentException(s"bad cron field: $part")
      }
      require(step >= 1, s"bad cron step: $part")
      val (a, b) = rangePart match {
        case "*" => (lo, hi)
        case r if r.contains("-") =>
          val Array(x, y) = r.split("-"); (x.toInt, y.toInt)
        // bare value with a step ("3/5") extends to the field max,
        // matching Vixie semantics
        case v if step > 1 => (v.toInt, hi)
        case v => val x = v.toInt; (x, x)
      }
      require(a >= lo && b <= hi && a <= b, s"cron field out of range: $part")
      a to b by step
    }
    s.split(",").toSeq.flatMap(one).toSet
  }

  /** Parsed 5-field cron: minute hour day-of-month month day-of-week
    * (0=Sunday, 7 accepted as Sunday alias).
    */
  final case class Cron(min: Set[Int], hour: Set[Int], dom: Set[Int],
      month: Set[Int], dow: Set[Int], domStar: Boolean, dowStar: Boolean) {

    /** Vixie day rule: when BOTH day fields are restricted (neither
      * starts with '*'), a day matches if EITHER does; otherwise both
      * must match — and a star-flagged '*\/n' field still filters by
      * its step inside the AND (the flag picks the rule, it does not
      * blank the field).
      */
    private def dayMatches(t: LocalDateTime): Boolean = {
      val domOk = dom.contains(t.getDayOfMonth)
      // java DayOfWeek: MONDAY=1..SUNDAY=7 → cron 0=Sunday
      val dowOk = dow.contains(t.getDayOfWeek.getValue % 7)
      if (domStar || dowStar) domOk && dowOk
      else domOk || dowOk
    }

    def matches(t: LocalDateTime): Boolean =
      min.contains(t.getMinute) && hour.contains(t.getHour) &&
        month.contains(t.getMonthValue) && dayMatches(t)

    /** First fire time strictly after `after` (minute granularity).
      * Scans minute-by-minute with day-level skips; bounded at 5
      * years so a never-matching spec (e.g. Feb 30) throws instead of
      * spinning.
      */
    def nextFire(after: LocalDateTime): LocalDateTime = {
      var t = after.withSecond(0).withNano(0).plusMinutes(1)
      val limit = after.plusYears(5)
      while (t.isBefore(limit)) {
        if (!month.contains(t.getMonthValue))
          t = t.plusMonths(1).withDayOfMonth(1).withHour(0).withMinute(0)
        else if (!dayMatches(t))
          t = t.plusDays(1).withHour(0).withMinute(0)
        else if (!hour.contains(t.getHour))
          t = t.plusHours(1).withMinute(0)
        else if (!min.contains(t.getMinute))
          t = t.plusMinutes(1)
        else return t
      }
      throw new IllegalArgumentException("cron never fires within 5 years")
    }
  }

  def parseCron(expr: String): Cron = {
    val f = expr.trim.split("\\s+")
    require(f.length == 5, s"cron needs 5 fields, got: $expr")
    // dow accepts 7 as Sunday (normalize to 0 after parsing — a string
    // rewrite would corrupt ranges like "5-7")
    val dowRaw = parseField(f(4), 0, 7).map(d => if (d == 7) 0 else d)
    Cron(parseField(f(0), 0, 59), parseField(f(1), 0, 23),
      parseField(f(2), 1, 31), parseField(f(3), 1, 12), dowRaw,
      // Vixie sets the day star flags whenever the field STARTS with
      // '*' ('*' and '*/n' both count), not only on a literal '*' —
      // the flag drives the dom/dow OR-vs-AND rule, so '*/n' spellings
      // must take the star-flagged path
      domStar = f(2).startsWith("*"), dowStar = f(4).startsWith("*"))
  }

  /** `catchup=False` (`dags/supplier_pipeline_dag.py:34`): of all fire
    * times in (lastRun ∪ startDate, now], only the LATEST runs; the
    * earlier missed ones are dropped. Returns the logical fire time to
    * execute, or None when nothing is due. A fresh deployment
    * (`lastRun=None`) backfills exactly one run — the most recent fire
    * ≤ now after startDate — which is Airflow's observed catchup=False
    * behavior for a new DAG.
    */
  def dueRun(cron: Cron, startDate: LocalDateTime,
      lastRun: Option[LocalDateTime], now: LocalDateTime): Option[LocalDateTime] = {
    val floor = lastRun.filter(_.isAfter(startDate)).getOrElse(startDate)
    var due: Option[LocalDateTime] = None
    var t = cron.nextFire(floor)
    while (!t.isAfter(now)) { due = Some(t); t = cron.nextFire(t) }
    due
  }

  /** Task outcome states, after retries are exhausted. */
  sealed trait State
  case object Success extends State
  case object Failed extends State
  /** Never attempted because an upstream task failed. */
  case object UpstreamFailed extends State

  final case class Task(id: String, upstream: Seq[String] = Nil,
      retries: Int = 2)(val body: () => Unit)

  final case class TaskRun(id: String, state: State, attempts: Int)

  /** Run a DAG once: topological order (stable — declaration order
    * breaks ties, so the reference's linear chain executes in exactly
    * its declared sequence), each task attempted up to `1 + retries`
    * times with `sleep(retryDelayMs)` between attempts
    * (`default_args.retries/retry_delay`,
    * `dags/supplier_pipeline_dag.py:14-15`), and every task downstream
    * of an exhausted failure marked [[UpstreamFailed]] without being
    * attempted. Throws on cycles or unknown upstream ids.
    */
  def runDag(tasks: Seq[Task], retryDelayMs: Long = 0L,
      sleep: Long => Unit = _ => ()): Seq[TaskRun] = {
    val byId = tasks.map(t => t.id -> t).toMap
    require(byId.size == tasks.size, "duplicate task ids")
    tasks.foreach(t => t.upstream.foreach(u =>
      require(byId.contains(u), s"unknown upstream '$u' of '${t.id}'")))

    // Kahn's algorithm, declaration-order tie-break. Indegree counts
    // DISTINCT upstream ids: the completion loop below decrements at
    // most once per finished upstream, so a duplicated declaration
    // (Seq("a","a")) would otherwise strand a valid DAG at indegree 1
    // and misreport it as a cycle.
    val indeg = mutable.Map(tasks.map(t => t.id -> t.upstream.distinct.size): _*)
    val order = mutable.ArrayBuffer[Task]()
    val ready = mutable.Queue(tasks.filter(_.upstream.isEmpty): _*)
    while (ready.nonEmpty) {
      val t = ready.dequeue()
      order += t
      tasks.foreach { d =>
        if (d.upstream.contains(t.id)) {
          indeg(d.id) -= 1
          if (indeg(d.id) == 0) ready.enqueue(d)
        }
      }
    }
    require(order.size == tasks.size, "cycle in task graph")

    val state = mutable.Map[String, State]()
    val runs = order.map { t =>
      if (t.upstream.exists(u => state(u) != Success)) {
        state(t.id) = UpstreamFailed
        TaskRun(t.id, UpstreamFailed, 0)
      } else {
        var attempt = 0
        var outcome: State = Failed
        while (attempt <= t.retries && outcome != Success) {
          if (attempt > 0) sleep(retryDelayMs)
          attempt += 1
          try { t.body(); outcome = Success }
          catch { case _: Exception => () }
        }
        state(t.id) = outcome
        TaskRun(t.id, outcome, attempt)
      }
    }
    runs.toSeq
  }

  /** The reference DAG verbatim (`dags/supplier_pipeline_dag.py:38-57`):
    * generate → load → kpis → risk over [[Pipeline]]'s idempotent
    * stages, retries=2 each.
    */
  def supplierDag(spark: org.apache.spark.sql.SparkSession, dir: String): Seq[Task] = Seq(
    Task("generate_data")(() => Pipeline.generate(spark, dir)),
    Task("load_duckdb", Seq("generate_data"))(() => Pipeline.load(spark, dir)),
    Task("compute_kpis", Seq("load_duckdb"))(() => Pipeline.kpis(spark, dir)),
    Task("compute_risk", Seq("compute_kpis"))(() => Pipeline.risk(spark, dir)))
}
