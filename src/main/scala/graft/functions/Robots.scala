package graft.functions

/** robots.txt parsing and rule evaluation per RFC 9309 (the Robots
  * Exclusion Protocol) — the crawl-policy gate a pipeline must apply
  * before any fetched page is eligible for a corpus at all. The
  * semantics that matter (and that naive `contains` checks get wrong):
  *
  *  - GROUP SELECTION: rules live in user-agent groups; a crawler
  *    obeys the group matching its product token (case-insensitive),
  *    falling back to the `*` group — picking the wrong group
  *    inverts the whole policy.
  *  - LONGEST MATCH: among all matching allow/disallow rules, the one
  *    with the most octets in its path pattern wins; on a tie the
  *    ALLOW wins. No rule matching ⇒ allowed.
  *  - WILDCARDS: `*` matches any octet sequence, a trailing `$`
  *    anchors the end; everything else is a literal PREFIX match
  *    (`/a/1` blocks `/a/12` — real crawlers must know this).
  *  - An empty `Disallow:` value matches nothing (allows everything).
  *
  * Parsing is tolerant: `key: value` lines, case-insensitive keys,
  * `#` comments, blank-line-separated groups, multiple user-agent
  * lines sharing one rule block.
  *
  * Scale shape: a policy table is host-cardinality metadata (tiny next
  * to the corpus) — parse once, ship the compiled rules with the task
  * closure like a codebook, evaluate per document in a map.
  */
object Robots {

  /** One path rule: allow/disallow + the raw pattern (pattern length
    * is the RFC's specificity measure).
    */
  final case class Rule(allow: Boolean, pattern: String)

  /** The rules + crawl-delay governing one user agent on one host. */
  final case class Policy(rules: Seq[Rule], crawlDelay: Option[Int])

  /** Parse `txt` and select the group governing `agent` (RFC group
    * selection: exact product-token group if present, else `*`).
    */
  def parse(txt: String, agent: String): Policy = {
    final case class Group(agents: List[String], rules: List[Rule],
        delay: Option[Int])
    var groups = List.empty[Group]
    var curAgents = List.empty[String]
    var curRules = List.empty[Rule]
    var curDelay: Option[Int] = None
    var rulesSeen = false
    def flush(): Unit = {
      if (curAgents.nonEmpty)
        groups ::= Group(curAgents, curRules.reverse, curDelay)
      curAgents = Nil; curRules = Nil; curDelay = None; rulesSeen = false
    }
    txt.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val c = line.indexOf(':')
      if (c > 0) {
        val key = line.substring(0, c).trim.toLowerCase
        val value = line.substring(c + 1).trim
        key match {
          case "user-agent" =>
            // a user-agent line AFTER rules starts a new group; before
            // any rule it joins the current group's agent list
            if (rulesSeen) flush()
            curAgents ::= value.toLowerCase
          case "allow" if curAgents.nonEmpty =>
            rulesSeen = true
            if (value.nonEmpty) curRules ::= Rule(allow = true, value)
          case "disallow" if curAgents.nonEmpty =>
            rulesSeen = true
            if (value.nonEmpty) curRules ::= Rule(allow = false, value)
          case "crawl-delay" if curAgents.nonEmpty =>
            rulesSeen = true
            curDelay = value.toIntOption
          case _ => // unknown keys ignored per RFC
        }
      }
    }
    flush()
    val a = agent.toLowerCase
    val own = groups.filter(_.agents.contains(a))
    val star = groups.filter(_.agents.contains("*"))
    val sel = if (own.nonEmpty) own else star
    Policy(sel.flatMap(_.rules), sel.flatMap(_.delay).headOption)
  }

  /** Does `pattern` (literal prefix + `*` wildcards + optional `$`
    * end anchor) match `path`? Iterative wildcard matcher, no regex.
    */
  def patternMatches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part, pos)) return false
        pos += part.length
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
        // a trailing-anchored last part must reach the end: take the
        // LAST occurrence instead
        if (anchored && i == parts.length - 1 && part.nonEmpty) {
          if (!path.endsWith(part) || path.length - part.length < at)
            return false
          pos = path.length
        }
      }
      i += 1
    }
    if (anchored) pos == path.length || parts.last.isEmpty && pos <= path.length
    else true
  }

  /** RFC 9309 decision: longest matching pattern wins, allow wins
    * ties, no match ⇒ allowed.
    */
  def allowed(policy: Policy, path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    policy.rules.foreach { r =>
      if (patternMatches(r.pattern, path)) {
        val len = r.pattern.length
        if (len > bestLen || (len == bestLen && r.allow && !bestAllow)) {
          bestLen = len
          bestAllow = r.allow
        }
      }
    }
    bestLen < 0 || bestAllow
  }
}
