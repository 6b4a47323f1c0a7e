package graft.operators

/** DuckDB → Spark SQL dialect rewriter for the engine's SQL-text
  * surface (SURVEY §3.2): the oracle texts are the single source of
  * truth for every query's SQL form, and this rewriter derives the
  * Spark-dialect twin instead of hand-maintaining a third copy — the
  * three forms (DataFrame, Spark SQL, DuckDB oracle) stay in lockstep
  * by construction.
  *
  * The rule set covers exactly the dialect the oracle corpus uses —
  * list functions, `unnest`, `range`, hex casts, the `'g'` regexp flag,
  * `//` integer division, `time_bucket` — and [[toSpark]] ASSERTS no
  * DuckDB-ism survives, so an oracle text using a new construct fails
  * loudly at map-build time, not at query time. Queries whose SQL shape
  * is NOT a textual derivation (native-kernel forms, unrolled iterative
  * CTEs) override the derived text in their module's `sparkSql` map;
  * see [[SqlSurface]].
  *
  * String literals pass through VERBATIM: [[SqlSurface.run]] executes
  * with `spark.sql.parser.escapedStringLiterals=true`, so the regex
  * patterns shared with DuckDB ('\s+', '\d{3}' …) parse identically —
  * without that conf Spark's parser would eat the backslashes.
  */
object SqlDialect {

  /** Find the index of the ')' matching the '(' at `open`. */
  private def matching(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    sys.error(s"unbalanced parens after ${s.substring(open).take(40)}")
  }

  /** Split a top-level comma-separated argument list. */
  private def splitArgs(args: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var inStr = false
    var start = 0
    for (i <- args.indices) {
      val c = args.charAt(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case ',' if depth == 0 =>
          out += args.substring(start, i).trim; start = i + 1
        case _ =>
      }
    }
    out += args.substring(start).trim
    out.result()
  }

  /** Rewrite every call `name(args...)` (word-bounded, case-sensitive)
    * via `f(args)`. Nested occurrences are rewritten before the
    * enclosing call substitutes, so after a replacement the scan resumes
    * just PAST the match — a rule whose output re-spells the same
    * function name (regexp_extract_all, regexp_replace) must not
    * re-match its own replacement, or the loop never terminates.
    */
  private def rewriteCall(s0: String, name: String)(f: Seq[String] => String): String = {
    var s = s0
    var from = 0
    var at = s.indexOf(name + "(", from)
    while (at >= 0) {
      val boundary = at == 0 || { val p = s.charAt(at - 1); !p.isLetterOrDigit && p != '_' && p != '.' }
      if (!boundary) from = at + 1
      else {
        val open = at + name.length
        val close = matching(s, open)
        val inner = s.substring(open + 1, close)
        // rewrite inner occurrences first so nested calls resolve
        val innerDone = rewriteCall(inner, name)(f)
        s = s.substring(0, at) + f(splitArgs(innerDone)) + s.substring(close + 1)
        from = at + 1 // inner text is final — never re-match the replacement
      }
      at = s.indexOf(name + "(", from)
    }
    s
  }

  /** `CAST(('0x' || X) AS [U]BIGINT)` → `CAST(conv(X, 16, 10) AS BIGINT)`
    * (the md5-prefix hash idiom of `TextFns.sql`).
    */
  private def rewriteHexCast(s0: String): String = {
    val marker = "CAST(('0x' || "
    var s = s0
    var at = s.indexOf(marker)
    while (at >= 0) {
      val xStart = at + marker.length
      val innerOpen = at + "CAST".length // the '(' right after CAST
      val innerClose = matching(s, innerOpen + 1) + 1 // ')' closing ('0x' || X)
      val x = s.substring(xStart, innerClose - 1)
      val tail = s.substring(innerClose)
      val m = "^\\s+AS\\s+U?BIGINT\\)".r.findFirstIn(tail).getOrElse(
        sys.error(s"unexpected hex-cast tail: ${tail.take(40)}"))
      s = s.substring(0, at) + s"CAST(conv($x, 16, 10) AS BIGINT)" +
        tail.substring(m.length)
      at = s.indexOf(marker)
    }
    s
  }

  /** The ordered rule pipeline. */
  def toSpark(sqlIn: String): String = {
    var s = sqlIn

    // hex casts first (their inner text must survive verbatim)
    s = rewriteHexCast(s)

    // date_diff('day', a, b) → datediff(b, a)  (day diff only)
    s = rewriteCall(s, "date_diff") {
      case Seq("'day'", a, b) => s"datediff($b, $a)"
      case other => sys.error(s"unsupported date_diff args: $other")
    }

    // numeric literal arrays [..]::DOUBLE[] → CAST(array(..) AS ARRAY<DOUBLE>)
    s = "\\[([^\\[\\]]*)\\]::DOUBLE\\[\\]".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        s"CAST(array(${m.group(1)}) AS ARRAY<DOUBLE>)"))
    // column casts col::DOUBLE[] → CAST(col AS ARRAY<DOUBLE>)
    s = "([A-Za-z_][\\w.]*)::DOUBLE\\[\\]".r.replaceAllIn(s,
      m => s"CAST(${m.group(1)} AS ARRAY<DOUBLE>)")

    // string-literal arrays ['a','b'] → array('a','b') (stop-set literals)
    s = "\\[('[^']*'(?:\\s*,\\s*'[^']*')*)\\]".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(s"array(${m.group(1)})"))

    // list indexing w[i] → element_at(w, i) — both engines 1-based
    s = "([A-Za-z_][\\w.]*)\\[([^\\[\\]]+)\\]".r.replaceAllIn(s,
      m => java.util.regex.Matcher.quoteReplacement(
        s"element_at(${m.group(1)}, ${m.group(2)})"))

    // range(n) = [0, n) with empty-on-nonpositive semantics; Spark's
    // sequence(0, n-1) would count DOWN for n<=0, so guard with slice
    s = rewriteCall(s, "range") {
      case Seq(n) =>
        s"slice(sequence(0, greatest(($n) - 1, 0)), 1, greatest(($n), 0))"
      case other => sys.error(s"unsupported range args: $other")
    }

    // generate_series(a, b, step) → sequence(a, b, step): both are
    // inclusive-bounds. Only the 3-arg INTERVAL-step form is supported —
    // DuckDB types the DATE+INTERVAL series TIMESTAMP while Spark keeps
    // DATE, so callers must cast the element explicitly (the oracle
    // texts do), keeping the two engines' types aligned.
    s = rewriteCall(s, "generate_series") {
      case Seq(a, b, step) => s"sequence($a, $b, $step)"
      case other => sys.error(s"unsupported generate_series args: $other")
    }

    // list_slice(l, a, b): 1-based INCLUSIVE bounds → Spark slice takes
    // (start, length); both clamp past-the-end, and our texts only use
    // positive in-range bounds
    s = rewriteCall(s, "list_slice") {
      case Seq(l, a, b) => s"slice($l, $a, ($b) - ($a) + 1)"
      case other => sys.error(s"unsupported list_slice args: $other")
    }

    // function renames (word-bounded)
    val renames = Seq(
      "regexp_split_to_array" -> "split",
      "regexp_matches" -> "regexp_like",
      "list_filter" -> "filter",
      "list_transform" -> "transform",
      "list_min" -> "array_min",
      "list_max" -> "array_max",
      "list_distinct" -> "array_distinct",
      "list_contains" -> "array_contains",
      "list_inner_product" -> "dot_product", // graft native kernel
      "list_value" -> "array",
      "list_position" -> "array_position", // both 1-based first-occurrence
      "list_extract" -> "element_at", // both 1-based
      "array_to_string" -> "array_join",
      "quantile_cont" -> "percentile",
      "epoch_us" -> "unix_micros",
      "GROUPING" -> "grouping_id",
      "len" -> "size")
    renames.foreach { case (from, to) =>
      s = s"(?<![\\w.])${java.util.regex.Pattern.quote(from)}\\(".r
        .replaceAllIn(s, java.util.regex.Matcher.quoteReplacement(to + "("))
    }

    // unnest → explode (single-generator uses only; parallel UNNEST
    // pairs are override territory)
    s = "(?i)(?<![\\w.])unnest\\(".r.replaceAllIn(s, "explode(")

    // xor(a, b) → (a ^ b)
    s = rewriteCall(s, "xor") {
      case Seq(a, b) => s"($a ^ $b)"
      case other => sys.error(s"unsupported xor args: $other")
    }

    // DuckDB regexp_extract_all defaults to the full match (group 0);
    // Spark defaults to group 1 — make group 0 explicit
    s = rewriteCall(s, "regexp_extract_all") {
      case Seq(a, p) => s"regexp_extract_all($a, $p, 0)"
      case other => s"regexp_extract_all(${other.mkString(", ")})"
    }

    // drop DuckDB's explicit global-replace flag (Spark is global) and
    // convert RE2 backreferences in the REPLACEMENT ('\1'..'\9') to
    // Java's '$1' syntax — under escapedStringLiterals Spark would read
    // '\1' as an escape for a literal '1'
    def bref(r: String): String = r.replaceAll("\\\\(\\d)", "\\$$1")
    s = rewriteCall(s, "regexp_replace") {
      case Seq(a, p, r, "'g'") => s"regexp_replace($a, $p, ${bref(r)})"
      case Seq(a, p, r) => s"regexp_replace($a, $p, ${bref(r)})"
      case other => s"regexp_replace(${other.mkString(", ")})"
    }

    // time_bucket(INTERVAL 'N minutes|hours', ts) → epoch-aligned floor
    s = rewriteCall(s, "time_bucket") {
      case Seq(iv, ts) =>
        val m = "INTERVAL\\s+'(\\d+)\\s+(minute|hour)s?'".r.findFirstMatchIn(iv)
          .getOrElse(sys.error(s"unsupported time_bucket interval: $iv"))
        val unitUs = if (m.group(2) == "hour") 3600L * 1000000L
          else 60L * 1000000L
        val us = m.group(1).toLong * unitUs
        s"timestamp_micros(unix_micros($ts) - pmod(unix_micros($ts), ${us}L))"
      case other => sys.error(s"unsupported time_bucket args: $other")
    }

    // CAST(x AS VARCHAR) — DuckDB's unsized varchar is Spark's STRING
    s = "(?<!\\w)AS\\s+VARCHAR(?!\\w)".r.replaceAllIn(s, "AS STRING")

    // CAST(x AS HUGEINT) — Spark's widest exact integer is
    // DECIMAL(38,0) (enough for every catalog value: Wide.sql routes
    // DECIMAL(38,0) ≤ 10^38−1 through HUGEINT only to force DuckDB's
    // exact-int division path; Spark's `div`/`%` are exact on decimals)
    s = "(?<!\\w)AS\\s+HUGEINT(?!\\w)".r.replaceAllIn(s, "AS DECIMAL(38,0)")

    // the SRP unit-scale constant: Spark parses a bare fractional
    // literal as DECIMAL (DuckDB divides to DOUBLE), which would type
    // the plane arrays ARRAY<DECIMAL> — pin the double the DataFrame
    // form uses (Similarity.srpComponent)
    s = s.replace("/ 2147483648.0", "/ 2147483648.0D")

    // integer division and in-paren IGNORE NULLS
    s = s.replace(" // ", " div ")
    s = s.replace(" IGNORE NULLS)", ") IGNORE NULLS")

    // no DuckDB-ism may survive: fail at map-build time, not query time
    val leftovers = Seq("list_", "unnest(", "UNNEST(", "UBIGINT", "HUGEINT", " // ",
      "generate_series",
      "range(", ", 'g')", "time_bucket", "::DOUBLE[]", "date_diff(",
      "epoch_us(", "regexp_split_to_array", " IGNORE NULLS)", "VARCHAR")
    leftovers.foreach(l => require(!s.contains(l),
      s"unrewritten DuckDB dialect '$l' in:\n$s"))
    s
  }
}
