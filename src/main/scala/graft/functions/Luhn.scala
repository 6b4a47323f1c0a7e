package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Luhn (ISO/IEC 7812 mod-10) validation of card-shaped digit runs —
  * the precision mechanism every DLP/PII engine layers over bare
  * `\d{16}` pattern matches: a random 16-digit run passes the regex
  * but fails the checksum 90% of the time, so validating cuts false
  * positives by an order of magnitude before a redaction pipeline
  * (q62) quarantines real payment data.
  *
  * The kernel scans once: MAXIMAL digit runs (a 17-digit run is NOT a
  * PAN — boundaries matter), length exactly [[PanLen]], checksum
  * right-to-left with every second digit doubled and folded. One
  * static call per row from generated code.
  */
object Luhn {

  val PanLen = 16

  /** `[n_pan_shaped_runs, n_luhn_valid_runs]` over `t`. */
  def counts(t: UTF8String): ArrayData = {
    val s = t.toString
    var runs = 0L
    var valid = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i).isDigit) {
        var j = i
        while (j < n && s.charAt(j).isDigit) j += 1
        if (j - i == PanLen) {
          runs += 1
          if (isValid(s, i, j)) valid += 1
        }
        i = j
      } else i += 1
    }
    new GenericArrayData(Array(runs, valid))
  }

  /** Mod-10 check over `s[from, until)` (all digits). */
  def isValid(s: String, from: Int, until: Int): Boolean = {
    var sum = 0
    var pos = 0
    var i = until - 1
    while (i >= from) {
      var d = s.charAt(i) - '0'
      if (pos % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      pos += 1
      i -= 1
    }
    sum % 10 == 0
  }

  /** The check digit completing `body` to a Luhn-valid number. */
  def checkDigit(body: Seq[Int]): Int = {
    var sum = 0
    var pos = 1 // the appended check digit occupies position 0
    var i = body.length - 1
    while (i >= 0) {
      var d = body(i)
      if (pos % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      pos += 1
      i -= 1
    }
    (10 - sum % 10) % 10
  }
}
