package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.TextCore

/** Native one-pass text-hash expressions (kernels in
  * [[graft.functions.TextCore]]): each generated row evaluation is a
  * single static call, keeping the dedup operators inside whole-stage
  * codegen with no interpreted higher-order functions and no repeated
  * regex splits (see TextCore's scaladoc for the pathology this
  * replaces, and reference src/generate_data.py has no analogue — these
  * back the LLM-data extension surface).
  */
private[plans] trait TextInputCheck { self: Expression =>
  def textChild: Expression
  /** Session `spark.sql.icu.caseMappings.enabled`, captured lazily like
    * Spark's own `Lower` so the kernels' lowercasing stays bit-identical
    * to the compositional built-ins under either conf value.
    */
  lazy val useICU: Boolean =
    SQLConf.get.getConf(SQLConf.ICU_CASE_MAPPINGS_ENABLED)
  def checkText(name: String): TypeCheckResult =
    if (textChild.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires a STRING argument, got ${textChild.dataType.sql}")
}

/** `minhash_sig(text)` → ARRAY<BIGINT> of the 8 salted minhashes; null
  * when the document has fewer than 2 tokens (no shingles).
  */
case class MinHashSig(child: Expression)
  extends UnaryExpression with TextInputCheck {
  override def textChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkText(prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(t: Any): Any =
    TextCore.minhashSig(t.asInstanceOf[UTF8String], useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
       |${ev.value} = graft.functions.TextCore.minhashSig($t, $useICU);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** `minhash_band_keys(text)` → ARRAY<STRING> of the 4 LSH band keys
  * (`md5(concat_ws('|', mh_2b, mh_2b+1))`); null when no shingles, so a
  * posexplode yields no band rows for the doc.
  */
case class MinHashBandKeys(child: Expression)
  extends UnaryExpression with TextInputCheck {
  override def textChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkText(prettyName)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_band_keys"

  override protected def nullSafeEval(t: Any): Any =
    TextCore.minhashBandKeys(t.asInstanceOf[UTF8String], useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => s"""
       |${ev.value} = graft.functions.TextCore.minhashBandKeys($t, $useICU);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override protected def withNewChildInternal(c: Expression): MinHashBandKeys =
    copy(child = c)
}

/** `sorted_shingle_hashes(text)` → sorted ARRAY<BIGINT> of 60-bit hashes
  * of the distinct bigram shingles (empty for < 2 tokens).
  */
case class SortedShingleHashes(child: Expression)
  extends UnaryExpression with TextInputCheck {
  override def textChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkText(prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_shingle_hashes"

  override protected def nullSafeEval(t: Any): Any =
    TextCore.sortedShingleHashes(t.asInstanceOf[UTF8String], useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.TextCore.sortedShingleHashes($t, $useICU)")

  override protected def withNewChildInternal(c: Expression): SortedShingleHashes =
    copy(child = c)
}

/** `nfc_normalize(text)` → the Unicode canonical-composition (NFC)
  * form — the normalization audit's kernel (q229). Already-normalized
  * strings return the input object (no copy); codegen is one static
  * call, so the audit predicate `text <> nfc_normalize(text)` stays
  * inside whole-stage codegen.
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with TextInputCheck {
  override def textChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkText(prettyName)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(t: Any): Any =
    TextCore.nfc(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextCore.nfc($t)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** `blocklist_hits(text)` → ARRAY<BIGINT> of per-phrase occurrence
  * counts under the engine blocklist ([[graft.functions.Blocklist]]):
  * one Aho-Corasick pass finds every phrase simultaneously, and the
  * generated row evaluation is a single static call, so the content
  * screen (q233) stays inside whole-stage codegen with no per-phrase
  * `contains` loop.
  */
case class BlocklistHits(child: Expression)
  extends UnaryExpression with TextInputCheck {
  override def textChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkText(prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "blocklist_hits"

  override protected def nullSafeEval(t: Any): Any =
    graft.functions.Blocklist.hitCounts(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      t => s"graft.functions.Blocklist.hitCounts($t)")

  override protected def withNewChildInternal(c: Expression): BlocklistHits =
    copy(child = c)
}

/** `luhn_counts(text)` → ARRAY<BIGINT> `[n_pan_shaped, n_luhn_valid]`:
  * maximal 16-digit runs and how many pass the mod-10 checksum
  * ([[graft.functions.Luhn]]) — the q239 kernel, one static call per
  * row inside whole-stage codegen.
  */
case class LuhnCounts(child: Expression)
  extends UnaryExpression with TextInputCheck {
  override def textChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkText(prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "luhn_counts"

  override protected def nullSafeEval(t: Any): Any =
    graft.functions.Luhn.counts(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Luhn.counts($t)")

  override protected def withNewChildInternal(c: Expression): LuhnCounts =
    copy(child = c)
}

/** `cdc_chunks(text)` → ARRAY<BIGINT> of content-defined chunk hashes
  * ([[graft.functions.Cdc]]): windowed boundary rule + per-chunk
  * md5-prefix hash, one pass per row from generated code — the q241
  * kernel.
  */
case class CdcChunks(child: Expression)
  extends UnaryExpression with TextInputCheck {
  override def textChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkText(prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(t: Any): Any =
    graft.functions.Cdc.chunkHashes(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Cdc.chunkHashes($t)")

  override protected def withNewChildInternal(c: Expression): CdcChunks =
    copy(child = c)
}

/** `simhash32(text)` → BIGINT 32-bit SimHash of the token stream. */
case class SimHash32(child: Expression)
  extends UnaryExpression with TextInputCheck {
  override def textChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkText(prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override protected def nullSafeEval(t: Any): Any =
    TextCore.simhash32(t.asInstanceOf[UTF8String], useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextCore.simhash32($t, $useICU)")

  override protected def withNewChildInternal(c: Expression): SimHash32 =
    copy(child = c)
}

/** `simhash60(text)` → BIGINT 60-bit SimHash — the q238 Hamming join's
  * wide-signature scale dial (15-bit pigeonhole slices; see
  * TextCore.simhash60).
  */
case class SimHash60(child: Expression)
  extends UnaryExpression with TextInputCheck {
  override def textChild: Expression = child
  override def checkInputDataTypes(): TypeCheckResult = checkText(prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(t: Any): Any =
    TextCore.simhash60(t.asInstanceOf[UTF8String], useICU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.TextCore.simhash60($t, $useICU)")

  override protected def withNewChildInternal(c: Expression): SimHash60 =
    copy(child = c)
}

/** `sorted_intersect_count(a, b)` → BIGINT match count between two
  * sorted ARRAY<BIGINT>s with join-equivalent multiset semantics.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextCore.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextCore.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** `dup_span_runs(kh, dup)` → ARRAY<BIGINT> of maximal duplicated-position
  * runs, each packed `(start << 32) | end`: positions of `kh` (a doc's
  * per-position gram hashes) whose hash binary-searches into the SORTED
  * `dup` set, chained by adjacency — the q82 island merge as one map-side
  * pass over a broadcast dup-gram set instead of a token-granular join +
  * per-doc window (see [[graft.functions.TextCore.dupSpanRuns]]).
  */
case class DupSpanRuns(left: Expression, right: Expression)
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dup_span_runs"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextCore.dupSpanRuns(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextCore.dupSpanRuns($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DupSpanRuns =
    copy(left = newLeft, right = newRight)
}
