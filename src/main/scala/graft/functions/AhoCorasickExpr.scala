package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MULTI-PATTERN matching (Aho–Corasick) — the blocklist/
  * taboo-term scan every pretraining curation pipeline runs over every
  * document. The naive shape is one regexp or contains() pass PER
  * pattern (N scans of the corpus, N plan nodes); this kernel walks
  * the text ONCE whatever the dictionary size, inside whole-stage
  * codegen (the generated code is one static-shape call on a
  * plan-time-built automaton shipped as a reference object).
  *
  * Semantics: EVERY match position of every pattern is counted
  * (overlapping matches included — "aaa" contains "aa" twice); for
  * BORDER-FREE patterns (no proper prefix that is also a suffix —
  * true of the gate's word dictionary) this equals the
  * non-overlapping split count, which is what the DuckDB oracle
  * restates. [[AhoCorasickCountExpr]] returns total matches;
  * [[AhoCorasickDistinctExpr]] returns how many DISTINCT patterns
  * matched at least once (the "how many blocklist terms does this doc
  * trip" signal).
  *
  * Scale shape: O(|text| + matches) per row, zero allocation on the
  * count path (the distinct path carries one boolean[] of dictionary
  * size); the automaton is built once on the driver (O(Σ|pattern|)
  * states over a dense next[] table for ASCII, map fallback above)
  * and broadcast with the serialized plan.
  */
final class AhoCorasickAutomaton(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
    "Aho-Corasick requires non-empty patterns")
  val nPatterns: Int = patterns.length

  // Trie over chars; dense ASCII next-table per node, sparse map above.
  private val goto0 = scala.collection.mutable.ArrayBuffer(
    new Array[Int](128))
  private val gotoHi = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.Map.empty[Char, Int])
  goto0(0).indices.foreach(i => goto0(0)(i) = -1)
  private val ends = scala.collection.mutable.ArrayBuffer(List.empty[Int])

  private def newNode(): Int = {
    val t = new Array[Int](128); java.util.Arrays.fill(t, -1)
    goto0 += t
    gotoHi += scala.collection.mutable.Map.empty[Char, Int]
    ends += Nil
    goto0.length - 1
  }
  private def child(s: Int, c: Char): Int =
    if (c < 128) goto0(s)(c) else gotoHi(s).getOrElse(c, -1)
  private def setChild(s: Int, c: Char, t: Int): Unit =
    if (c < 128) goto0(s)(c) = t else gotoHi(s)(c) = t

  patterns.zipWithIndex.foreach { case (p, pi) =>
    var s = 0
    p.foreach { c =>
      val nxt = child(s, c)
      s = if (nxt >= 0) nxt else { val n = newNode(); setChild(s, c, n); n }
    }
    ends(s) = pi :: ends(s)
  }

  // BFS fail links; each node's match set folds its fail chain, so the
  // scan never walks fail links per character.
  private val n = goto0.length
  private val fail = new Array[Int](n)
  /** total pattern-ends reachable from this node via fail chain */
  val outCount: Array[Int] = new Array[Int](n)
  /** distinct pattern ids ending at this node (fail chain folded) */
  val outIds: Array[Array[Int]] = new Array[Array[Int]](n)
  locally {
    val queue = scala.collection.mutable.Queue.empty[Int]
    outIds(0) = ends(0).toArray
    outCount(0) = outIds(0).length
    (0 until 128).foreach { c =>
      val t = goto0(0)(c)
      if (t < 0) goto0(0)(c) = 0
      else { fail(t) = 0; queue += t }
    }
    gotoHi(0).values.foreach { t => fail(t) = 0; queue += t }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      outIds(s) = (ends(s) ++ outIds(fail(s)).toList).distinct.toArray
      outCount(s) = ends(s).length + outCount(fail(s))
      (0 until 128).foreach { c =>
        val t = goto0(s)(c)
        if (t >= 0) { fail(t) = goto0(fail(s))(c); queue += t }
        else goto0(s)(c) = goto0(fail(s))(c) // goto-complete for ASCII
      }
      gotoHi(s).foreach { case (c, t) =>
        var f = fail(s)
        while (child(f, c) < 0 && f != 0) f = fail(f)
        val fc = child(f, c)
        fail(t) = if (fc >= 0 && fc != t) fc else 0
        queue += t
      }
    }
  }

  private def step(s0: Int, c: Char): Int =
    if (c < 128) goto0(s0)(c)
    else {
      var s = s0
      var t = gotoHi(s).getOrElse(c, -1)
      while (t < 0 && s != 0) { s = fail(s); t = gotoHi(s).getOrElse(c, -1) }
      if (t >= 0) t else 0
    }

  /** Total match positions across all patterns (overlapping counted). */
  def countMatches(text: UTF8String): Long = {
    val t = text.toString
    var s = 0
    var total = 0L
    var i = 0
    while (i < t.length) {
      s = step(s, t.charAt(i))
      total += outCount(s)
      i += 1
    }
    total
  }

  /** Number of distinct patterns with at least one match. */
  def countDistinct(text: UTF8String): Long = {
    val t = text.toString
    val seen = new Array[Boolean](nPatterns)
    var s = 0
    var found = 0L
    var i = 0
    while (i < t.length) {
      s = step(s, t.charAt(i))
      val ids = outIds(s)
      if (ids != null && ids.nonEmpty) {
        var j = 0
        while (j < ids.length) {
          if (!seen(ids(j))) { seen(ids(j)) = true; found += 1 }
          j += 1
        }
      }
      i += 1
    }
    found
  }
}

sealed abstract class AhoCorasickBase extends UnaryExpression {
  def patterns: Seq[String]
  @transient protected lazy val automaton = new AhoCorasickAutomaton(patterns)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $t")
  }
  override def dataType: DataType = LongType
}

case class AhoCorasickCountExpr(child: Expression, patterns: Seq[String])
  extends AhoCorasickBase {
  override def prettyName: String = "ac_count"
  override def nullSafeEval(input: Any): Any =
    automaton.countMatches(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasickAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ac.countMatches($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): AhoCorasickCountExpr =
    copy(child = newChild)
}

case class AhoCorasickDistinctExpr(child: Expression, patterns: Seq[String])
  extends AhoCorasickBase {
  override def prettyName: String = "ac_distinct"
  override def nullSafeEval(input: Any): Any =
    automaton.countDistinct(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("acAutomaton", automaton,
      classOf[AhoCorasickAutomaton].getName)
    defineCodeGen(ctx, ev, c => s"$ac.countDistinct($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): AhoCorasickDistinctExpr =
    copy(child = newChild)
}

object AhoCorasickExpr {
  /** Total (overlapping) match positions of `patterns` in `c`. */
  def acCount(c: Column, patterns: Seq[String]): Column =
    ColumnShim.column(AhoCorasickCountExpr(ColumnShim.expression(c), patterns))
  /** Distinct patterns of `patterns` matching at least once in `c`. */
  def acDistinct(c: Column, patterns: Seq[String]): Column =
    ColumnShim.column(AhoCorasickDistinctExpr(ColumnShim.expression(c), patterns))
}
