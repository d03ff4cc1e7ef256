package graft.pipeline

import scala.collection.mutable

/**
 * Serializable Aho-Corasick multi-pattern matcher with word-boundary and
 * longest-match-wins semantics — the mention detector that replaces the
 * reference's per-document extraction LLM call (reference:
 * entityextractor/services/openai_service.py:24-131). Built once on the
 * driver from the KB alias index and broadcast to executors; matching is a
 * single O(text) pass per document regardless of dictionary size, which is
 * what makes mention detection shuffle-free and embarrassingly parallel at
 * 100 TB scale (SURVEY.md §2.10).
 *
 * Matching is case-insensitive (patterns are stored normalized lowercase).
 */
final class Gazetteer private (
    private val next: Array[Map[Char, Int]],
    private val fail: Array[Int],
    private val outputs: Array[List[Int]],
    val patterns: Array[String]) extends Serializable {

  /** A matched span in document coordinates; end is exclusive. */
  final case class Match(start: Int, end: Int, patternIdx: Int) {
    def pattern: String = patterns(patternIdx)
  }

  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /**
   * Dense DFA over the ASCII plane: delta(s)(c) resolves goto+fail in TWO
   * array loads — the map-based fail-chain walk costs a boxed hash lookup
   * per step and dominated the detect stage (~6–8 s of the 8-core 2M-file
   * run). `@transient lazy`: rebuilt once per executor JVM after broadcast
   * deserialization (states × 128 ints; ~1 MB per 2k states) instead of
   * shipping it — and a dictionary large enough to make the dense table a
   * memory problem (tens of millions of states) should ship the sparse
   * automaton anyway, which this layout preserves. Non-ASCII input chars
   * take the original sparse fail-walk; patterns may contain them freely.
   */
  @transient private lazy val delta: Array[Array[Int]] = {
    val d = Array.ofDim[Int](next.length, 128)
    var c = 0
    while (c < 128) { d(0)(c) = next(0).getOrElse(c.toChar, 0); c += 1 }
    // BFS order: fail(r) is strictly shallower, so delta(fail(r)) is ready
    val queue = new java.util.ArrayDeque[Int]()
    next(0).values.foreach(queue.add(_))
    while (!queue.isEmpty) {
      val r = queue.poll()
      var ch = 0
      while (ch < 128) {
        d(r)(ch) = next(r).getOrElse(ch.toChar, d(fail(r))(ch))
        ch += 1
      }
      next(r).values.foreach(queue.add(_))
    }
    d
  }

  /** All word-boundary-valid matches, reduced to non-overlapping
   * longest-match-wins (leftmost-longest), sorted by start offset. */
  def findMentions(text: String): Vector[Match] = {
    val raw = Vector.newBuilder[Match]
    val dfa = delta
    var state = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = Character.toLowerCase(text.charAt(i))
      if (c < 128) {
        state = dfa(state)(c)
      } else {
        var s = state
        while (s != 0 && !next(s).contains(c)) s = fail(s)
        state = next(s).getOrElse(c, 0)
      }
      if (outputs(state).nonEmpty) {
        outputs(state).foreach { p =>
          val start = i + 1 - patterns(p).length
          val okLeft = start == 0 || !isWordChar(text.charAt(start - 1))
          val okRight = i + 1 >= n || !isWordChar(text.charAt(i + 1))
          if (okLeft && okRight) raw += Match(start, i + 1, p)
        }
      }
      i += 1
    }
    // leftmost-longest, non-overlapping
    val sorted = raw.result().sortBy(m => (m.start, -(m.end - m.start)))
    val kept = Vector.newBuilder[Match]
    var lastEnd = -1
    sorted.foreach { m =>
      if (m.start >= lastEnd) { kept += m; lastEnd = m.end }
    }
    kept.result()
  }
}

object Gazetteer {

  /** Build from normalized lowercase patterns (duplicates collapse). */
  def build(patternsIn: Seq[String]): Gazetteer = {
    val patterns = patternsIn.map(_.toLowerCase).distinct.filter(_.nonEmpty).toArray
    val next = mutable.ArrayBuffer[mutable.Map[Char, Int]](mutable.Map.empty)
    val out = mutable.ArrayBuffer[List[Int]](Nil)

    patterns.zipWithIndex.foreach { case (pat, pi) =>
      var state = 0
      pat.foreach { c =>
        state = next(state).get(c) match {
          case Some(s) => s
          case None =>
            next += mutable.Map.empty
            out += Nil
            val s = next.size - 1
            next(state)(c) = s
            s
        }
      }
      out(state) = pi :: out(state)
    }

    val fail = Array.fill(next.size)(0)
    val queue = mutable.Queue[Int]()
    next(0).values.foreach(queue.enqueue(_))
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      next(r).foreach { case (c, u) =>
        queue.enqueue(u)
        var v = fail(r)
        while (v != 0 && !next(v).contains(c)) v = fail(v)
        fail(u) = if (next(v).contains(c) && next(v)(c) != u) next(v)(c) else 0
        out(u) = out(u) ++ out(fail(u))
      }
    }
    new Gazetteer(next.map(_.toMap).toArray, fail, out.toArray, patterns)
  }

  /** Standard gazetteer over all KB alias norms. */
  def fromKb(): Gazetteer = build(KB.labelRows.map(_.aliasNorm))

  /** Language-aware gazetteer: detection patterns come from the configured
   * language's LOCAL alias index (reference LANGUAGE=de detects German
   * surfaces; translation happens later at link time, KB.labelsForLang). */
  def fromKb(lang: String): Gazetteer =
    build(KB.labelRowsLocal(lang).map(_.aliasNorm))
}
